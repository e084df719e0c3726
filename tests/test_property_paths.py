"""Property-path parity with the reference's PropertyPathsTest
(reference: src/test/scala/PropertyPathsTest.scala) plus the p+/p*
fixpoint the reference lacks (README.md:60-63)."""

from .fixtures import PROPERTY_PATHS_TTL
from .helpers import assert_bag_equal, iri, num, run_sparql, s

E = "http://example/"


def test_sequence_path(spark):
    q = """
    PREFIX :   <http://example/>
    SELECT *
    {  ?s :item/:price ?x . }"""
    out = run_sparql(spark, PROPERTY_PATHS_TTL, q)
    assert_bag_equal(
        out,
        [{"s": iri(E + "order"), "x": num(5)}, {"s": iri(E + "order"), "x": num(5)}],
    )


def test_negated_path(spark):
    q = """
    PREFIX :   <http://example/>
    SELECT *
    {  ?s !:item ?x . }"""
    out = run_sparql(spark, PROPERTY_PATHS_TTL, q)
    assert_bag_equal(
        out,
        [
            {"s": iri(E + "z1"), "x": s("Small")},
            {"s": iri(E + "z1"), "x": num(5)},
            {"s": iri(E + "z2"), "x": s("Large")},
            {"s": iri(E + "z2"), "x": num(5)},
        ],
    )


def test_alternative_path(spark):
    q = """
    PREFIX :   <http://example/>
    SELECT *
    {  ?s (:item | :price) ?x . }"""
    out = run_sparql(spark, PROPERTY_PATHS_TTL, q)
    assert_bag_equal(
        out,
        [
            {"s": iri(E + "order"), "x": iri(E + "z1")},
            {"s": iri(E + "order"), "x": iri(E + "z2")},
            {"s": iri(E + "z1"), "x": num(5)},
            {"s": iri(E + "z2"), "x": num(5)},
        ],
    )


def test_zero_or_one_path(spark):
    q = """
    PREFIX :   <http://example/>
    SELECT *
    {  ?s :item/:price? ?x . }"""
    out = run_sparql(spark, PROPERTY_PATHS_TTL, q)
    assert_bag_equal(
        out,
        [
            {"s": iri(E + "order"), "x": iri(E + "z1")},
            {"s": iri(E + "order"), "x": iri(E + "z2")},
            {"s": iri(E + "order"), "x": num(5)},
            {"s": iri(E + "order"), "x": num(5)},
        ],
    )


ONE_OR_MORE_TTL = """
@prefix : <http://example/> .
:a :next :b .
:b :next :c .
:c :next :d .
"""


def test_one_or_more_path(spark):
    # p+ fixpoint — beyond the reference (strict upgrade)
    q = """
    PREFIX : <http://example/>
    SELECT * { :a :next+ ?x . }"""
    out = run_sparql(spark, ONE_OR_MORE_TTL, q)
    assert_bag_equal(
        out,
        [{"x": iri(E + "b")}, {"x": iri(E + "c")}, {"x": iri(E + "d")}],
    )


def test_zero_or_more_path(spark):
    q = """
    PREFIX : <http://example/>
    SELECT * { :b :next* ?x . }"""
    out = run_sparql(spark, ONE_OR_MORE_TTL, q)
    assert_bag_equal(
        out,
        [{"x": iri(E + "b")}, {"x": iri(E + "c")}, {"x": iri(E + "d")}],
    )
