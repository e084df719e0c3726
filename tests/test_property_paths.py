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


GRAPH_CHAINS_TRIG = """
@prefix : <urn:c:> .
:g1 { :a :next :b . :b :next :c . }
:g2 { :b :next :d . :x :next :y . }
"""


def test_plus_path_inside_graph_var(spark):
    """p+ under GRAPH ?g: the closure is computed per named graph — a
    chain must not cross graph boundaries (a->b->c only inside :g1;
    b->d only inside :g2), and ?g binds to the graph of each chain."""
    q = """
    PREFIX : <urn:c:>
    SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s :next+ ?o } }"""
    out = run_sparql(spark, GRAPH_CHAINS_TRIG, q)
    g1, g2 = iri("urn:c:g1"), iri("urn:c:g2")
    assert_bag_equal(
        out,
        [
            {"g": g1, "s": iri("urn:c:a"), "o": iri("urn:c:b")},
            {"g": g1, "s": iri("urn:c:b"), "o": iri("urn:c:c")},
            {"g": g1, "s": iri("urn:c:a"), "o": iri("urn:c:c")},
            {"g": g2, "s": iri("urn:c:b"), "o": iri("urn:c:d")},
            {"g": g2, "s": iri("urn:c:x"), "o": iri("urn:c:y")},
        ],
    )


def test_star_path_inside_graph_constant(spark):
    q = """
    PREFIX : <urn:c:>
    SELECT ?o WHERE { GRAPH :g1 { :a :next* ?o } }"""
    out = run_sparql(spark, GRAPH_CHAINS_TRIG, q)
    assert_bag_equal(
        out,
        [
            {"o": iri("urn:c:a")},
            {"o": iri("urn:c:b")},
            {"o": iri("urn:c:c")},
        ],
    )


def test_star_path_inside_graph_var_zero_length(spark):
    """p* zero-length arm under GRAPH ?g: every node of each named graph
    reaches itself within that graph only."""
    q = """
    PREFIX : <urn:c:>
    SELECT ?g ?o WHERE { GRAPH ?g { :x :next* ?o } }"""
    out = run_sparql(spark, GRAPH_CHAINS_TRIG, q)
    # zero-length: :x is a node only of :g2 -> (g2, x); one-step: x->y in g2
    assert {(d["g"], d["o"]) for d in out} == {
        (iri("urn:c:g2"), iri("urn:c:x")),
        (iri("urn:c:g2"), iri("urn:c:y")),
    }
