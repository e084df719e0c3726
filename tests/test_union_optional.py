"""UNION and OPTIONAL parity with the reference's UnionTest/OptionalTest
(reference: src/test/scala/UnionTest.scala, OptionalTest.scala)."""

from .fixtures import OPTIONALS2_TTL, OPTIONALS_TTL, UNION_TTL
from .helpers import assert_bag_equal, iri, run_sparql, s


def test_single_union(spark):
    q = """
    PREFIX dc10:  <http://purl.org/dc/elements/1.0/>
    PREFIX dc11:  <http://purl.org/dc/elements/1.1/>
    SELECT ?title
    WHERE  { { ?book dc10:title  ?title } UNION { ?book dc11:title  ?title } }"""
    out = run_sparql(spark, UNION_TTL, q)
    assert_bag_equal(
        out,
        [
            {"title": s("SPARQL Query Language Tutorial")},
            {"title": s("SPARQL Protocol Tutorial")},
            {"title": s("SPARQL")},
            {"title": s("SPARQL (updated)")},
        ],
    )


def test_union_different_vars(spark):
    q = """
    PREFIX dc10:  <http://purl.org/dc/elements/1.0/>
    PREFIX dc11:  <http://purl.org/dc/elements/1.1/>
    SELECT ?x ?y
    WHERE  { { ?book dc10:title ?x } UNION { ?book dc11:title  ?y } }"""
    out = run_sparql(spark, UNION_TTL, q)
    assert_bag_equal(
        out,
        [
            {"x": s("SPARQL Query Language Tutorial"), "y": None},
            {"x": s("SPARQL"), "y": None},
            {"x": None, "y": s("SPARQL Protocol Tutorial")},
            {"x": None, "y": s("SPARQL (updated)")},
        ],
    )


def test_union_multi_pattern(spark):
    q = """
    PREFIX dc10:  <http://purl.org/dc/elements/1.0/>
    PREFIX dc11:  <http://purl.org/dc/elements/1.1/>
    SELECT ?title ?author
    WHERE  { { ?book dc10:title ?title .  ?book dc10:creator ?author }
             UNION
             { ?book dc11:title ?title .  ?book dc11:creator ?author } }"""
    out = run_sparql(spark, UNION_TTL, q)
    assert_bag_equal(
        out,
        [
            {"title": s("SPARQL Query Language Tutorial"), "author": s("Alice")},
            {"title": s("SPARQL Protocol Tutorial"), "author": s("Bob")},
        ],
    )


def test_single_optional(spark):
    q = """
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    SELECT ?name ?mbox
    WHERE  { ?x foaf:name  ?name .
             OPTIONAL { ?x  foaf:mbox  ?mbox } }"""
    out = run_sparql(spark, OPTIONALS_TTL, q)
    assert_bag_equal(
        out,
        [
            {"name": s("Alice"), "mbox": iri("mailto:alice@example.com")},
            {"name": s("Alice"), "mbox": iri("mailto:alice@work.example")},
            {"name": s("Bob"), "mbox": None},
        ],
    )


def test_multiple_optionals(spark):
    q = """
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    SELECT ?name ?mbox ?hpage
    WHERE  { ?x foaf:name  ?name .
             OPTIONAL { ?x foaf:mbox ?mbox } .
             OPTIONAL { ?x foaf:homepage ?hpage } }"""
    out = run_sparql(spark, OPTIONALS2_TTL, q)
    assert_bag_equal(
        out,
        [
            {"name": s("Alice"), "mbox": None, "hpage": iri("http://work.example.org/alice/")},
            {"name": s("Bob"), "mbox": iri("mailto:bob@work.example"), "hpage": None},
        ],
    )
