"""FROM / FROM NAMED explicit datasets (spec §13.2) — upgrade: rdf4j
parses these but the reference ignores the parsed dataset."""

from .helpers import assert_bag_equal, iri, s, run_sparql

TRIG = """
@prefix : <urn:d:> .
:x :p "default" .
:g1 { :x :p "one" . }
:g2 { :x :p "two" . }
"""


def test_from_restricts_default_graph(spark):
    q = "PREFIX : <urn:d:> SELECT ?v FROM <urn:d:g1> WHERE { ?x :p ?v }"
    assert_bag_equal(run_sparql(spark, TRIG, q), [{"v": s("one")}])


def test_from_union_of_graphs(spark):
    q = """PREFIX : <urn:d:>
           SELECT ?v FROM <urn:d:g1> FROM <urn:d:g2> WHERE { ?x :p ?v }"""
    assert_bag_equal(
        run_sparql(spark, TRIG, q), [{"v": s("one")}, {"v": s("two")}]
    )


def test_from_named_scopes_graph_patterns(spark):
    q = """PREFIX : <urn:d:>
           SELECT ?g ?v FROM NAMED <urn:d:g2> WHERE { GRAPH ?g { ?x :p ?v } }"""
    assert_bag_equal(
        run_sparql(spark, TRIG, q), [{"g": iri("urn:d:g2"), "v": s("two")}]
    )


def test_from_named_only_empties_default(spark):
    # with only FROM NAMED, the default graph is empty
    q = "PREFIX : <urn:d:> SELECT ?v FROM NAMED <urn:d:g1> WHERE { ?x :p ?v }"
    assert run_sparql(spark, TRIG, q) == []


def test_from_and_from_named_are_disjoint(spark):
    # default patterns see only FROM graphs; GRAPH only FROM NAMED ones
    q = """PREFIX : <urn:d:>
           SELECT ?v ?w FROM <urn:d:g1> FROM NAMED <urn:d:g2>
           WHERE { ?x :p ?v . GRAPH ?g { ?y :p ?w } }"""
    assert_bag_equal(
        run_sparql(spark, TRIG, q), [{"v": s("one"), "w": s("two")}]
    )


def test_no_dataset_keeps_union_default(spark):
    # without clauses: union-default semantics (reference parity)
    q = "PREFIX : <urn:d:> SELECT ?v WHERE { ?x :p ?v }"
    assert_bag_equal(
        run_sparql(spark, TRIG, q),
        [{"v": s("default")}, {"v": s("one")}, {"v": s("two")}],
    )
