"""Join-order heuristic: badly ordered BGPs must not cross-join."""

from scio_sparql_spark import execute_sparql, parse_turtle, quads_df_from_list

from .helpers import assert_bag_equal, iri, num, run_sparql

TTL = """
@prefix : <urn:o:> .
:a1 :p :b1 . :a2 :p :b2 .
:b1 :q :c1 . :b2 :q :c2 .
:c1 :r 1 .   :c2 :r 2 .
"""


def test_disconnected_order_becomes_connected(spark):
    # textual order joins ?c :r ?v against ?a :p ?b first (no shared vars
    # -> cross product in the reference); the reorder heuristic chains
    # them connected
    q = """
    PREFIX : <urn:o:>
    SELECT ?a ?v WHERE {
      ?c :r ?v .
      ?a :p ?b .
      ?b :q ?c .
    }"""
    quads = quads_df_from_list(spark, parse_turtle(TTL))
    df = execute_sparql(quads, q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    out = run_sparql(spark, TTL, q)
    assert_bag_equal(
        out,
        [
            {"a": iri("urn:o:a1"), "v": num(1)},
            {"a": iri("urn:o:a2"), "v": num(2)},
        ],
    )


def test_ground_pattern_ordered_first(spark):
    # the fully-ground-subject pattern is most selective; query still
    # correct regardless of listed order
    q = """
    PREFIX : <urn:o:>
    SELECT ?v WHERE {
      ?b :q ?c .
      ?c :r ?v .
      :a1 :p ?b .
    }"""
    out = run_sparql(spark, TTL, q)
    assert_bag_equal(out, [{"v": num(1)}])


def test_exists_under_not_reordered(spark):
    # EXISTS pattern nested under ! — inner BGP is listed disconnected;
    # recursion through ENot must still reorder it
    q = """
    PREFIX : <urn:o:>
    SELECT ?a WHERE {
      ?a :p ?b .
      FILTER(!EXISTS { ?c :r ?v . ?b :q ?c . FILTER(?v > 1) })
    }"""
    quads = quads_df_from_list(spark, parse_turtle(TTL))
    df = execute_sparql(quads, q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    out = run_sparql(spark, TTL, q)
    assert_bag_equal(out, [{"a": iri("urn:o:a1")}])


def test_reorder_does_not_cross_optional_boundary(spark):
    # patterns inside OPTIONAL must stay inside it: reordering may not
    # hoist the optional pattern into the required BGP (which would turn
    # a left join into an inner join)
    ttl = """
    @prefix : <urn:o:> .
    :a1 :p :b1 . :a2 :p :b2 .
    :b1 :q :c1 .
    """
    q = """
    PREFIX : <urn:o:>
    SELECT ?a ?c WHERE {
      ?a :p ?b .
      OPTIONAL { ?b :q ?c }
    }"""
    out = run_sparql(spark, ttl, q)
    # a2 has no :q edge -> must still appear with unbound ?c
    assert_bag_equal(
        out,
        [
            {"a": iri("urn:o:a1"), "c": iri("urn:o:c1")},
            {"a": iri("urn:o:a2"), "c": None},
        ],
    )


def test_reorder_keeps_minus_semantics(spark):
    ttl = """
    @prefix : <urn:o:> .
    :a1 :p 1 . :a2 :p 2 .
    :a1 :x 9 .
    """
    q = """
    PREFIX : <urn:o:>
    SELECT ?a WHERE {
      ?a :p ?v .
      MINUS { ?a :x ?w }
    }"""
    out = run_sparql(spark, ttl, q)
    assert_bag_equal(out, [{"a": iri("urn:o:a2")}])
