"""Operator-inventory edge cases from SURVEY.md §2 not covered by the
ported reference suite."""

from .helpers import assert_bag_equal, iri, num, run_sparql, s

TTL = """
@prefix : <urn:g:> .
:a :p 1 . :a :p 1 . :a :p 2 .
:b :p 3 .
:a :q :b .
:b :r :c .
"""


def test_reduced(spark):
    # REDUCED implemented as full dedup — permitted by spec, same as the
    # reference (Interpreter.scala:509-512)
    out = run_sparql(spark, TTL, "PREFIX : <urn:g:> SELECT REDUCED ?v WHERE { :a :p ?v }")
    assert_bag_equal(out, [{"v": num(1)}, {"v": num(2)}])


def test_bag_semantics_preserved(spark):
    # duplicates surface without DISTINCT (README.md:65-67)
    out = run_sparql(spark, TTL, "PREFIX : <urn:g:> SELECT ?v WHERE { :a :p ?v }")
    assert sorted(r["v"] for r in out) == [num(1), num(1), num(2)]


def test_count_star(spark):
    out = run_sparql(
        spark, TTL, "PREFIX : <urn:g:> SELECT (COUNT(*) AS ?n) WHERE { ?s :p ?v }"
    )
    assert_bag_equal(out, [{"n": num(4)}])


def test_implicit_group_on_empty_input(spark):
    # strict upgrade over the reference: COUNT over empty input returns
    # one row with 0 (the reference returns zero rows — SURVEY §2.4)
    out = run_sparql(
        spark, TTL, "PREFIX : <urn:g:> SELECT (COUNT(?v) AS ?n) WHERE { ?s :nope ?v }"
    )
    assert_bag_equal(out, [{"n": num(0)}])


def test_sum_distinct(spark):
    out = run_sparql(
        spark,
        TTL,
        "PREFIX : <urn:g:> SELECT (SUM(DISTINCT ?v) AS ?t) WHERE { :a :p ?v }",
    )
    assert_bag_equal(out, [{"t": num(3)}])  # 1+2, dup 1 collapsed


def test_count_distinct(spark):
    out = run_sparql(
        spark,
        TTL,
        "PREFIX : <urn:g:> SELECT ?s (COUNT(DISTINCT ?v) AS ?n) WHERE { ?s :p ?v } GROUP BY ?s",
    )
    assert_bag_equal(
        out,
        [{"s": iri("urn:g:a"), "n": num(2)}, {"s": iri("urn:g:b"), "n": num(1)}],
    )


def test_avg_distinct(spark):
    out = run_sparql(
        spark,
        TTL,
        "PREFIX : <urn:g:> SELECT (AVG(DISTINCT ?v) AS ?m) WHERE { :a :p ?v }",
    )
    assert_bag_equal(out, [{"m": num(1.5)}])


def test_group_by_expression(spark):
    out = run_sparql(
        spark,
        TTL,
        """PREFIX : <urn:g:>
           SELECT ?even (COUNT(?v) AS ?n) WHERE { ?s :p ?v }
           GROUP BY (FLOOR(?v / 2) AS ?even)""",
    )
    # values 1,1 -> floor .5 = 0; values 2,3 -> 1
    assert_bag_equal(
        out,
        [
            {"even": num(0), "n": num(2)},
            {"even": num(1), "n": num(2)},
        ],
    )


def test_inverse_path(spark):
    out = run_sparql(spark, TTL, "PREFIX : <urn:g:> SELECT ?x WHERE { :b ^:q ?x }")
    assert_bag_equal(out, [{"x": iri("urn:g:a")}])


def test_inverse_in_sequence(spark):
    # ?x :q/^:q ?y : a -> b -> back
    out = run_sparql(
        spark, TTL, "PREFIX : <urn:g:> SELECT ?x ?y WHERE { ?x :q/^:q ?y }"
    )
    assert_bag_equal(out, [{"x": iri("urn:g:a"), "y": iri("urn:g:a")}])


def test_values_standalone(spark):
    out = run_sparql(
        spark,
        TTL,
        'SELECT ?x WHERE { VALUES ?x { 1 "two" <urn:g:a> } }',
    )
    assert_bag_equal(out, [{"x": num(1)}, {"x": s("two")}, {"x": iri("urn:g:a")}])


def test_subselect(spark):
    out = run_sparql(
        spark,
        TTL,
        """PREFIX : <urn:g:>
           SELECT ?s ?mx WHERE {
             { SELECT ?s (MAX(?v) AS ?mx) WHERE { ?s :p ?v } GROUP BY ?s }
             FILTER(?mx > 2)
           }""",
    )
    assert_bag_equal(out, [{"s": iri("urn:g:b"), "mx": num(3)}])


def test_order_by_multiple_keys(spark):
    out = run_sparql(
        spark,
        TTL,
        "PREFIX : <urn:g:> SELECT ?s ?v WHERE { ?s :p ?v } ORDER BY ?s DESC(?v)",
    )
    assert [(r["s"], r["v"]) for r in out] == [
        (iri("urn:g:a"), num(2)),
        (iri("urn:g:a"), num(1)),
        (iri("urn:g:a"), num(1)),
        (iri("urn:g:b"), num(3)),
    ]


def test_offset_without_order(spark):
    out = run_sparql(spark, TTL, "PREFIX : <urn:g:> SELECT ?v WHERE { :a :p ?v } OFFSET 2")
    assert len(out) == 1


def test_ask_construct_supported(spark):
    # upgrade over the reference (which only parses tuple queries —
    # parseTupleQuery, Interpreter.scala:196-201): ASK/CONSTRUCT/DESCRIBE
    # now execute; full coverage in tests/test_query_forms.py
    from scio_sparql_spark import execute_sparql, parse_turtle, quads_df_from_list

    quads = quads_df_from_list(spark, parse_turtle(TTL))
    assert execute_sparql(quads, "ASK { ?s ?p ?o }").collect()[0]["ask"] is True
    n = execute_sparql(quads, "CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }").count()
    assert n > 0


def test_zero_length_path_in_named_graph(spark):
    trig = """
    @prefix : <urn:g:> .
    :g1 { :a :p :b . }
    """
    out = run_sparql(
        spark,
        trig,
        "PREFIX : <urn:g:> SELECT ?x ?g WHERE { GRAPH ?g { ?x :p? :b } }",
    )
    # zero-length (x = :b) + one-hop (x = :a), graph bound
    assert_bag_equal(
        out,
        [
            {"x": iri("urn:g:a"), "g": iri("urn:g:g1")},
            {"x": iri("urn:g:b"), "g": iri("urn:g:g1")},
        ],
    )


def test_initial_bindings_api(spark):
    from scio_sparql_spark import execute_sparql, parse_turtle, quads_df_from_list
    from scio_sparql_spark.terms import Term

    quads = quads_df_from_list(spark, parse_turtle(TTL))
    df = execute_sparql(
        quads,
        "PREFIX : <urn:g:> SELECT ?v WHERE { ?s :p ?v }",
        bindings={"s": Term.iri("urn:g:b")},
    )
    assert [r["v"]["lex"] for r in df.collect()] == ["3"]


def test_initial_bindings_plain_python_values(spark):
    """Plain int/str/float/bool bindings coerce to typed literals (r12,
    found by a verify drive: a raw int used to die with an Arrow
    AttributeError deep in arrow_terms_df); non-coercible values get a
    clear TypeError."""
    import pytest

    from scio_sparql_spark import execute_sparql, parse_turtle, quads_df_from_list

    quads = quads_df_from_list(spark, parse_turtle(TTL))
    q = "PREFIX : <urn:g:> SELECT ?s WHERE { ?s :p ?v }"
    got = [r["s"]["lex"] for r in execute_sparql(quads, q, bindings={"v": 3}).collect()]
    assert got == ["urn:g:b"]
    with pytest.raises(TypeError, match="binding 'v'"):
        execute_sparql(quads, q, bindings={"v": object()})
