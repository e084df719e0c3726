"""RDF collections and physical-plan regressions (pushdown/pruning)."""

from scio_sparql_spark import (
    execute_sparql,
    parse_turtle,
    quads_df_from_list,
    read_triples,
    write_triples,
)
from .helpers import assert_bag_equal, iri, num, run_sparql, s


def test_turtle_collection(spark):
    ttl = """
    @prefix : <urn:c:> .
    :menu :items ( :soup :salad ) .
    """
    quads = parse_turtle(ttl)
    preds = sorted(q[1].lex.rsplit("#", 1)[-1].rsplit(":", 1)[-1] for q in quads)
    assert preds == ["first", "first", "items", "rest", "rest"]
    rests = [q[2].lex for q in quads if q[1].lex.endswith("rest")]
    assert any(r.endswith("nil") for r in rests)


def test_query_collection_pattern(spark):
    ttl = """
    @prefix : <urn:c:> .
    :menu :items ( :soup :salad ) .
    :other :items ( :pie ) .
    """
    q = """
    PREFIX : <urn:c:>
    SELECT ?m WHERE { ?m :items ( :soup :salad ) . }"""
    out = run_sparql(spark, ttl, q)
    assert_bag_equal(out, [{"m": iri("urn:c:menu")}])


def test_query_collection_with_vars(spark):
    ttl = """
    @prefix : <urn:c:> .
    :menu :items ( :soup :salad ) .
    """
    q = """
    PREFIX : <urn:c:>
    SELECT ?first ?second WHERE { ?m :items ( ?first ?second ) . }"""
    out = run_sparql(spark, ttl, q)
    assert_bag_equal(out, [{"first": iri("urn:c:soup"), "second": iri("urn:c:salad")}])


def test_pattern_filter_pushes_into_parquet_scan(spark, tmp_path):
    """A predicate-bound pattern over quads parquet must reach the scan as
    PushedFilters on the struct fields — the scan-pruning contract that
    matters at 100 TB."""
    from scio_sparql_spark.terms import Term

    quads = quads_df_from_list(
        spark,
        [
            (Term.iri(f"urn:s:{i}"), Term.iri(f"urn:p:{i % 5}"), Term.integer(i), None)
            for i in range(100)
        ],
    )
    path = str(tmp_path / "q.parquet")
    write_triples(quads, path)
    back = read_triples(spark, path)
    df = execute_sparql(back, "SELECT ?s ?o WHERE { ?s <urn:p:3> ?o }")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # struct-field filters reach the parquet scan (the rendered filter
    # list is truncated by Spark, so check the leading entries)
    assert "PushedFilters: [IsNotNull(predicate.kind)" in plan, plan
    # column pruning: the un-referenced graph column is absent from the scan
    read_schema = plan.split("ReadSchema:", 1)[1]
    assert "graph" not in read_schema.split("\n")[0]
    assert df.count() == 20


def test_partition_pruning_on_predicate_layout(spark, tmp_path):
    from scio_sparql_spark.terms import Term

    quads = quads_df_from_list(
        spark,
        [
            (Term.iri(f"urn:s:{i}"), Term.iri(f"urn:p:{i % 5}"), Term.integer(i), None)
            for i in range(100)
        ],
    )
    path = str(tmp_path / "qp")
    write_triples(quads, path, partition_by_predicate=True)
    back = read_triples(spark, path)
    df = execute_sparql(back, "SELECT ?s ?o WHERE { ?s <urn:p:3> ?o }")
    assert df.count() == 20
