"""Triangle counting: brute-force reference + DuckDB differential.

No catalog slot (the 100-active / 50-window freshness arithmetic is
exactly full), so correctness evidence lives here: a pure-Python
reference on random graphs, the classic fixed cases, and a DuckDB
replica of the identical ordered-degree construction — the same
differential discipline as the catalog oracles, run in pytest."""

from itertools import combinations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scio_sparql_spark.extras.graph import triangle_counts

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
    derandomize=True,
)

_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=0,
    max_size=25,
)


def _py_triangles(edges):
    adj = {}
    es = set()
    for s, d in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for nodes in combinations(sorted(adj), 3):
        a, b, c = nodes
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in nodes:
                counts[n] = counts.get(n, 0) + 1
    return counts


def _spark_counts(spark, edges):
    if not edges:
        edges = [(0, 0)]  # schema carrier; self-loop drops out
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }


@given(edges=_edges)
@_settings
def test_fuzz_triangles_vs_bruteforce(spark, edges):
    assert _spark_counts(spark, edges) == _py_triangles(edges)


def test_triangles_fixed_cases(spark):
    # K4: every node is in C(3,2) = 3 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _spark_counts(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # a 4-cycle has no triangles
    assert _spark_counts(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]) == {}
    # parallel + self edges collapse: one triangle
    messy = [(0, 1), (1, 0), (1, 2), (0, 2), (2, 2), (0, 1)]
    assert _spark_counts(spark, messy) == {0: 1, 1: 1, 2: 1}


def test_triangles_duckdb_differential(spark):
    """The identical ordered-degree construction in DuckDB over the
    part co-order graph derived from the sf0.001 lineitem table — the
    catalog-oracle discipline without a catalog slot."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    # co-ordered parts: two parts appearing in the same order
    l1 = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    l2 = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        l1.join(l2, on="l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    got = sorted(
        (r["node"], r["n_triangles"]) for r in triangle_counts(edges).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.execute(
        """WITH e0 AS (
             SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
             FROM lineitem l1 JOIN lineitem l2 USING (l_orderkey)
             WHERE l1.l_partkey < l2.l_partkey),
           deg AS (
             SELECT node, COUNT(*) AS d FROM (
               SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
             GROUP BY node),
           dir AS (
             SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u,
                    CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS v,
                    CASE WHEN (da.d, a) < (db.d, b)
                         THEN struct_pack(d := db.d, n := b)
                         ELSE struct_pack(d := da.d, n := a) END AS ov
             FROM e0
             JOIN deg da ON da.node = e0.a
             JOIN deg db ON db.node = e0.b),
           tri AS (
             SELECT e1.u AS x, e1.v AS y, e2.v AS z
             FROM dir e1 JOIN dir e2
               ON e1.u = e2.u AND (e1.ov.d, e1.ov.n) < (e2.ov.d, e2.ov.n)
             JOIN dir e3 ON e3.u = e1.v AND e3.v = e2.v)
           SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
           FROM (SELECT unnest([x, y, z]) AS node FROM tri)
           GROUP BY node ORDER BY node"""
    ).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) > 0  # the co-order graph actually has triangles
