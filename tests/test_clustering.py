"""Deterministic integer k-means (extras/clustering.py): the Spark
plan, the DuckDB CTE oracle, and a literal Python recurrence must agree
bit-for-bit — all three are exact BIGINT arithmetic by construction."""

from __future__ import annotations

import duckdb
import pytest

from scio_sparql_spark.extras.clustering import (
    kmeans_micro,
    kmeans_micro_oracle_sql,
)


def _python_kmeans(vecs: dict, k: int, iters: int, dim: int):
    """The literal recurrence: micro-quantized ints in, exact ints out.
    vecs: {id: [float, ...]}."""
    import math

    def quant(x):
        # round half away from zero, like Spark F.round / DuckDB ROUND
        v = float(x) * 1_000_000
        return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))

    q = {i: [quant(x) for x in v[:dim]] for i, v in vecs.items()}
    cent = [q[i] for i in sorted(q)[:k]]

    def assign():
        out = {}
        for i, v in q.items():
            best, bj = None, None
            for j, c in enumerate(cent):
                d = sum((a - b) * (a - b) for a, b in zip(v, c))
                if best is None or d < best:
                    best, bj = d, j
            out[i] = (bj, best)
        return out

    def trunc_div(a, b):
        qd = abs(a) // abs(b)
        return qd if (a >= 0) == (b >= 0) else -qd

    for _ in range(iters):
        a = assign()
        sums = {}
        for i, (j, _) in a.items():
            s, n = sums.get(j, ([0] * dim, 0))
            sums[j] = ([x + y for x, y in zip(s, q[i])], n + 1)
        cent = [
            [trunc_div(x, sums[j][1]) for x in sums[j][0]] if j in sums else cent[j]
            for j in range(k)
        ]
    return assign()


@pytest.fixture(scope="module")
def small_vecs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(80)
    return df.localCheckpoint()


def test_kmeans_matches_python_recurrence(spark, small_vecs):
    rows = small_vecs.collect()
    vecs = {r["vec_id"]: list(r["embedding"]) for r in rows}
    want = _python_kmeans(vecs, k=4, iters=2, dim=64)
    got = {
        r["id"]: (r["cluster"], r["d2"])
        for r in kmeans_micro(small_vecs, k=4, iters=2).collect()
    }
    assert got == want


def test_kmeans_matches_duckdb_oracle(spark, small_vecs):
    import pandas as pd

    sp = (
        kmeans_micro(small_vecs, k=4, iters=2)
        .toPandas()
        .rename(columns={"id": "vec_id"})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pdf = small_vecs.select("vec_id", "embedding").toPandas()
    con = duckdb.connect()
    con.register("embeddings", pdf)
    od = (
        con.sql(kmeans_micro_oracle_sql(k=4, iters=2))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        sp[["vec_id", "cluster", "d2"]].astype("int64"),
        od[["vec_id", "cluster", "d2"]].astype("int64"),
    )


def test_kmeans_argmin_tie_breaks_to_lowest_cluster(spark):
    """Equidistant vector -> LOWEST cluster id (r17: the Arrow-matmul
    assignment's np.argmin first-minimum must replay the strict-<
    lowest-index tie-break the literal Column form and the DuckDB
    oracle's ROW_NUMBER (d2, cluster) both implement). v2 sits exactly
    between the two seeds, so iteration 1's assignment is a tie; a
    highest-index break would shift cluster 1's mean and diverge every
    downstream value from the Python recurrence."""
    dim = 64
    vecs = {
        0: [0.0] * dim,
        1: [4e-6] + [0.0] * (dim - 1),
        2: [2e-6] + [0.0] * (dim - 1),  # quantizes to [2,0,...]: d2=4 to both seeds
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    want = _python_kmeans(vecs, k=2, iters=1, dim=dim)
    got = {
        r["id"]: (r["cluster"], r["d2"])
        for r in kmeans_micro(df, k=2, iters=1).collect()
    }
    assert got == want
    assert got[2][0] == 0  # the tie really broke low, not just matched


def test_kmeans_every_vector_assigned_once(spark, small_vecs):
    out = kmeans_micro(small_vecs, k=4, iters=1)
    n = small_vecs.count()
    assert out.count() == n
    assert out.select("id").distinct().count() == n
    clusters = {r["cluster"] for r in out.select("cluster").distinct().collect()}
    assert clusters <= set(range(4))


def test_semdedup_matches_duckdb_oracle(spark, small_vecs):
    import pandas as pd

    from scio_sparql_spark.extras.clustering import (
        semdedup_oracle_sql,
        semdedup_pairs,
    )

    sp = (
        semdedup_pairs(small_vecs, k=4, iters=2, threshold_pct=30)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", small_vecs.select("vec_id", "embedding").toPandas())
    od = (
        con.sql(semdedup_oracle_sql(k=4, iters=2, threshold_pct=30))
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(sp) == len(od) and len(sp) > 0
    pd.testing.assert_frame_equal(sp.astype("int64"), od.astype("int64"))


def test_semdedup_pairs_share_cluster_and_pass_exact_cosine(spark, small_vecs):
    # every reported pair must be same-cluster and above the exact
    # float cosine recomputed driver-side (sanity vs the integer test)
    import math

    from scio_sparql_spark.extras.clustering import kmeans_micro, semdedup_pairs

    assign = {
        r["id"]: r["cluster"] for r in kmeans_micro(small_vecs, k=4, iters=2).collect()
    }
    vecs = {r["vec_id"]: list(r["embedding"]) for r in small_vecs.collect()}
    for r in semdedup_pairs(small_vecs, k=4, iters=2, threshold_pct=30).collect():
        assert assign[r["id_a"]] == assign[r["id_b"]] == r["cluster"]
        a, b = vecs[r["id_a"]], vecs[r["id_b"]]
        dot = sum(x * y for x, y in zip(a, b))
        cos = dot / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))
        # micro-quantization shifts the boundary by <1e-5
        assert cos >= 0.30 - 1e-4


def test_semdedup_degenerate_duplicate_cluster(spark):
    # VERDICT r8 item 1b: one embedding duplicated d times used to build
    # a d x d int64 matmul inside a single applyInPandas task. With the
    # unique-vector collapse the matmul is 1x1 and the d(d-1)/2 true
    # pairs (cos == 1) come from the narrow expansion. d=2000 -> ~2M
    # output rows; pre-fix this allocated a 4e6-cell matrix per probe
    # band and scaled quadratically in MEMORY, not just output.
    from pyspark.sql import functions as F

    from scio_sparql_spark.extras.clustering import semdedup_pairs

    base = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(20)
    )
    one = base.limit(1).collect()[0]["embedding"]
    d = 2000
    dup = spark.range(d).select(
        (F.col("id") + 500_000).alias("vec_id"),
        F.lit([float(x) for x in one]).alias("embedding"),
    )
    vecs = base.unionByName(dup)
    out = semdedup_pairs(vecs, k=4, iters=1, threshold_pct=70)
    n_dup_pairs = out.filter(
        (F.col("id_a") >= 500_000) & (F.col("id_b") >= 500_000)
    ).count()
    assert n_dup_pairs >= d * (d - 1) / 2  # the original doc pairs with them too


def test_semdedup_zero_vector_duplicates_never_pair(spark):
    # zero vectors have dot == 0 -> the "dot > 0" leg fails; the
    # duplicate-expansion must reproduce that exclusion
    from pyspark.sql import functions as F

    from scio_sparql_spark.extras.clustering import semdedup_pairs

    vecs = spark.range(6).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < 4, F.array(*[F.lit(0.0)] * 64))
        .otherwise(F.array(*([F.lit(1.0)] * 32 + [F.lit(0.5)] * 32)))
        .alias("embedding"),
    )
    got = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(vecs, k=2, iters=1, threshold_pct=70).collect()
    }
    assert got == {(4, 5)}


def test_semdedup_max_cluster_size_identity_below_bound(spark, small_vecs):
    # with the bound above every cluster's distinct count the split is
    # the identity: output must be bit-equal to the unbounded call
    from scio_sparql_spark.extras.clustering import semdedup_pairs

    plain = {
        tuple(r)
        for r in semdedup_pairs(small_vecs, k=4, iters=2, threshold_pct=30).collect()
    }
    capped = {
        tuple(r)
        for r in semdedup_pairs(
            small_vecs, k=4, iters=2, threshold_pct=30, max_cluster_size=10_000
        ).collect()
    }
    assert plain == capped


def test_split_oversized_clusters_bounds_and_determinism(spark):
    # a single cluster of 60 DISTINCT vectors with bound 16 must split
    # into clusters each <= 16 distinct vectors, cover all ids exactly
    # once, and be bit-identical across runs
    from pyspark.sql import functions as F

    from scio_sparql_spark.extras.clustering import (
        _split_oversized_clusters,
        quantize_micro,
    )

    vecs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(60)
        .select(
            F.col("vec_id").alias("id"),
            F.lit(0).cast("bigint").alias("cluster"),
            quantize_micro(F.col("embedding"), 64).alias("v"),
        )
    )
    runs = []
    for _ in range(2):
        out = _split_oversized_clusters(vecs, bound=16, max_rounds=5)
        rows = out.collect()
        sizes = {}
        for r in rows:
            sizes.setdefault(r["cluster"], set()).add(tuple(r["v"]))
        assert all(len(s) <= 16 for s in sizes.values()), {
            c: len(s) for c, s in sizes.items()
        }
        assert len(sizes) >= 4
        assert sorted(r["id"] for r in rows) == sorted(
            r["id"] for r in vecs.collect()
        )
        runs.append(sorted((r["id"], r["cluster"]) for r in rows))
    assert runs[0] == runs[1]


def test_semdedup_pca_flag_off_is_identity_and_on_runs(spark):
    # VERDICT r8 item 8: pca_whiten defaults OFF and must not change
    # the hash-gated default path; ON routes through ZCA whitening
    # (pytest-locked in test_linalg) and still yields a valid pair set
    # (every pair id-ordered, ids from the corpus).
    from scio_sparql_spark.extras.clustering import semdedup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(emb, k=4, iters=2, threshold_pct=70).collect()
    }
    off = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(
            emb, k=4, iters=2, threshold_pct=70, pca_whiten=False
        ).collect()
    }
    assert off == base
    ids = {r.vec_id for r in emb.select("vec_id").collect()}
    on = semdedup_pairs(
        emb, k=4, iters=2, threshold_pct=70, pca_whiten=True
    ).collect()
    assert all(r.id_a < r.id_b and r.id_a in ids and r.id_b in ids for r in on)
