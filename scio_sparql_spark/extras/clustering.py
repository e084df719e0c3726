"""Deterministic integer k-means over embedding columns.

The clustering step of large-scale corpus curation (SemDeDup pruning,
topic balancing, MoE data routing all start from k-means over document
embeddings). Spark's canonical k-means shape at 100 TB:

- centroids are a k x dim table, collected to the driver and
  BROADCAST into the assignment pass each iteration (k*dim*8 bytes —
  kilobytes, the same bounded-collect contract as the IVF quantizer,
  similarity.py);
- assignment is map-only whole-stage codegen: the per-centroid squared
  distance is an UNROLLED sum of ``(v[i] - c_i)^2`` terms with the
  centroid coordinates inlined as literals (the interpreted
  ``aggregate(zip_with(...))`` HOF form benchmarked ~4x slower on the
  cosine top-k operator — same finding as minhash_signatures);
- the centroid update is ONE groupBy(cluster) shuffle per iteration
  with map-side partial aggregation of dim running sums + a count.

Determinism (COVERAGE.md hash discipline): all arithmetic is exact
BIGINT. Embeddings are quantized once to integer micro-units
(round(x * 1e6)); squared distances are exact integer sums (64 dims x
(~1.6e6)^2 < 2^63, no overflow); centroid updates are integer mean
(sum DIV count, truncation toward zero — identical in Spark ``div``
and DuckDB ``//`` for either sign, verified -7//2 = -3 in both); ties
in the argmin break to the LOWEST cluster id on both engines
(strict <). Seeds are the k lowest-id vectors. Every iteration is
therefore bit-identical across Spark, DuckDB, and a literal Python
recurrence — no RNG, no float accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .util import spread


def quantize_micro(vec_col, dim: int):
    """array<float> -> array<bigint> micro-units: round(x * 1e6) per
    coordinate, the same float->double->round path the events oracles
    use (half away from zero in Spark F.round and DuckDB ROUND)."""
    return F.transform(
        F.slice(vec_col, 1, dim),
        lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
    )


def kmeans_micro(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    with_vectors: bool = False,
) -> DataFrame:
    """Lloyd's k-means, exact integer arithmetic throughout. Returns
    (id, cluster, d2) after ``iters`` assignment/update rounds:
    ``cluster`` is the final 0-based centroid index, ``d2`` the exact
    squared distance in micro^2 units.

    Per iteration: one driver collect of k centroids (bounded: k x dim
    BIGINTs), one broadcast-literal assignment pass (map-only), one
    groupBy(cluster) shuffle for the update. The final assignment pass
    reuses the same map-only shape. Empty clusters keep their previous
    centroid (no re-seeding — keeps the recurrence closed-form for the
    DuckDB/Python oracles)."""
    q = spread(vecs).select(
        F.col(id_col).alias("id"), quantize_micro(F.col(vec_col), dim).alias("v")
    )
    q = q.localCheckpoint()  # scanned iters+1 times; quantize once

    # seeds: the k lowest-id vectors, in id order -> cluster j = j-th id
    seed_rows = q.orderBy("id").limit(k).collect()
    centroids = [list(r["v"]) for r in seed_rows]

    # |v|^2 is centroid-independent, so the per-centroid score is the
    # factorized |c_j|^2 - 2*v.c_j (argmin-equivalent to the squared
    # distance, exact in integer arithmetic); the true d2 adds |v|^2
    # back once. The whole expression is ONE SQL string per pass:
    # building it as composed Column objects costs thousands of py4j
    # round trips (~6s of pure driver chatter per iteration, measured),
    # while one F.expr parses JVM-side in milliseconds — same codegen
    # after analysis.
    v2_sql = "+".join(f"v[{i}]*v[{i}]" for i in range(dim))

    def assign(df):
        scores = []
        for c in centroids:
            c2 = sum(int(x) * int(x) for x in c)
            dot = "+".join(f"v[{i}]*{int(c[i])}L" for i in range(dim))
            scores.append(f"CAST({c2}L - 2*({dot}) AS BIGINT)")
        d_arr = F.expr("array(" + ",".join(scores) + ")")
        best = F.array_min(d_arr)
        cluster = (F.array_position(d_arr, best) - 1).cast("bigint")
        d2 = (best + F.expr(v2_sql)).cast("bigint")
        return df.select("id", "v", cluster.alias("cluster"), d2.alias("d2"))

    for _ in range(iters):
        assigned = assign(q)
        sums = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[F.expr(f"sum(v[{i}]) AS s{i}") for i in range(dim)],
        )
        new_c = {
            int(r["cluster"]): [int(r[f"s{i}"]) for i in range(dim)]
            # Spark `div` truncates toward zero like DuckDB `//`
            for r in sums.selectExpr(
                "cluster", "n", *[f"s{i} DIV n AS s{i}" for i in range(dim)]
            ).collect()
        }
        centroids = [new_c.get(j, centroids[j]) for j in range(k)]

    final = assign(q)
    if with_vectors:
        return final.select("id", "cluster", "d2", "v")
    return final.select("id", "cluster", "d2")


def kmeans_micro_oracle_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """The DuckDB replica of kmeans_micro as chained CTEs (one
    assignment + one update pair per iteration, then the final
    assignment). Pure integer arithmetic — bit-identical to the Spark
    plan by construction; kept next to the operator so the unrolling
    stays in lockstep with the implementation."""
    quant = (
        f"SELECT {id_col} AS id, "
        f"list_transform({vec_col}[1:{dim}], "
        "x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS v "
        f"FROM {table}"
    )
    # c0: seeds = k lowest ids, cluster = rank-1
    parts = [
        f"q AS ({quant})",
        f"c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT)"
        f" AS cluster, v FROM q ORDER BY id LIMIT {k})",
    ]
    d2 = (
        "list_aggregate(list_transform(generate_series(1, {dim}), "
        "i -> (a.v[i] - c.v[i]) * (a.v[i] - c.v[i])), 'sum')"
    ).format(dim=dim)
    for it in range(iters):
        cin, aout, cout = f"c{it}", f"a{it + 1}", f"c{it + 1}"
        parts.append(
            f"{aout} AS (SELECT id, v, cluster, d2 FROM ("
            f"  SELECT a.id, a.v, c.cluster, {d2} AS d2,"
            f"         ROW_NUMBER() OVER (PARTITION BY a.id"
            f"           ORDER BY {d2}, c.cluster) AS rn"
            f"  FROM q a CROSS JOIN {cin} c)"
            f" WHERE rn = 1)"
        )
        parts.append(
            f"{cout} AS ("
            f"  SELECT p.cluster,"
            f"         COALESCE(u.v, p.v) AS v"
            f"  FROM {cin} p LEFT JOIN ("
            f"    SELECT cluster,"
            f"           list_transform(generate_series(1, {dim}),"
            f"             i -> list_aggregate(list_transform(list(v), x -> x[i]),"
            f"                  'sum') // COUNT(*)) AS v"
            f"    FROM {aout} GROUP BY cluster) u USING (cluster))"
        )
    final = (
        # CAST: DuckDB widens the integer list_aggregate sum to
        # HUGEINT, which the driver hash rejects (tests/test_oracle_types)
        f"SELECT id AS {id_col}, cluster, CAST(d2 AS BIGINT) AS d2 FROM ("
        f"  SELECT a.id, c.cluster, {d2} AS d2,"
        f"         ROW_NUMBER() OVER (PARTITION BY a.id"
        f"           ORDER BY {d2}, c.cluster) AS rn"
        f"  FROM q a CROSS JOIN c{iters} c)"
        f" WHERE rn = 1"
    )
    return "WITH " + ",\n".join(parts) + "\n" + final


def semdedup_pairs(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold_pct: int = 70,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup proper (Abbas et al. 2023): k-means-cluster the
    embeddings, then exact cosine >= threshold WITHIN each cluster
    (a < b). similarity.semantic_dup_pairs approximates the blocking
    with sign-pattern buckets because fitted k-means is normally
    non-reproducible; kmeans_micro is bit-deterministic, so the real
    composition becomes oracle-checkable.

    The cosine test is EXACT INTEGER arithmetic end to end — no float
    boundary anywhere: with micro-quantized vectors,
    ``cos >= t``  <=>  ``dot > 0  AND  10^4 * dot^2 >= t_pct^2 * |a|^2
    * |b|^2`` (t = t_pct/100). dots and squared norms are exact int64
    (|q| < 2^20, dim 64 -> |dot| < 2^46); the squared products exceed
    64 bits, so the final comparison runs on Python bignums — exact,
    and only O(within-cluster pairs) of them.

    Scale design (100 TB): ONE shuffle, on the cluster key, carrying
    each vector exactly once into applyInPandas — where the all-pairs
    dot matrix is a single vectorized Q @ Q.T per cluster. The r7 shape
    (self-join on cluster + per-pair interpreted zip_with/aggregate)
    materialized every candidate pair as a shuffled row and evaluated
    the dot per pair in the expression interpreter — measured 2.6x
    slower at sf0.1 and strictly worse at scale, where the join writes
    O(sum of cluster^2) rows to shuffle while this writes O(rows).
    Quadratic memory/compute stays bounded per cluster by SemDeDup's
    own contract (k grows with the corpus to cap cluster sizes)."""
    import numpy as np
    import pandas as pd

    assigned = kmeans_micro(vecs, k, iters, dim, vec_col, id_col, with_vectors=True)
    tt = threshold_pct * threshold_pct

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cluster": []})
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy()
        Q = np.stack(pdf["v"].to_numpy()).astype(np.int64)
        D = Q @ Q.T  # exact int64
        n2 = np.diag(D)
        ii, jj = np.triu_indices(n, k=1)
        d = D[ii, jj]
        pos = d > 0
        if not pos.any():
            return empty
        ii, jj, d = ii[pos], jj[pos], d[pos]
        do = d.astype(object)  # Python bignums: the squares are exact
        keep = (10000 * do * do) >= (
            tt * n2[ii].astype(object) * n2[jj].astype(object)
        )
        keep = np.asarray(keep, dtype=bool)
        return pd.DataFrame(
            {
                "id_a": ids[ii[keep]],
                "id_b": ids[jj[keep]],
                "cluster": np.full(int(keep.sum()), pdf["cluster"].iloc[0]),
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        pairs, schema="id_a bigint, id_b bigint, cluster bigint"
    )


def semdedup_oracle_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 3,
    threshold_pct: int = 70,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB replica of semdedup_pairs: the kmeans CTE chain, then the
    within-cluster exact-integer cosine test (HUGEINT products)."""
    km = kmeans_micro_oracle_sql(table, k, iters, dim, vec_col, id_col)
    # reuse the kmeans oracle's CTEs; rebuild assignment WITH vectors
    head, _, _tail = km.rpartition("SELECT id AS")
    dot = (
        "list_aggregate(list_transform(generate_series(1, {dim}), "
        "i -> a.v[i] * b.v[i]), 'sum')"
    ).format(dim=dim)
    n2 = (
        "list_aggregate(list_transform(generate_series(1, {dim}), "
        "i -> {s}.v[i] * {s}.v[i]), 'sum')"
    )
    return (
        head.rstrip().rstrip(",")
        + f""",
        fin AS (
          SELECT id, v, cluster FROM (
            SELECT a.id, a.v, c.cluster,
                   ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY
                     list_aggregate(list_transform(generate_series(1, {dim}),
                       i -> (a.v[i] - c.v[i]) * (a.v[i] - c.v[i])), 'sum'),
                     c.cluster) AS rn
            FROM q a CROSS JOIN c{iters} c) WHERE rn = 1)
        SELECT a.id AS id_a, b.id AS id_b, a.cluster
        FROM fin a JOIN fin b ON a.cluster = b.cluster AND a.id < b.id
        WHERE {dot} > 0
          AND 10000 * CAST({dot} AS HUGEINT) * CAST({dot} AS HUGEINT)
              >= CAST({n2.format(dim=dim, s='a')} AS HUGEINT)
                 * CAST({n2.format(dim=dim, s='b')} AS HUGEINT)
                 * {threshold_pct * threshold_pct}"""
    )
