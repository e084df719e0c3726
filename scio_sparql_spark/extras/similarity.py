"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH-bucketed (random
hyperplane) variant as the scale path. Dot products run as native
``F.zip_with``/``F.aggregate`` over the array — JVM-side, no Python.

Scale notes (100 TB): brute force is a single narrow scan + top-k
(TakeOrderedAndProject — no full sort). The LSH variant buckets on a
signature so each probe touches ~1/2^bits of the data; hyperplanes are
derived deterministically (seeded hash) so signatures never need a
driver-side model object.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector. Plan: scan ->
    per-row dot (codegen) -> TakeOrderedAndProject(k). No shuffle of the
    full table."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def random_hyperplane_signature(vec_col, dim: int, bits: int = 16, seed: int = 42):
    """LSH signature: sign pattern against `bits` pseudo-random hyperplanes.
    Hyperplane components are deterministic hash-derived +-1 values —
    reproducible across executors with no broadcast state."""
    sig = F.lit(0).cast("long")
    for b in range(bits):
        plane = F.array(
            *[
                F.when(F.xxhash64(F.lit(f"{seed}:{b}:{i}")) % 2 == 0, F.lit(1.0)).otherwise(
                    F.lit(-1.0)
                )
                for i in range(dim)
            ]
        )
        bit = F.when(_dot(vec_col, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe only rows whose hyperplane signature
    matches the query's (expected 1/2^bits of the table), then exact
    cosine within the bucket. Recall grows with multi-probe (not
    implemented) or fewer bits."""
    dim = len(query_vec)
    qsig_df = emb.sparkSession.range(1).select(
        random_hyperplane_signature(
            F.array(*[F.lit(float(x)) for x in query_vec]), dim, bits, seed
        ).alias("qsig")
    )
    qsig = qsig_df.collect()[0]["qsig"]
    bucket = emb.filter(
        random_hyperplane_signature(F.col(vec_col), dim, bits, seed) == F.lit(qsig)
    )
    return cosine_topk(bucket, query_vec, k, id_col, vec_col)


def all_pairs_above(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (a < b) — small-SF oracle
    baseline for near-duplicate embeddings; quadratic, use LSH at scale."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score")
    ).filter(F.col("score") >= threshold)
