"""Deduplication operators for large-scale text corpora.

Beyond-reference surface (BASELINE.json north star): exact dedup,
n-gram Jaccard near-dup, MinHash+LSH banding, SimHash. All pure
DataFrame/native-function plans — no Python in the row path.

Scale notes (100 TB):
- exact: one hash-groupBy shuffle on a 16-byte digest, map-side combine.
- minhash_lsh: cost is O(docs x num_hashes) map work + one shuffle per
  band on (band, bucket) keys; candidate verification joins only within
  buckets — never all-pairs.
- ngram_jaccard_pairs is the *exact* quadratic baseline for oracle
  verification at small SF; use the LSH path at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = r"\s+"


def _tokens(col):
    return F.split(F.trim(F.lower(col)), TOKEN_RE)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact text. Hash-groupBy on
    md5(text) — the digest, not the full text, shuffles."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("__h"))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def token_ngrams(col, n: int = 3):
    """Array of word n-grams (shingles) from a text column."""
    toks = _tokens(col)
    return F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
        lambda s: s != "",
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard >= threshold (a < b). Quadratic —
    the small-SF oracle baseline; use minhash_lsh_pairs at scale."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(token_ngrams(F.col(text_col), n)).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter / union
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig) MinHash signatures: shingles exploded once, then
    num_hashes seeded-xxhash64 MIN aggregates in a single groupBy —
    one shuffle with map-side combine, each doc tokenized exactly once
    (an inline per-row expression would re-tokenize num_hashes times)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(token_ngrams(F.col(text_col), n))).alias("s"),
    )
    aggs = [F.min(F.xxhash64("s", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    return (
        sh.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by estimated
    Jaccard (signature agreement). shingle -> minhash -> band -> bucket
    join: only same-bucket docs ever meet (no quadratic blowup)."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, text_col, id_col).cache()
    # signatures reused by the bucket join and the verify join
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.array_join(F.slice("sig", b * rows + 1, rows), ","),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sa")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.aggregate(
                    F.zip_with("sa", "sb", lambda a, b: F.when(a == b, 1).otherwise(0)),
                    F.lit(0),
                    lambda acc, x: acc + x,
                )
                / num_hashes
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    return verified


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, bit-wise majority
    vote. All native: explode -> per-bit sums -> one groupBy shuffle."""
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sh = None
    for i in range(bits):
        bit = F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sh = bit if sh is None else sh.bitwiseOR(bit)
    return agg.select(F.col(id_col), sh.alias("simhash"))


def simhash_dup_pairs(docs: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit
    chunks (a pair within hamming<=3 shares at least one of 4 chunks)."""
    sh = simhash(docs, **kw).localCheckpoint()
    chunks = sh.select(
        F.col("doc_id").alias("id"),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(
                        F.lit(0xFFFF).cast("long")
                    )
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    cand = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk_idx") == F.col("y.chunk_idx"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
