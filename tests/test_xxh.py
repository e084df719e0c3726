"""xxh.xxhash64 must be bit-identical to Spark's F.xxhash64 — the LSH
oracle replication (workload.ann_lsh_topk) depends on it."""

from pyspark.sql import functions as F

from scio_sparql_spark.extras.xxh import xxhash64


def test_xxhash64_matches_spark_length_sweep(spark):
    # every tail-length class: 0, 1-3 (byte tail), 4-7 (int+byte),
    # 8-31 (word steps), >=32 (stripes), plus multi-byte UTF-8
    cases = (
        [""]
        + ["b" * n for n in range(1, 41)]
        + ["abcd", "abcdef", "abcdefgh", "0123456789abcdefghij"]
        + [f"42:{b}:{i}" for b in range(4) for i in range(0, 64, 17)]
        + ["héllo wörld", "日本語テキスト", "\x00\x01\x02", "a\x00b"]
    )
    row = (
        spark.range(1)
        .select(*[F.xxhash64(F.lit(t)).alias(f"c{j}") for j, t in enumerate(cases)])
        .collect()[0]
    )
    for j, t in enumerate(cases):
        assert xxhash64(t) == row[j], repr(t)


def test_xxhash64_custom_seed_matches_spark(spark):
    # Spark chains multi-arg xxhash64 by re-seeding: xxhash64(a, b) ==
    # hash(b, seed=hash(a, 42)) — verify the seed parameter agrees.
    row = (
        spark.range(1)
        .select(F.xxhash64(F.lit("seed-case"), F.lit("payload")).alias("h"))
        .collect()[0]
    )
    assert xxhash64("payload", seed=xxhash64("seed-case")) == row["h"]
