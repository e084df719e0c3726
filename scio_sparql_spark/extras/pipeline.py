"""Training-data pipeline plumbing: deterministic sampling and
token-budget shard packing.

Beyond-reference surface (BASELINE.json north star). Both operators are
pure native-Column plans designed for the 100 TB shape:

- `deterministic_sample` is a map-side filter on a hash of the key — no
  shuffle, no RNG state, reproducible across runs/engines/partitionings
  (the property `df.sample()` does NOT have), and composable: the same
  threshold always selects the same rows, so incremental reruns of a
  pipeline keep their sample stable.
- `pack_shards` assigns documents to fixed-token-budget shards (the
  "pack the corpus into ~1B-token training shards" step). The global
  running sum is computed scalably: range-repartition on the order key,
  per-partition local cumulative sums, then a driver-side prefix of the
  P per-partition totals (P rows — trivially small) broadcast back as
  offsets. No single-partition global window, no full sort on one core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .util import spread


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by md5(key): a row is kept iff
    the first 8 hex chars of md5(CAST(key AS STRING)) fall below the
    fraction-scaled threshold. Stateless, shuffle-free, and engine-
    portable (any system with md5 reproduces the exact membership)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = format(int(fraction * 0xFFFFFFFF), "08x")
    return df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8) <= F.lit(threshold)
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep at most `cap` rows per domain, chosen deterministically by
    md5(key) rank within the domain — the "no single domain dominates
    the corpus" quota step of a web-crawl pipeline.

    One shuffle on the domain key (the window partition). Deterministic:
    the same rows survive on any cluster/partitioning, and the selection
    is engine-portable (md5 rank, no RNG). Skew note for 100 TB: a
    mega-domain concentrates its rows on one partition; AQE skew-join
    handling does not apply to windows, so for truly pathological
    domains pre-filter with `deterministic_sample` (map-side) to knock
    the per-domain row count down to O(cap * safety) before ranking —
    sampling by the SAME md5 ordering keeps the final selection
    identical."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def pack_shards(
    docs: DataFrame,
    budget: int,
    n_tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    num_ranges: int = 32,
) -> DataFrame:
    """Assign each document a shard id so consecutive documents (in
    `order_col` order) accumulate into shards of ~`budget` tokens:
    ``shard = floor(tokens_before_this_doc / budget)``.

    Scalable prefix-sum: range-partition by the order key, local
    window-cumsum within each range, then offset every range by the
    driver-computed prefix of per-range totals (collect of `num_ranges`
    rows, not data)."""
    parts = spread(docs).repartitionByRange(num_ranges, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parts.withColumn("__cum", F.sum(n_tokens_col).over(w))
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.max("__cum").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_col = F.coalesce(
        *[
            F.when(F.col("__pid") == pid, F.lit(off))
            for pid, off in sorted(offsets.items())
        ],
        F.lit(0),
    ) if offsets else F.lit(0)
    return local.select(
        F.col(order_col),
        F.col(n_tokens_col),
        F.floor(
            (F.col("__cum") + offset_col - F.col(n_tokens_col)) / F.lit(budget)
        ).alias("shard"),
    )
