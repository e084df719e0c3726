"""Streaming deduplication: exact dedup over an unbounded document
stream.

The batch `extras.dedup.exact_dedup` re-scans the corpus per run; this
is the Structured Streaming form for a continuously-arriving corpus
(crawl output, log tail): digest each document map-side, keep the first
occurrence, drop the rest.

Scale notes (100 TB stream):
- Only the 16-byte md5 digest enters the dedup state store, never the
  document text — state size is O(distinct docs seen in the watermark
  horizon) x 16 bytes, not O(corpus bytes).
- `dropDuplicatesWithinWatermark` bounds state: a duplicate arriving
  later than the watermark delay is passed through rather than dropped,
  which is the correct streaming tradeoff (bounded state, at-least-once
  dedup) — a terminal exact pass (batch exact_dedup) squeezes the
  remainder.
- Without an event-time column the unbounded variant
  (`dropDuplicates`) is also exposed for keyed short streams; prefer
  the watermarked form on real pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    watermark: str | None = "10 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming DF -> same rows minus later exact-text duplicates.

    With ``watermark`` (and ``ts_col`` present) state is bounded via
    dropDuplicatesWithinWatermark; pass ``watermark=None`` for the
    unbounded-state variant (bounded/replay streams only).
    """
    digested = docs.withColumn("__h", F.md5(F.col(text_col)))
    if watermark is not None:
        out = digested.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__h"]
        )
    else:
        out = digested.dropDuplicates(["__h"])
    return out.drop("__h")


def streaming_dedup_from_path(
    spark,
    path: str,
    schema,
    watermark: str | None = "10 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """File-source convenience: readStream parquet -> streaming dedup.
    Run with trigger(availableNow=True) for bounded verification."""
    from .bounded import stream_parquet

    stream = stream_parquet(spark, path, schema)
    return streaming_exact_dedup(stream, watermark, ts_col, text_col)
