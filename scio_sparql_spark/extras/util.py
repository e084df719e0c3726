"""Shared helpers for the beyond-reference pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition an under-partitioned input up to the cluster's default
    parallelism before heavy per-row map work.

    Small-but-expensive inputs (one parquet row group of long documents)
    arrive as a single partition, serializing tokenize/hash work onto one
    core (observed 11x slowdown at sf0.01/sf0.1). At real scale inputs
    already have >= defaultParallelism splits and this is a no-op — the
    check costs nothing (getNumPartitions reads plan metadata, no job).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
