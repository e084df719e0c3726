"""Custom stateful streaming operator: incremental sessionization with
applyInPandasWithState.

The batch `events.sessionize` recomputes sessions per run; this keeps
per-user state (last event time, open-session counters) across
micro-batches — the Structured Streaming way to run the same logic
continuously. State is partitioned by user_id: shuffles only the key's
events per batch, state store is RocksDB/HDFS-backed on a real cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def session_counts_stateful(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """Streaming DF (user_id, ts, ...) -> per-user running
    (n_sessions, n_events), updated each micro-batch."""
    gap = gap_minutes * 60.0

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        # one global sort over the WHOLE group's batch: the iterator
        # yields the group in Arrow-sized chunks, and sorting chunk-by-
        # chunk would process a split group out of time order
        times = [t for pdf in pdfs for t in pdf[ts_col]]
        for t in sorted(times):
            ts = t.timestamp() if hasattr(t, "timestamp") else float(t)
            if last_ts is None or ts - last_ts > gap:
                n_sessions += 1
            last_ts = ts
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
