"""Event-stream operators: tumbling-window aggregation and sessionization.

The reference has no streaming surface (Beam used strictly bounded —
SURVEY.md §2.10); these are the beyond-reference stream operators a
training-data pipeline needs, written so the SAME logic runs in both
modes:

- batch: plain DataFrame in, DataFrame out (oracle-checkable vs DuckDB)
- streaming: `readStream` + watermark + windowed agg /
  applyInPandasWithState-style sessionization via the shared helpers

Scale notes: windowed agg is a keyed shuffle on (window, key) with
partial aggregation; sessionization shuffles once on user_id and sorts
within partitions (window function), no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count + value sum per key. Works identically on a
    batch DF and a streaming DF (add .withWatermark upstream for late
    data).

    The sum is emitted as integer micro-units with the per-row rounding
    done BEFORE the aggregation: summing doubles is partition-order
    dependent in the last bits, while an integer sum is exact and
    order-independent (COVERAGE.md hash discipline)."""
    value_micro = F.round(F.col("value") * 1000000).cast("bigint")
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_micro).alias("sum_value_micro"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "sum_value_micro",
        )
    )


def streaming_windowed_counts(
    spark,
    path: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """File-source streaming variant: readStream -> watermark -> windowed
    agg. Run with trigger(availableNow=True) for bounded verification."""
    from .bounded import stream_parquet

    stream = stream_parquet(spark, path, schema)
    return windowed_counts(
        stream.withWatermark(ts_col, watermark), window, ts_col, key_col
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    max_gap_minutes: int = 60,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time interval join: each left event pairs with the same
    key's right events occurring within (left.ts, left.ts + gap] — the
    click->purchase attribution shape. Works identically on batch DFs
    and on two STREAMING DFs: with watermarks on both sides the range
    condition bounds each side's state (Structured Streaming
    stream-stream inner join), so state is O(events in the gap window),
    not O(stream).

    Output: (key, left ts, right ts, left event_id, right event_id).
    Strict lower bound (r.ts > l.ts) keeps self-pairs out when both
    sides derive from one stream."""
    l, r = left.alias("l"), right.alias("r")
    lc, rc = (lambda c: F.col(f"l.{c}")), (lambda c: F.col(f"r.{c}"))
    cond = (
        (lc(key_col) == rc(key_col))
        & (rc(ts_col) > lc(ts_col))
        & (rc(ts_col) <= lc(ts_col) + F.expr(f"INTERVAL {max_gap_minutes} MINUTES"))
    )
    return l.join(r, cond, "inner").select(
        lc(key_col).alias(key_col),
        lc(ts_col).alias("left_ts"),
        rc(ts_col).alias("right_ts"),
        lc("event_id").alias("left_event_id"),
        rc("event_id").alias("right_event_id"),
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session assignment: a new session starts when the gap to the
    previous event of the same user exceeds `gap_minutes`. One shuffle on
    user_id; cumulative-sum window for session ids."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_minutes * 60)
    ).cast("int")
    return events.withColumn("session_seq", F.sum(new_session).over(w))


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user session count + mean session length (events)."""
    s = sessionize(events, gap_minutes, ts_col, user_col)
    per_session = s.groupBy(user_col, "session_seq").agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy(user_col).agg(
        F.max("session_seq").alias("n_sessions"),
        F.round(F.avg("n"), 6).alias("avg_events_per_session"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "asof_value",
) -> DataFrame:
    """As-of join: each left row picks the `value_col` of the LATEST
    right row with ``right.ts <= left.ts`` for the same key (the
    point-in-time lookup DuckDB spells ``ASOF JOIN`` and feature stores
    call a temporal join). Left rows with no prior right row are dropped
    (inner asof).

    Spark-first plan: instead of a range join (O(n*m) candidate
    explosion) or a per-key collect, tag both sides, union them, and run
    ONE keyed window pass — `last(right_value, ignorenulls)` over rows
    ordered by (ts, side) carries the most recent right value forward
    into each left row. Exactly one shuffle on the key, linear work,
    identical at any scale. Right rows are pre-aggregated to unique
    (key, ts) so tie-breaking is deterministic on both engines."""
    r = (
        right.groupBy(key_col, ts_col)
        .agg(F.max(value_col).alias("__rv"))
        .withColumn("__side", F.lit(0))
    )
    l = left.withColumn("__side", F.lit(1)).withColumn("__rv", F.lit(None).cast(r.schema["__rv"].dataType))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn(
        out_col, F.last(F.when(F.col("__side") == 0, F.col("__rv")), ignorenulls=True).over(w)
    )
    return (
        carried.filter((F.col("__side") == 1) & F.col(out_col).isNotNull())
        .drop("__side", "__rv")
    )


def funnel(
    events: DataFrame,
    steps: list,
    within: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: per user, the earliest time each step in
    `steps` completes, where step k must occur strictly AFTER step k-1
    and the whole chain must finish within `within` of step 0. Returns
    one row per user that completed step 0, with nullable per-step
    completion timestamps and the deepest step reached.

    Spark-first plan: ONE shuffle (partition by user) + k chained
    per-user window aggregates — t_k = min(ts of step_k where ts >
    t_{k-1} and ts <= t0 + within) — then one tiny hash-agg to collapse
    to a row per user. No self-join per step (the naive k-way-join
    funnel shuffles k times), and — the round-2 hot-user hazard — no
    per-user collect_list: a user with millions of funnel events used
    to materialize one giant in-row array (un-spillable); window
    operators stream the partition through a spillable row buffer, so
    a pathological user costs disk, not an executor OOM."""
    if not steps:
        raise ValueError("steps must be non-empty")
    interval = F.expr(f"INTERVAL {within}")
    ev = events.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col), F.col(ts_col).alias("__ts"), F.col(type_col).alias("__et")
    )
    w = Window.partitionBy(user_col)
    # chained conditional mins: each step's window expression references
    # the previous step's column; same partitioning -> one shuffle, k
    # window passes over the (spillable) per-user buffer
    out = ev
    prev = None
    for k, step in enumerate(steps):
        col = f"step{k}_ts"
        if k == 0:
            expr = F.min(F.when(F.col("__et") == step, F.col("__ts"))).over(w)
        else:
            deadline = F.col("step0_ts") + interval
            expr = F.min(
                F.when(
                    (F.col("__et") == step)
                    & (F.col("__ts") > F.col(prev))
                    & (F.col("__ts") <= deadline),
                    F.col("__ts"),
                )
            ).over(w)
        out = out.withColumn(col, expr)
        prev = col
    # one row per user (step columns are per-user constants)
    per_user = out.groupBy(user_col).agg(
        *[F.first(f"step{k}_ts").alias(f"step{k}_ts") for k in range(len(steps))]
    )
    # deepest completed step: step k's ts is only set when step k-1
    # completed, so the deepest non-null wins (checked deepest-first)
    depth = F.lit(0)
    for k in range(len(steps)):
        depth = F.when(F.col(f"step{k}_ts").isNotNull(), F.lit(k + 1)).otherwise(depth)
    return (
        per_user.filter(F.col("step0_ts").isNotNull())
        .select(
            F.col(user_col),
            *[F.col(f"step{k}_ts") for k in range(len(steps))],
            depth.cast("int").alias("funnel_depth"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    period_days: int = 7,
    n_periods: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users are cohorted by the period (day-bucket of
    width `period_days`) of their first event; for each (cohort, period
    offset 0..n_periods-1) count how many of the cohort's users were
    active in that period.

    Plan: one groupBy(user) for first-event cohort, one
    distinct(user, period), one broadcast-friendly join back, one final
    groupBy — aggregates shrink the data before every shuffle, so at
    100 TB the heavy shuffles are over (user) and (user, period) pairs,
    never raw events."""
    day0 = F.lit("1970-01-01").cast("date")
    period = (F.datediff(F.col(ts_col).cast("date"), day0) / period_days).cast("bigint")
    firsts = (
        events.select(F.col(user_col), period.alias("__p"))
        .groupBy(user_col)
        .agg(F.min("__p").alias("cohort_p"))
    )
    active = events.select(F.col(user_col), period.alias("__p")).distinct()
    joined = active.join(firsts, on=user_col).withColumn(
        "period_offset", (F.col("__p") - F.col("cohort_p")).cast("int")
    )
    return (
        joined.filter(F.col("period_offset") < n_periods)
        .groupBy(F.col("cohort_p").alias("cohort"), "period_offset")
        .agg(F.countDistinct(user_col).alias("n_active_users"))
    )


def props_field_stats(
    events: DataFrame,
    field: str = "k",
    props_col: str = "props",
    type_col: str = "event_type",
) -> DataFrame:
    """Semi-structured property extraction + rollup: pull a numeric
    field out of the JSON `props_col` (the ubiquitous "event payload is
    a JSON string" shape) and aggregate it per event type.

    `get_json_object` is a native JVM expression — the JSON parse stays
    inside codegen, no Python, and unparseable/missing fields become
    NULL (skipped by the aggregates, counted separately). One keyed
    shuffle with map-side partial aggregation.

    `avg_field_micro` is BIGINT micro-units — ``(sum * 1e6) div count``
    by pure integer division — never a rounded real: a rounded DOUBLE
    (r3) and a DECIMAL(38,6) (r4) both serialize differently across
    engines even when every value compares equal, while integer
    division is bit-identical everywhere (VERDICT r4 item 1). NULL when
    the group has no parseable field."""
    k = F.get_json_object(F.col(props_col), f"$.{field}").cast("bigint")
    out = (
        events.select(F.col(type_col), k.alias("__k"))
        .groupBy(type_col)
        .agg(
            F.count("*").alias("n_events"),
            F.count("__k").alias("n_with_field"),
            F.sum("__k").alias("sum_field"),
        )
    )
    return out.withColumn(
        "avg_field_micro",
        F.expr(
            "CASE WHEN n_with_field > 0"
            " THEN sum_field * CAST(1000000 AS BIGINT) DIV n_with_field END"
        ),
    )


def value_quantiles(
    events: DataFrame,
    quantiles: tuple = (50, 90, 99),
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Exact discrete per-key percentiles of the (micro-quantized)
    value: for quantile q, the element at rank ceil(q/100 * n) in the
    per-key sort — the classic windowed-analytics shape the engine was
    missing. ``percentile_approx`` is a sketch (non-deterministic
    across engines, hash-unsafe); the discrete rank formula is exact
    integer selection, so DuckDB reproduces it bit-for-bit.

    Output: (key, n_events, p{q}_micro ...) — all BIGINT. Values are
    micro-quantized with the same round-half-away double path as the
    windowed sums; the value AT a rank is deterministic even under
    ties (equal values are interchangeable at the boundary).

    Scale design (100 TB): one shuffle on the key, one within-key sort
    (the window function); no global sort, no driver state. Skewed
    keys inherit AQE's skew handling like any windowed analytic."""
    micro = F.round(F.col(value_col).cast("double") * 1000000).cast("bigint")
    ranked = (
        events.select(F.col(key_col), micro.alias("__v"))
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy(key_col).orderBy("__v")),
        )
        .withColumn("__n", F.count("*").over(Window.partitionBy(key_col)))
    )
    aggs = [F.max("__n").cast("bigint").alias("n_events")]
    for q in quantiles:
        # rank = ceil(q/100 * n): integer arithmetic — (q*n + 99) DIV 100
        rank = F.expr(f"CAST(({q} * __n + 99) DIV 100 AS BIGINT)")
        aggs.append(
            F.max(F.when(F.col("__rn") == rank, F.col("__v")))
            .cast("bigint")
            .alias(f"p{q}_micro")
        )
    return ranked.groupBy(key_col).agg(*aggs)


def session_window_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Native session windows (`F.session_window`): events of one key
    merge into a session while each gap stays under `gap_minutes`; the
    aggregate is computed per merged session. This is Spark's own
    session-window state machine — in streaming mode it does true
    incremental session MERGING in the state store (two open sessions
    fuse when a bridging event arrives), which the lag()-based
    `sessionize` above cannot do incrementally.

    Identical code runs batch and streaming; the bounded runner turns
    the streaming form into hash-checkable output. Output timestamps
    are integer epoch-micros and the value sum is integer micro-units
    (COVERAGE.md hash discipline: no DOUBLE, no raw TIMESTAMP).

    Scale: one keyed shuffle; streaming state is O(open sessions), not
    O(events), and the watermark closes sessions for eviction."""
    micro = F.round(F.col("value") * 1000000).cast("bigint")
    # parquet timestamps may arrive as TIMESTAMP_NTZ; unix_micros needs
    # the instant type, and the cast is wall-clock-preserving under the
    # pinned UTC session timezone (same normalization as stream_parquet)
    ts = F.col(ts_col).cast("timestamp")
    return (
        events.groupBy(
            F.session_window(ts, f"{gap_minutes} minutes").alias("w"),
            F.col(user_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micro).alias("sum_value_micro"),
        )
        .select(
            F.col(user_col),
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "sum_value_micro",
        )
    )


def streaming_session_windows(
    spark,
    path: str,
    schema,
    gap_minutes: int = 30,
    watermark: str = "10 days",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """File-source streaming variant of `session_window_stats`: the
    real incremental session-merge path (readStream -> watermark ->
    session_window agg). Run with run_bounded(..., "complete") so every
    session is emitted regardless of where the watermark stops at
    end-of-stream."""
    from .bounded import stream_parquet

    stream = stream_parquet(spark, path, schema)
    return session_window_stats(
        stream.withWatermark(ts_col, watermark), gap_minutes, ts_col, user_col
    )


def type_pivot_counts(
    events: DataFrame,
    types: tuple = ("click", "error", "purchase", "signup", "view"),
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Wide per-user activity matrix: pivot `type_col` into one count
    column per type — the feature-engineering reshape every analytics
    store ships (`PIVOT` in SQL warehouses).

    The pivot values are EXPLICIT, and the reshape is hand-lowered to
    conditional counts rather than `.pivot()`: `.pivot(col)` without
    values runs a hidden distinct-collect job over the full input to
    discover them, and even WITH values Spark 4.1 plans pivotfirst as
    TWO shuffles (group by (user, type), then re-shuffle by user —
    measured in this repo, ADVICE r7 follow-up). The CASE-WHEN
    aggregate below is ONE shuffle on `user_col` whose map side
    already maintains the k partial counts — the plan you want at
    100 TB, locked by test_type_pivot_counts_matches_conditional_agg
    (exactly 1 Aggregate node, <=1 Exchange). Missing combinations
    are 0, not NULL (count of an all-NULL WHEN branch is 0), keeping
    every output column BIGINT-total."""
    return events.groupBy(user_col).agg(
        *[
            F.count(F.when(F.col(type_col) == t, F.lit(1)))
            .cast("bigint")
            .alias(f"n_{t}")
            for t in types
        ]
    )


def running_value_totals(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user running total of the (micro-quantized) value — the
    cumulative-window analytic (SUM ... ROWS UNBOUNDED PRECEDING).
    Ordering is (ts, event_id) so ties are deterministic on both
    engines; per-row quantization BEFORE the sum keeps the cumulative
    values exact integers (order-independent, hash-stable).

    Scale: one shuffle on the user key, one within-partition sort; the
    running sum streams through the sorted partition with O(1) state —
    no self-join, no collect_list."""
    micro = F.round(F.col("value") * 1000000).cast("bigint")
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        F.col(id_col),
        F.col(user_col),
        F.sum(micro).over(w).alias("running_value_micro"),
    )


def rollup_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Hierarchical totals via ROLLUP(key, hour): per-(key, hour) rows,
    per-key subtotals, and the grand total in one pass — Spark plans a
    single expand + hash aggregate (one shuffle), the warehouse-native
    way to get all three granularities without three scans.

    Grouping-null keys are COALESCEd to the sentinel '(all)' on both
    engines: the fixture keys are never NULL, and a string sentinel
    keeps the driver hash away from NULL-vs-NaN representation
    differences. All measures BIGINT (COVERAGE.md discipline)."""
    hour = F.date_format(F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:mm:ss")
    micro = F.round(F.col("value").cast("double") * 1000000).cast("bigint")
    return (
        events.select(F.col(key_col), hour.alias("__h"), micro.alias("__v"))
        .rollup(key_col, "__h")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("__v").cast("bigint").alias("sum_value_micro"),
        )
        .select(
            F.coalesce(F.col(key_col), F.lit("(all)")).alias(key_col),
            F.coalesce(F.col("__h"), F.lit("(all)")).alias("bucket"),
            "n_events",
            "sum_value_micro",
        )
    )
