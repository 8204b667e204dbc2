"""Event-time window operators over the `events` feed (X6/X7/X8).

The reference simulates streaming with scheduled batch + watermark metadata
(/root/reference/metadata.py:150-191, 244-341); these are the native
Structured Streaming counterparts it lacks (SURVEY.md §2.H "not present").
Every function here is a pure DataFrame→DataFrame transformation, valid on
both batch and streaming inputs — attach `withWatermark` upstream for the
streaming case (structured.py does).

Scale notes:
- window aggs shuffle once on (window, key); partial aggregation happens
  map-side, so per-window cardinality (not event count) sizes the shuffle;
- the as-of join is the union-window form: ONE shuffle by user_id and a
  linear scan per partition — never the naive range cross-join, whose
  intermediate explodes quadratically on hot keys;
- approx_count_distinct keeps HLL sketches (~ KB/window) instead of
  per-user dedup state, the only viable form at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _window_cols(win: Column) -> list[Column]:
    return [
        win.start.alias("window_start"),
        win.end.alias("window_end"),
    ]


def tumbling_agg(
    events: DataFrame,
    size: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Fixed non-overlapping windows: count + sum(value) per (window, key)."""
    win = F.window(F.col(ts_col), size)
    return (
        events.groupBy(win, F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(*_window_cols(F.col("window")), key_col, "n_events", "total_value")
    )


def sliding_agg(
    events: DataFrame,
    size: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Overlapping windows (each event lands in size/slide windows)."""
    win = F.window(F.col(ts_col), size, slide)
    return (
        events.groupBy(win, F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(*_window_cols(F.col("window")), key_col, "n_events", "total_value")
    )


def session_agg(
    events: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based session windows per key: a session extends while successive
    events arrive within `gap`; window end = last event + gap (exclusive)."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(win, F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def as_of_join(
    probes: DataFrame,
    quotes: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    probe_id: str = "event_id",
    quote_id: str = "event_id",
) -> DataFrame:
    """For each probe row, the latest quote row with quote.ts <= probe.ts on
    the same key (ties: quote at the identical timestamp matches).

    Union-window form: tag both sides, sort each user's rows once by
    (ts, side) with quotes first at equal ts, and carry the last-seen quote
    forward with `last(..., ignorenulls)`. One shuffle on the key, linear
    per-partition work — the scalable shape (a range-join would rescan every
    earlier quote per probe).
    """
    q = quotes.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.lit(0).alias("side"),
        F.col(quote_id).alias("quote_event_id"),
        F.col(ts_col).alias("quote_ts"),
        F.lit(None).cast("long").alias("probe_event_id"),
    )
    p = probes.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("quote_event_id"),
        F.lit(None).cast("timestamp").alias("quote_ts"),
        F.col(probe_id).alias("probe_event_id"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side", "quote_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        q.unionByName(p)
        .select(
            "*",
            F.last("quote_event_id", ignorenulls=True).over(w).alias("asof_quote_id"),
            F.last("quote_ts", ignorenulls=True).over(w).alias("asof_quote_ts"),
        )
        .filter(F.col("side") == 1)
        .select(
            F.col("probe_event_id").alias("probe_id"),
            F.col("k").alias(key_col),
            F.col("t").alias("probe_ts"),
            F.col("asof_quote_id").alias("quote_id"),
            F.col("asof_quote_ts").alias("quote_ts"),
            (
                F.col("t").cast("long") - F.col("asof_quote_ts").cast("long")
            ).alias("lag_seconds"),
        )
    )


def windowed_distinct_users(
    events: DataFrame,
    size: str = "1 day",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Exact distinct users per tumbling window (the small-scale oracle twin
    of `windowed_approx_distinct`). Exact distinct shuffles every (window,
    user) pair — fine at test SF, the thing to avoid at 100 TB."""
    win = F.window(F.col(ts_col), size)
    return (
        events.groupBy(win)
        .agg(F.count_distinct(F.col(user_col)).alias("distinct_users"))
        .select(*_window_cols(F.col("window")), "distinct_users")
    )


def windowed_approx_distinct(
    events: DataFrame,
    size: str = "1 day",
    ts_col: str = "ts",
    user_col: str = "user_id",
    rsd: float = 0.02,
) -> DataFrame:
    """Approximate distinct users per tumbling window via HyperLogLog++
    (X8). Constant state per window regardless of user cardinality — the
    100 TB form of `windowed_distinct_users`."""
    win = F.window(F.col(ts_col), size)
    return (
        events.groupBy(win)
        .agg(
            F.approx_count_distinct(F.col(user_col), rsd).alias("approx_users")
        )
        .select(*_window_cols(F.col("window")), "approx_users")
    )


def range_join(
    probes: DataFrame,
    quotes: DataFrame,
    max_lag: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    probe_id: str = "event_id",
    quote_id: str = "event_id",
) -> DataFrame:
    """All quote rows within (probe.ts − max_lag, probe.ts] per key — the
    bounded-interval sibling of `as_of_join` (every match, not just the
    latest).

    A naive `a.ts BETWEEN b.ts - lag AND b.ts` predicate gives Catalyst no
    equi-key and degenerates to a nested-loop join. Bucketing both sides
    into `max_lag`-sized time buckets restores an equi-join: a probe can
    only match quotes in its own or the previous bucket, so each probe
    explodes to 2 bucket keys, the join runs as a hash join on
    (key, bucket), and the exact range predicate filters after. Join
    traffic is O(rows × 2) instead of O(pairs).
    """
    lag_expr = F.expr(f"INTERVAL {max_lag}")
    # interval length in seconds = (epoch 0 + interval) as double
    lag_sec = (F.lit(0).cast("timestamp") + lag_expr).cast("double")

    def bucket(c: str) -> Column:
        return F.floor(F.col(c).cast("double") / lag_sec)

    q = quotes.select(
        F.col(key_col).alias("k"),
        F.col(quote_id).alias("quote_id"),
        F.col(ts_col).alias("quote_ts"),
        bucket(ts_col).alias("bkt"),
    )
    p = probes.select(
        F.col(key_col).alias("k"),
        F.col(probe_id).alias("probe_id"),
        F.col(ts_col).alias("probe_ts"),
        F.explode(
            F.array(bucket(ts_col), bucket(ts_col) - 1)
        ).alias("bkt"),
    )
    return (
        p.join(q, ["k", "bkt"])
        .filter(
            (F.col("quote_ts") <= F.col("probe_ts"))
            & (F.col("quote_ts") > F.col("probe_ts") - lag_expr)
        )
        .select(
            "probe_id",
            F.col("k").alias(key_col),
            "probe_ts",
            "quote_id",
            "quote_ts",
        )
        .dropDuplicates(["probe_id", "quote_id"])
    )


def stream_stream_interval_join(
    probes: DataFrame,
    quotes: DataFrame,
    max_lag: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    probe_id: str = "event_id",
    quote_id: str = "event_id",
) -> DataFrame:
    """Streaming-native form of `range_join`: a genuine stream-stream inner
    join with an equi-key plus an event-time interval condition.

    Structured Streaming requires watermarks on BOTH inputs (callers attach
    them — read_event_stream does) and a time-range join condition; the
    engine derives the state-retention horizon from them, so each side
    buffers only `watermark + max_lag` of history per key instead of the
    whole stream. Batch frames run through the identical plan (Spark
    compiles the same condition as a regular join), which is what the
    batch-parity test pins.

    Same output contract as `range_join`: every quote in
    (probe.ts − max_lag, probe.ts] per key.
    """
    q = quotes.select(
        F.col(key_col).alias("k"),
        F.col(quote_id).alias("quote_id"),
        F.col(ts_col).alias("quote_ts"),
    )
    p = probes.select(
        F.col(key_col).alias("user_id"),
        F.col(probe_id).alias("probe_id"),
        F.col(ts_col).alias("probe_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("k"))
        & (F.col("quote_ts") <= F.col("probe_ts"))
        & (F.col("quote_ts") > F.col("probe_ts") - F.expr(f"INTERVAL {max_lag}"))
    )
    return p.join(q, cond, "inner").select(
        "probe_id", "user_id", "probe_ts", "quote_id", "quote_ts"
    )


def stream_dedup(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact dedup (X2's streaming form): keep the first arrival
    per key across micro-batches.

    `dropDuplicatesWithinWatermark` bounds the dedup state to the watermark
    horizon — the 100 TB-stream answer, since plain `dropDuplicates` on a
    stream keeps every key ever seen in the state store forever. Requires a
    watermark on the input (read_event_stream attaches one).
    """
    if within_watermark:
        return events.dropDuplicatesWithinWatermark(list(keys))
    return events.dropDuplicates(list(keys))
