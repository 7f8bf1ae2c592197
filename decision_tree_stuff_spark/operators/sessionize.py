"""Event-time windowing over the ``events`` table (E-5).

Batch-first implementations with exact ANSI-SQL twins; the streaming
variants (watermark + ``readStream``) live in
``decision_tree_stuff_spark.streaming``.

Window starts are returned as epoch seconds (BIGINT) — timestamp
objects differ in physical precision between Spark (µs) and DuckDB
(ns), epoch integers do not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
) -> DataFrame:
    """Tumbling-window event counts + value sums.

    ``F.window`` (not date_trunc) so the same code path generalizes to
    sliding windows and to the streaming variant; for whole-hour
    windows the result equals the oracle's ``date_trunc('hour', ts)``.
    One shuffle on the window key; partial aggregation map-side.
    Returns (window_start BIGINT epoch-sec, event_type, n_events,
    sum_value)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), duration).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """Sliding-window counts: each event lands in duration/slide
    overlapping windows (``F.window`` with a slide). Oracle twin:
    unnest the per-event list of window starts (truncate to the slide
    grain, subtract 0..duration/slide-1 slides) and aggregate.
    Returns (window_start BIGINT epoch-sec, n_events, sum_value)."""
    return (
        events.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    include_window: bool = False,
) -> DataFrame:
    """Session windows per user with the given inactivity gap.

    Uses Spark's native ``session_window`` — state-store-ready for the
    streaming variant, single shuffle on the user key in batch. A new
    session starts when ts ≥ previous ts + gap (the oracle's
    gap-and-islands formulation uses the same ≥).

    Returns (user_id, session_start BIGINT epoch-sec, n_events,
    sum_value rounded 6dp). With ``include_window=True`` the raw
    TIMESTAMP bounds are appended as (w_start, w_end) — w_end = last
    event + gap, the half-open horizon — so the sessions frame can
    feed ``temporal.interval_join`` (e.g. assigning late-arriving
    facts to sessions)."""
    extra = (
        [F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end")]
        if include_window
        else []
    )
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
            *extra,
        )
    )
