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


def funnel(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion (E-5f): for each user, how far along
    the ``steps`` sequence they progressed, where step k+1 counts only
    if it happens AT OR AFTER the user's earliest completion of step k
    (the product-analytics funnel, strictly ordered — a purchase
    before the signup does not convert).

    Plan: ONE groupBy(user) collecting, per step type, the sorted
    in-step timestamp array (bounded by the user's event count — the
    same bound the raw data imposes), then the ordered walk is a pure
    projection: t_1 = min(step-1 times); t_{k+1} = first step-(k+1)
    time ≥ t_k (``F.filter`` over the sorted array). Output: one row
    per funnel step — (step, step_name, n_users, conversion) with
    conversion = n_users / users-entering-step-1, rounded 6dp. The
    final unpivot is a literal-sized explode; everything before it is
    one exchange.
    """
    if not steps or len(set(steps)) != len(steps):
        raise ValueError(f"steps must be non-empty and unique, got {steps}")
    arrays = events.where(F.col(type_col).isin(list(steps))).groupBy(
        user_col
    ).agg(
        *[
            F.sort_array(
                F.collect_list(
                    F.when(F.col(type_col) == s, F.col(ts_col))
                )
            ).alias(f"_t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # ordered walk: reached_k is the timestamp of the user's step-k
    # completion under the ordering constraint, NULL once broken
    # try_element_at, not element_at: under ANSI mode (Spark 4
    # default) element_at THROWS on an empty array — a user who never
    # performed a step must walk to NULL, not crash the job
    reached = F.try_element_at(F.col("_t0"), F.lit(1))
    cols = [reached.alias("_r0")]
    for i in range(1, len(steps)):
        nxt = F.try_element_at(
            F.filter(
                F.col(f"_t{i}"), lambda x: x >= F.col(f"_r{i - 1}")
            ),
            F.lit(1),
        )
        cols.append(nxt.alias(f"_r{i}"))
    walked = arrays
    for i, c in enumerate(cols):
        walked = walked.withColumn(f"_r{i}", c)
    counts = walked.agg(
        *[
            F.count(F.col(f"_r{i}")).cast("bigint").alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    per_step = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step"),
                        F.lit(s).alias("step_name"),
                        F.col(f"_n{i}").alias("n_users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("x")
    ).select("x.step", "x.step_name", "x.n_users")
    base = per_step.where(F.col("step") == 1).select(
        F.col("n_users").alias("_base")
    )
    return per_step.crossJoin(F.broadcast(base)).select(
        "step",
        "step_name",
        "n_users",
        F.round(
            F.col("n_users") / F.greatest(F.col("_base"), F.lit(1)).cast("double"),
            6,
        ).alias("conversion"),
    )
