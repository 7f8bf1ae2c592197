"""Event-time operators (E-5/E-10): tumbling/sliding/session windows, funnel, as-of & interval joins, coverage.

Split out of the monolithic queries.py (r9); function and
oracle text moved verbatim — see queries/__init__.py for
the registry.
"""

from __future__ import annotations

from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    F,
    _events,
    _read_parquet,
    sessionize,
    sliding_counts,
    tumbling_counts,
)



def q_e5_sliding_counts(spark, sf_dir):
    return sliding_counts(_events(spark, sf_dir))


def q_e5_funnel(spark, sf_dir):
    """Ordered funnel conversion (r7): signup -> click -> purchase,
    step k+1 counted only at-or-after the user's earliest step-k
    completion — one groupBy + a pure-projection ordered walk."""
    from decision_tree_stuff_spark.operators.sessionize import funnel

    return funnel(_events(spark, sf_dir), ["signup", "click", "purchase"])


def q_e5_tumbling_counts(spark, sf_dir):
    return tumbling_counts(_events(spark, sf_dir))


def q_e5_sessions(spark, sf_dir):
    return sessionize(_events(spark, sf_dir))


def q_e5b_session_assignment(spark, sf_dir):
    """Composition row (E-5 × E-10): label every event with its
    session by joining the events stream of facts to the sessionize
    output's half-open windows via the generic bucketed interval join
    — the shape used to attach late-arriving facts to sessions. Each
    event lands in exactly one session window by construction."""
    from decision_tree_stuff_spark.operators.temporal import interval_join

    ev = _events(spark, sf_dir)
    sessions = sessionize(ev, include_window=True).select(
        "user_id", "session_start", "w_start", "w_end"
    )
    out = interval_join(
        ev.select("event_id", "user_id", "ts"),
        sessions,
        "ts",
        "w_start",
        "w_end",
        keys=["user_id"],
        bucket_seconds=3600,
    )
    return out.select("event_id", "user_id", "session_start")


def q_e10c_interval_coverage(spark, sf_dir):
    """Union-of-intervals coverage per user (r7, E-10c gaps-and-
    islands): merge each user's overlapping [ts, ts + value·1s]
    activity spans and report islands + covered micros — 'total
    active time' from raw overlapping spans. Integer micro axes keep
    every intermediate exact; windows are per-key (no single-task
    sort)."""
    from decision_tree_stuff_spark.operators.temporal import (
        interval_coverage,
    )

    ev = _events(spark, sf_dir)
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.round(F.col("value") * 1000000.0, 0).cast("bigint")
        ).alias("e"),
    )
    return interval_coverage(iv, "user_id", "s", "e")




def q_e10_asof_join(spark, sf_dir):
    """As-of join (E-10): attach to every purchase event the latest
    click value the same user produced at or before it — the
    point-in-time feature-attachment shape Spark lacks natively,
    planned as union + ordered window (ONE shuffle on the key, no
    inequality join). Left semantics: purchases with no prior click
    keep nulls. DuckDB twin: native ASOF LEFT JOIN over the same
    max-deduped click side."""
    from decision_tree_stuff_spark.operators.temporal import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.where("event_type = 'purchase'").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where("event_type = 'click'").select("user_id", "ts", "value")
    out = asof_join(
        purchases, clicks, keys=["user_id"], ts_col="ts",
        value_cols=["value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 6).alias("purchase_value"),
        F.round("value_asof", 6).alias("last_click_value"),
        F.unix_micros("ts_asof").alias("last_click_ts_us"),
    )


def q_e10b_interval_join(spark, sf_dir):
    """Bucketed range join (E-10): orders in their 7-day fulfillment
    window counted per calendar day — each interval explodes onto the
    day buckets it covers and meets the day rows on a plain equi-join
    with the exact containment predicate as a residual (the rewrite
    that keeps an inequality join off the nested-loop path at scale).
    Both sides derive from the same frame, exercising the self-join
    aliasing."""
    from decision_tree_stuff_spark.operators.temporal import interval_join

    orders = _read_parquet(spark, f"{sf_dir}/orders.parquet")
    # truncate through DATE, not date_trunc: o_orderdate is
    # TIMESTAMP_NTZ and date_trunc would cast it to LTZ, making the
    # day boundary (and the whole result) session-timezone-dependent
    # — caught by the Asia/Kolkata parity sweep (round 5). DATE is
    # timezone-free; casting back to TIMESTAMP_NTZ keeps the join
    # arithmetic NTZ end-to-end, matching the DuckDB twin exactly.
    days = orders.select(
        F.col("o_orderdate").cast("date").cast("timestamp_ntz").alias("day")
    ).distinct()
    windows = orders.select(
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("w_end"),
    )
    j = interval_join(
        days, windows, "day", "w_start", "w_end", bucket_seconds=86400
    )
    return j.groupBy("day").agg(F.count(F.lit(1)).alias("n_open")).select(
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', day)"
        ).alias("day_epoch"),
        "n_open",
    )

ORACLE_SQL: Dict[str, str] = {
    "e5_sliding_counts": """
WITH ev AS (
  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, value FROM events
),
x AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) - 3600 * o.o AS window_start,
         value
  FROM ev CROSS JOIN (SELECT unnest([0, 1]) AS o) o
)
SELECT window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM x GROUP BY 1
""",
    # r7 ordered funnel: per-user sorted step-time arrays, chained
    # first-at-or-after walk; [1] on an empty DuckDB list is NULL =
    # Spark's non-ansi element_at(_, 1)
    "e5_funnel": """
WITH arrays AS (
  SELECT user_id,
    list_sort(list_filter(list(CASE WHEN event_type = 'signup' THEN ts END),
                          x -> x IS NOT NULL)) AS a0,
    list_sort(list_filter(list(CASE WHEN event_type = 'click' THEN ts END),
                          x -> x IS NOT NULL)) AS a1,
    list_sort(list_filter(list(CASE WHEN event_type = 'purchase' THEN ts END),
                          x -> x IS NOT NULL)) AS a2
  FROM events WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY 1
),
w0 AS MATERIALIZED (SELECT *, a0[1] AS r0 FROM arrays),
w1 AS (SELECT *, (list_filter(a1, x -> x >= r0))[1] AS r1 FROM w0),
w2 AS (SELECT *, (list_filter(a2, x -> x >= r1))[1] AS r2 FROM w1),
counts AS (
  SELECT CAST(count(r0) AS BIGINT) AS n0,
         CAST(count(r1) AS BIGINT) AS n1,
         CAST(count(r2) AS BIGINT) AS n2
  FROM w2
),
per_step AS (
  SELECT 1 AS step, 'signup' AS step_name, n0 AS n_users FROM counts
  UNION ALL
  SELECT 2, 'click', n1 FROM counts
  UNION ALL
  SELECT 3, 'purchase', n2 FROM counts
)
SELECT step, step_name, n_users,
       round(n_users / CAST(greatest((SELECT n0 FROM counts), 1) AS DOUBLE),
             6) AS conversion
FROM per_step
""",
    "e5_tumbling_counts": """
WITH ev AS (
  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value FROM events
)
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM ev GROUP BY 1, 2
""",
    "e5_sessions": """
WITH ev AS (
  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value FROM events
),
o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(new_s) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid
""",
}

ORACLE_SQL["e5b_session_assignment"] = """
WITH ev AS (
  SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts
  FROM events
),
o AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(new_s) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT event_id, user_id,
       CAST(floor(epoch(min(ts) OVER (PARTITION BY user_id, sid)))
            AS BIGINT) AS session_start
FROM s
"""

ORACLE_SQL["e10_asof_join"] = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
), c AS (
  -- max(value) per (user, ts) mirrors asof_join's deterministic
  -- max-struct dedup of ties on the right side
  SELECT user_id, ts, max(value) AS value FROM events
  WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       round(p.value, 6) AS purchase_value,
       round(c.value, 6) AS last_click_value,
       epoch_us(c.ts) AS last_click_ts_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""

ORACLE_SQL["e10c_interval_coverage"] = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(value * 1000000.0) AS BIGINT) AS e
  FROM events
),
o AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pme
  FROM iv
),
fl AS (
  SELECT user_id, s, e,
         CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni
  FROM o
),
isl AS (
  SELECT user_id, s, e,
         sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS iid
  FROM fl
),
g AS (
  SELECT user_id, iid, min(s) AS i_s, max(e) AS i_e
  FROM isl GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_islands,
       CAST(sum(i_e - i_s) AS BIGINT) AS covered
FROM g GROUP BY 1
"""

ORACLE_SQL["e10b_interval_join"] = """
WITH days AS (
  SELECT DISTINCT date_trunc('day', o_orderdate) AS d FROM orders
), iv AS (
  SELECT o_orderdate AS s, o_orderdate + INTERVAL 7 DAY AS e FROM orders
)
SELECT epoch(d)::BIGINT AS day_epoch, count(*) AS n_open
FROM days JOIN iv ON d >= s AND d < e
GROUP BY day_epoch
"""
