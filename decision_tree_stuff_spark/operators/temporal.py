"""Temporal joins over event streams: as-of join and bucketed
interval (range) join.

Neither exists as a native DataFrame join in OSS Spark, and both are
staples of feature engineering over event logs (attach the latest
known state to each fact; attach each point-in-time fact to the
interval that contains it). Both are implemented as compositions of
built-in operators — no UDFs, no driver loops — with the published
distributed shapes:

* ``asof_join``: the union + ordered-window formulation (what
  pandas-on-Spark ``merge_asof`` plans): tag both sides, union,
  one window per key ordered by (ts, side) carrying the right-side
  payload forward with ``last(ignorenulls)``, keep left rows. ONE
  shuffle on the key — never a per-row range probe, never an
  inequality join. Skewed keys cost what any per-key window costs;
  salt upstream if one key dominates.
* ``interval_join``: equi-join on (keys + time bucket) with the
  interval exploded onto the buckets it covers (``sequence`` →
  ``explode``) and the exact containment predicate as a residual
  filter. This is the standard rewrite that turns an
  unbounded-inequality join (cartesian per key in vanilla Spark)
  into a bounded equi-shuffle; each (point, interval) pair meets in
  exactly one bucket — the point's — so no post-join dedup is
  needed. Pick ``bucket_seconds`` near the typical interval length:
  fan-out per interval row is ceil(len/bucket)+1.

Streaming: ``interval_join`` runs unchanged with the points side
streaming (the bucket column is a projection; the join a plain
stream-static inner equi-join) — stream≡batch pinned in
tests/test_temporal.py. ``asof_join`` has no streaming form here: its
per-key ordered window is not plannable on an unbounded stream (an
``applyInPandasWithState`` ordering would be the stateful route if
ever needed).

Reference scope: beyond the reference (no temporal joins in the
643-LoC tree library); included per the training-data-pipeline
extension mandate (as-of/range joins are the named examples of
operators Spark lacks natively).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import TimestampNTZType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: List[str],
    ts_col: str = "ts",
    value_cols: Optional[List[str]] = None,
    allow_exact_match: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right.ts <= left.ts`` (strict ``<`` when
    ``allow_exact_match=False``) sharing ``keys`` — a LEFT as-of
    join: left rows with no prior right row keep nulls.

    ``value_cols`` (default: every right column except keys+ts) are
    appended to the left schema with ``suffix``; the matched right
    timestamp itself is appended as ``{ts_col}{suffix}``. If several
    right rows share (keys, ts), the one with the greatest
    ``struct(value_cols)`` wins — deterministic, engine-portable
    (the DuckDB twin reproduces it with an ``arg_max`` pre-dedup).

    Plan: right is pre-deduped per (keys, ts) (one map-side-combined
    aggregate), both sides are unioned with a side tag, and one
    window per ``keys`` ordered by (ts, side) carries the right
    payload forward. Exactly one shuffle keyed by ``keys`` — the
    window and the union both reuse it.

    Nulls: right rows with null ``ts`` are dropped (unorderable in
    event time — they would otherwise rank older-than-everything);
    left rows with null ``ts`` are kept and match nothing.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, ts_col)]
    out_cols = {c: f"{c}{suffix}" for c in (*value_cols, ts_col)}
    clash = [c for c in out_cols.values() if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join output columns {clash} already exist on the left "
            f"frame — pass a different suffix"
        )

    # null-ts right rows are unorderable in event time; without this
    # filter they sort NULLS FIRST and would be carried forward as an
    # older-than-everything match for every left row
    right = right.where(F.col(ts_col).isNotNull())
    # deterministic per-(keys, ts) winner; also shrinks the union input
    if value_cols:
        r = right.groupBy(*keys, ts_col).agg(
            F.max(F.struct(*value_cols)).alias("__w")
        ).select(
            *keys,
            F.col(ts_col),
            *[F.col(f"__w.{c}").alias(out_cols[c]) for c in value_cols],
        ).withColumn(out_cols[ts_col], F.col(ts_col))
    else:  # timestamp-only right side: the match time IS the payload
        r = right.select(*keys, ts_col).distinct().withColumn(
            out_cols[ts_col], F.col(ts_col)
        )

    # side tag orders right rows before left at equal ts when exact
    # matches are admitted, after them when they are not
    left_seq = 1 if allow_exact_match else 0
    l_tagged = left.withColumn("__seq", F.lit(left_seq)).select(
        *left.columns,
        "__seq",
        *[F.lit(None).cast(r.schema[o].dataType).alias(o)
          for o in out_cols.values()],
    )
    r_tagged = r.select(
        *[
            F.col(c) if c in (*keys, ts_col) else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in left.columns
        ],
        F.lit(1 - left_seq).alias("__seq"),
        *[F.col(o) for o in out_cols.values()],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *left.columns,
        "__seq",
        *[F.last(o, ignorenulls=True).over(w).alias(o)
          for o in out_cols.values()],
    )
    return filled.where(F.col("__seq") == left_seq).drop("__seq")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: Optional[List[str]] = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Join every point-in-time row to every interval row with
    ``start <= point < end`` (half-open), optionally also matching on
    equi ``keys``. Returns points.* + intervals.* (column names must
    be disjoint).

    Plan: each interval row explodes onto the ``bucket_seconds``-wide
    epoch buckets it covers; points carry their single bucket; the
    join is a plain equi-join on (keys + bucket) with the exact
    containment predicate as a residual. A (point, interval) pair can
    only meet in the point's bucket, so the rewrite is
    duplicate-free by construction. Without this rewrite Spark plans
    an inequality join as a (broadcast) nested loop — cartesian per
    key — which is the thing that does not survive 100 TB; with it
    the shuffle is bounded by Σ ceil(interval_len/bucket)+1 rows.

    Nulls: rows with a null point timestamp or null interval bound
    get a null bucket key, never equi-match, and drop out (inner-join
    semantics).
    """
    keys = keys or []
    clash = set(points.columns) & set(intervals.columns) - set(keys)
    if clash:
        raise ValueError(
            f"interval_join requires disjoint column names; both sides "
            f"carry {sorted(clash)}"
        )
    def epoch_sec(df: DataFrame, col_name: str):
        # unix_micros rejects TIMESTAMP_NTZ; a tz-free diff from the
        # NTZ epoch keeps the bucketing independent of the session
        # timezone. Second granularity is enough: bucketing only needs
        # point_bucket ∈ [start_bucket, end_bucket] for a true pair,
        # which start ≤ point ≤ end preserves under any monotone
        # truncation applied to all three.
        if isinstance(df.schema[col_name].dataType, TimestampNTZType):
            return F.expr(
                "timestampdiff(SECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col_name}`)"
            )
        return F.floor(F.unix_micros(F.col(col_name)) / 1_000_000)

    bucket = F.lit(int(bucket_seconds))
    p = points.withColumn("__bkt", F.floor(epoch_sec(points, point_ts) / bucket))
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(epoch_sec(intervals, start_ts) / bucket),
                # end is exclusive, but generating its bucket anyway
                # costs at most one extra row per interval and keeps
                # the arithmetic truncation-safe
                F.floor(epoch_sec(intervals, end_ts) / bucket),
            )
        ),
    )
    # alias both sides: points and intervals commonly derive from the
    # SAME source frame (e.g. events joined to their own sessions) and
    # unqualified references would be rejected as an ambiguous
    # self-join
    p, iv = p.alias("__dts_p"), iv.alias("__dts_iv")

    def pc(c):
        return F.col(f"__dts_p.`{c}`")

    def ic(c):
        return F.col(f"__dts_iv.`{c}`")

    cond = [pc("__bkt") == ic("__bkt")]
    for k in keys:
        cond.append(pc(k) == ic(k))
    cond.append(pc(point_ts) >= ic(start_ts))
    cond.append(pc(point_ts) < ic(end_ts))
    joined = p.join(iv, cond)
    return joined.select(
        *[pc(c).alias(c) for c in points.columns],
        *[ic(c).alias(c) for c in intervals.columns if c not in keys],
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union-of-intervals coverage per key (E-10c, the gaps-and-
    islands program): merge overlapping/touching [start, end]
    intervals into islands and report, per key, how many islands
    remain and how much of the axis they cover — "total active
    seconds per user from overlapping session spans", the temporal
    complement of the as-of/interval joins above.

    Contract: ``start_col``/``end_col`` are NUMERIC (e.g. epoch
    micros as BIGINT — the caller converts timestamps; integer axes
    keep every intermediate exact and engine-portable) with
    end >= start. Touching intervals (next.start == prev.end) merge:
    an island BREAKS only when start > max(all previous ends).

    Shape: one per-key window pass (ordered cumulative max of end,
    1-row lag; then a cumulative sum of break flags = island id) +
    one groupBy — the standard two-window islands plan. Windows are
    partitioned BY KEY, so there is no single-task global sort; a
    pathological key holding a whole corpus's intervals would
    serialize that key only (same caveat, and same mitigation story,
    as sessionization).

    Determinism: island MEMBERSHIP is order-independent under the
    (start, end, …) ordering — equal-start rows always land in the
    same island whichever of them the window visits first (the
    earlier one's end is >= the shared start, so the later one can
    never open a new island) — and the outputs are integer
    count/sum aggregates of it.
    """
    base = df.select(
        F.col(key_col),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
    )
    w = Window.partitionBy(key_col).orderBy("__s", "__e")
    prev_max_end = F.max(F.col("__e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "__ni",
        F.when(
            prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1
        ).otherwise(0),
    )
    w2 = Window.partitionBy(key_col).orderBy("__s", "__e").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = flagged.withColumn("__iid", F.sum("__ni").over(w2))
    g = islands.groupBy(key_col, "__iid").agg(
        F.min("__s").alias("__is"), F.max("__e").alias("__ie")
    )
    return g.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("__ie") - F.col("__is")).alias("covered"),
    )
