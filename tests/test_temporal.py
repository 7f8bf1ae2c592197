"""Temporal-join semantics (operators/temporal.py): hand-built cases
pin the as-of contract (latest at-or-before, exact-match toggle,
deterministic tie dedup, left-null semantics) and the interval-join
contract (half-open containment, bucket-width invariance, key
matching); the corpus-level paths are value-checked against DuckDB
(native ASOF JOIN / inequality join) via test_oracle_parity
(e10_asof_join, e10b_interval_join)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.temporal import (
    asof_join,
    interval_join,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts(0), 10.0),
            (1, _ts(10), 20.0),
            (2, _ts(5), 50.0),
        ],
        "k bigint, ts timestamp, px double",
    )


@pytest.fixture
def trades(spark):
    return spark.createDataFrame(
        [
            (100, 1, _ts(0)),   # exactly at the first quote
            (101, 1, _ts(9)),   # between quotes
            (102, 1, _ts(15)),  # after the last quote
            (103, 2, _ts(1)),   # BEFORE any quote for k=2
            (104, 3, _ts(5)),   # key with no quotes at all
        ],
        "tid bigint, k bigint, ts timestamp",
    )


def test_asof_latest_at_or_before(spark, trades, quotes):
    out = {
        r.tid: r.px_asof
        for r in asof_join(trades, quotes, keys=["k"], ts_col="ts").collect()
    }
    assert out == {100: 10.0, 101: 10.0, 102: 20.0, 103: None, 104: None}


def test_asof_strict_before_excludes_exact(spark, trades, quotes):
    out = {
        r.tid: r.px_asof
        for r in asof_join(
            trades, quotes, keys=["k"], ts_col="ts", allow_exact_match=False
        ).collect()
    }
    # trade 100 sits exactly on the quote timestamp — excluded now
    assert out[100] is None and out[101] == 10.0 and out[102] == 20.0


def test_asof_tie_dedup_is_deterministic_max(spark, trades):
    dup = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(0), 30.0)],
        "k bigint, ts timestamp, px double",
    )
    out = {
        r.tid: r.px_asof
        for r in asof_join(trades, dup, keys=["k"], ts_col="ts").collect()
    }
    assert out[100] == 30.0  # max-struct winner, not arrival order


def test_asof_attaches_matched_timestamp_and_preserves_left(
    spark, trades, quotes
):
    out = asof_join(trades, quotes, keys=["k"], ts_col="ts")
    assert set(out.columns) == {"tid", "k", "ts", "px_asof", "ts_asof"}
    assert out.count() == trades.count()
    r = {x.tid: x for x in out.collect()}
    assert r[102].ts_asof == _ts(10)


def test_asof_refuses_clashing_output_columns(spark, trades, quotes):
    with pytest.raises(ValueError, match="suffix"):
        asof_join(
            trades.withColumn("px_asof", F.lit(0.0)),
            quotes,
            keys=["k"],
            ts_col="ts",
        )


def test_interval_join_half_open_and_bucket_invariant(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(5)), (3, _ts(10)), (4, _ts(59))],
        "pid bigint, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(10, _ts(0), _ts(10)), (11, _ts(5), _ts(59))],
        "ivid bigint, s timestamp, e timestamp",
    )
    want = {(1, 10), (2, 10), (2, 11), (3, 11), (4, None)} - {(4, None)}
    for w in (60, 300, 3600):
        got = {
            (r.pid, r.ivid)
            for r in interval_join(
                points, ivs, "ts", "s", "e", bucket_seconds=w
            ).collect()
        }
        # point 3 at the exclusive end of iv 10 must NOT match it;
        # point 4 at the exclusive end of iv 11 matches nothing
        assert got == want, f"bucket_seconds={w}"


def test_interval_join_with_equi_keys(spark):
    points = spark.createDataFrame(
        [(1, 7, _ts(5)), (2, 8, _ts(5))], "pid bigint, k bigint, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(10, 7, _ts(0), _ts(10))],
        "ivid bigint, k bigint, s timestamp, e timestamp",
    )
    got = {
        (r.pid, r.ivid)
        for r in interval_join(
            points, ivs, "ts", "s", "e", keys=["k"]
        ).collect()
    }
    assert got == {(1, 10)}  # k=8 point excluded despite containment


def test_interval_join_refuses_column_clash(spark):
    df = spark.createDataFrame([(1, _ts(0), _ts(5))], "x bigint, s timestamp, e timestamp")
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(df, df, "s", "s", "e")


def test_asof_null_timestamps(spark, quotes):
    """Null-ts right rows are dropped (they would otherwise rank
    older-than-everything and poison the carry-forward); null-ts left
    rows survive and match nothing."""
    trades = spark.createDataFrame(
        [(200, 1, _ts(9)), (201, 1, None)],
        "tid bigint, k bigint, ts timestamp",
    )
    dirty = quotes.union(
        spark.createDataFrame(
            [(1, None, 999.0)], "k bigint, ts timestamp, px double"
        )
    )
    out = {
        r.tid: r.px_asof
        for r in asof_join(trades, dirty, keys=["k"], ts_col="ts").collect()
    }
    assert out == {200: 10.0, 201: None}


def test_interval_join_null_bounds_drop(spark):
    points = spark.createDataFrame(
        [(1, _ts(5)), (2, None)], "pid bigint, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(10, _ts(0), _ts(10)), (11, None, _ts(10)), (12, _ts(0), None)],
        "ivid bigint, s timestamp, e timestamp",
    )
    got = {
        (r.pid, r.ivid)
        for r in interval_join(points, ivs, "ts", "s", "e").collect()
    }
    assert got == {(1, 10)}


def test_temporal_plans_stay_off_the_nested_loop_path(spark, sf_dir):
    """Scale pins: the gate queries' physical plans must contain no
    cartesian/nested-loop join (interval containment rides an
    equi-join on the bucket; as-of is window-only), and the as-of
    event_type filters must reach the parquet scan."""
    from decision_tree_stuff_spark.queries import ALL_QUERIES

    asof_plan = (
        ALL_QUERIES["e10_asof_join"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    iv_plan = (
        ALL_QUERIES["e10b_interval_join"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for plan in (asof_plan, iv_plan):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in asof_plan
    assert asof_plan.count("Window") >= 1
    assert "Join" in iv_plan  # the bucket equi-join is a real hash join


def test_interval_join_stream_static_equals_batch(spark, sf_dir, tmp_path):
    """interval_join runs unchanged with the points side streaming:
    the bucket column is a projection and the join a stream-static
    inner equi-join — attach-facts-to-windows at ingest time."""
    from decision_tree_stuff_spark.sources import read_events
    from decision_tree_stuff_spark.streaming import run_stream_to_memory

    ev = read_events(spark, f"{sf_dir}/events.parquet")
    iv = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 1 DAY"))
        .select(F.col("user_id").alias("iv_user"), "w_start", "w_end")
    )
    d = tmp_path / "events_iv_stream"
    ev.write.parquet(str(d))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = interval_join(
        stream.select("event_id", "ts"), iv, "ts", "w_start", "w_end"
    )
    q = run_stream_to_memory(out, "iv_stream", mode="append")
    try:
        got = {
            (r.event_id, r.iv_user)
            for r in spark.table("iv_stream").collect()
        }
        want = {
            (r.event_id, r.iv_user)
            for r in interval_join(
                ev.select("event_id", "ts"), iv, "ts", "w_start", "w_end"
            ).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def asof_inputs(draw):
    nl = draw(st.integers(1, 8))
    nr = draw(st.integers(0, 8))
    ks = [1, 2]
    lefts = [
        (
            i,
            draw(st.sampled_from(ks)),
            draw(st.integers(0, 20)),
        )
        for i in range(nl)
    ]
    rights = [
        (
            draw(st.sampled_from(ks)),
            draw(st.integers(0, 20)),
            float(draw(st.integers(0, 9))),
        )
        for _ in range(nr)
    ]
    return lefts, rights


def py_asof(lefts, rights, exact):
    # dedup ties by max value, then latest at-or-before (or strictly
    # before) per key
    best = {}
    for k, t, v in rights:
        best[(k, t)] = max(best.get((k, t), v), v)
    out = {}
    for lid, k, t in lefts:
        cands = [
            (rt, rv)
            for (rk, rt), rv in best.items()
            if rk == k and (rt <= t if exact else rt < t)
        ]
        out[lid] = max(cands)[1] if cands else None
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=asof_inputs(), exact=st.booleans())
def test_asof_matches_python_oracle(spark, data, exact):
    lefts, rights = data
    ldf = spark.createDataFrame(
        [(i, k, _ts(t)) for i, k, t in lefts],
        "tid bigint, k bigint, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), v) for k, t, v in rights] or [(None, None, None)],
        "k bigint, ts timestamp, px double",
    ).where("k IS NOT NULL")
    got = {
        r.tid: r.px_asof
        for r in asof_join(
            ldf, rdf, keys=["k"], ts_col="ts", allow_exact_match=exact
        ).collect()
    }
    assert got == py_asof(lefts, rights, exact)


@st.composite
def interval_inputs(draw):
    np_ = draw(st.integers(1, 8))
    ni = draw(st.integers(0, 6))
    points = [(i, draw(st.integers(0, 30))) for i in range(np_)]
    ivs = []
    for j in range(ni):
        s = draw(st.integers(0, 30))
        e = s + draw(st.integers(0, 12))  # includes empty (e == s)
        ivs.append((100 + j, s, e))
    return points, ivs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=interval_inputs(), bucket=st.sampled_from([60, 180, 3600]))
def test_interval_join_matches_python_oracle(spark, data, bucket):
    points, ivs = data
    pdf = spark.createDataFrame(
        [(i, _ts(t)) for i, t in points], "pid bigint, ts timestamp"
    )
    idf = spark.createDataFrame(
        [(j, _ts(s), _ts(e)) for j, s, e in ivs] or [(None, None, None)],
        "ivid bigint, s timestamp, e timestamp",
    ).where("ivid IS NOT NULL")
    got = {
        (r.pid, r.ivid)
        for r in interval_join(
            pdf, idf, "ts", "s", "e", bucket_seconds=bucket
        ).collect()
    }
    want = {
        (i, j)
        for i, t in points
        for j, s, e in ivs
        if s <= t < e
    }
    assert got == want


def test_asof_matches_naive_on_events(spark, sf_dir):
    """Differential vs the O(n²)-per-key naive formulation on real
    event data: max-by-ts right row per left row via a window over an
    inequality join."""
    from decision_tree_stuff_spark.sources import read_events

    ev = read_events(spark, f"{sf_dir}/events.parquet")
    p = ev.where("event_type = 'purchase'").select("event_id", "user_id", "ts")
    c = ev.where("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("value").alias("cv"),
    )
    got = {
        (r.event_id, r.cv_asof)
        for r in asof_join(
            p, c.select(F.col("cu").alias("user_id"), F.col("cts").alias("ts"),
                        F.col("cv")),
            keys=["user_id"], ts_col="ts", value_cols=["cv"],
        ).collect()
    }
    naive = (
        p.join(c, (p.user_id == c.cu) & (p.ts >= c.cts), "left")
        .groupBy("event_id")
        .agg(F.max(F.struct("cts", "cv")).alias("w"))
        .select("event_id", F.col("w.cv").alias("cv"))
    )
    want = {(r.event_id, r.cv) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_funnel_ordered_semantics(spark):
    """Hand-built funnel pinning the ordering rule: a purchase BEFORE
    the user's first signup does not convert; equal timestamps count
    (at-or-after); users skipping a step break the chain there."""
    import datetime as dt

    from decision_tree_stuff_spark.operators.sessionize import funnel

    T = lambda h: dt.datetime(2026, 1, 1, h)
    rows = [
        # u1: full ordered funnel
        (1, "signup", T(1)), (1, "click", T(2)), (1, "purchase", T(3)),
        # u2: purchase before signup -> stops after click
        (2, "purchase", T(1)), (2, "signup", T(2)), (2, "click", T(3)),
        # u3: signup only
        (3, "signup", T(5)),
        # u4: click/purchase but never signed up -> not even step 1
        (4, "click", T(1)), (4, "purchase", T(2)),
        # u5: simultaneous signup+click (equal ts counts), no purchase
        (5, "signup", T(7)), (5, "click", T(7)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    got = {
        r["step_name"]: (r["n_users"], r["conversion"])
        for r in funnel(df, ["signup", "click", "purchase"]).collect()
    }
    assert got["signup"] == (4, 1.0)
    assert got["click"] == (3, 0.75)
    assert got["purchase"] == (1, 0.25)


class TestIntervalCoverage:
    def test_hand_math(self, spark):
        from decision_tree_stuff_spark.operators.temporal import (
            interval_coverage,
        )

        rows = [
            # key a: [0,10] U [5,20] merge -> [0,20]; [25,30] separate
            ("a", 0, 10), ("a", 5, 20), ("a", 25, 30),
            # key b: touching intervals merge ([0,5] + [5,9] -> [0,9])
            ("b", 0, 5), ("b", 5, 9),
            # key c: contained interval ([0,100] swallows [10,20])
            ("c", 0, 100), ("c", 10, 20),
        ]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        got = {
            r["k"]: (r["n_islands"], r["covered"])
            for r in interval_coverage(df, "k", "s", "e").collect()
        }
        assert got == {"a": (2, 25), "b": (1, 9), "c": (1, 100)}

    def test_equal_starts_any_partitioning(self, spark):
        from decision_tree_stuff_spark.operators.temporal import (
            interval_coverage,
        )

        # equal starts with different ends never split an island
        rows = [("k", 0, 3), ("k", 10, 15), ("k", 10, 12), ("k", 14, 18)]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        for parts in (1, 5):
            got = interval_coverage(
                df.repartition(parts), "k", "s", "e"
            ).collect()[0]
            assert (got["n_islands"], got["covered"]) == (2, 11)

    def test_no_single_task_window(self, spark):
        from decision_tree_stuff_spark.operators.temporal import (
            interval_coverage,
        )

        df = spark.createDataFrame(
            [("k", 0, 1)], "k string, s long, e long"
        )
        plan = (
            interval_coverage(df, "k", "s", "e")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SinglePartition" not in plan
