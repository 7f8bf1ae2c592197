"""applyInPandasWithState: state must persist and accumulate across
micro-batches, and the final per-key emission must equal the batch
aggregate."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from decision_tree_stuff_spark.streaming import read_events_stream, run_stream_to_memory
from decision_tree_stuff_spark.streaming.stateful import stream_user_profiles


def test_stateful_profiles_accumulate_across_batches(
    spark, sf_dir, tmp_path_factory
):
    d = tmp_path_factory.mktemp("events_stateful")
    t = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    quarter = t.num_rows // 4
    for i in range(4):
        n = quarter if i < 3 else t.num_rows - 3 * quarter
        pq.write_table(t.slice(i * quarter, n), f"{d}/part{i}.parquet")

    stream = stream_user_profiles(read_events_stream(spark, str(d)))
    q = run_stream_to_memory(stream, "profiles", mode="append")
    emitted = spark.table("profiles")

    # multiple emissions per user (one per batch the user appears in)
    # prove cross-batch state; the max is the final accumulated value
    per_user_final = emitted.groupBy("user_id").agg(
        F.max("events_so_far").alias("n"),
        F.max("distinct_types").alias("k"),
    )
    from decision_tree_stuff_spark.queries import _events

    batch = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("k"),
        )
    )
    got = {r["user_id"]: (r["n"], r["k"]) for r in per_user_final.collect()}
    want = {r["user_id"]: (r["n"], r["k"]) for r in batch.collect()}
    assert got == want
    # state really spanned batches: some user must have >1 emission
    multi = emitted.groupBy("user_id").count().where(F.col("count") > 1).count()
    assert multi > 0, "expected multi-batch users"
    q.stop()
