"""Sink layout + partition pruning + streaming dedup tests."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from decision_tree_stuff_spark.sources.sinks import (
    write_bucketed_table,
    write_partitioned,
    write_sorted_within_partitions,
)
from decision_tree_stuff_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    stream_exact_dedup,
)


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"])

    assert glob.glob(f"{out}/lang=en/*.parquet"), "hive-style layout expected"

    back = spark.read.parquet(out).where(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[-600:]
    assert back.count() == docs.where(F.col("lang") == "en").count()


def test_sorted_write_roundtrip(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    out = str(tmp_path / "li_sorted")
    write_sorted_within_partitions(li, out, ["l_quantity"])
    assert spark.read.parquet(out).count() == li.count()


def test_bucketed_join_needs_no_shuffle(spark, sf_dir):
    """Join of two tables bucketed on the key must not exchange either
    side — the write-time hash partitioning is reused."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
        ["o_orderkey"], 8,
    )
    # force the sort-merge path: at test scale the sides are tiny and
    # would broadcast, hiding the bucket alignment we're pinning
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("b_orders")
        b = spark.table("b_lineitem")
        joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.split("SortMergeJoin")[1], (
            "bucketed join must not shuffle its inputs"
        )
        want = (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderstatus").count()
        )
        assert sorted(map(str, joined.collect())) == sorted(map(str, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_stream_exact_dedup(spark, sf_dir, tmp_path):
    """Duplicate the events file → the stream must emit each event_id
    exactly once."""
    import shutil

    d = tmp_path / "dup_events"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "b.parquet")

    stream = stream_exact_dedup(
        read_events_stream(spark, str(d)), key_cols=["event_id"]
    )
    q = run_stream_to_memory(stream, "dedup_test", mode="append")
    got = spark.table("dedup_test")
    # load_table routes through the unit-sniffing events reader so the
    # batch count matches whatever precision the data stores.
    from decision_tree_stuff_spark.sources import load_table

    n_unique = load_table(spark, sf_dir, "events").count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique
    q.stop()


def test_write_sized_targets_file_count(spark, tmp_path):
    """File count follows the plan-size estimate: a tiny target
    splits the output into many files, a huge target collapses it to
    one; both outputs round-trip identically."""
    import glob

    from decision_tree_stuff_spark.sources.sinks import write_sized

    df = spark.range(200_000).selectExpr(
        "id AS doc_id", "repeat(CAST(id AS STRING), 20) AS payload"
    )

    p1 = str(tmp_path / "one_file")
    n1 = write_sized(df, p1, target_mb=10_000)
    assert n1 == 1
    assert len(glob.glob(f"{p1}/part-*.parquet")) == 1

    p2 = str(tmp_path / "many_files")
    # sub-MB target: must split well beyond one file
    n2 = write_sized(df, p2, target_mb=1)
    files2 = glob.glob(f"{p2}/part-*.parquet")
    assert n2 > 1 and len(files2) == n2

    a = sorted(r.doc_id for r in spark.read.parquet(p1).collect())
    b = sorted(r.doc_id for r in spark.read.parquet(p2).collect())
    assert a == b and len(a) == 200_000
