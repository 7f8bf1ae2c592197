"""Physical-plan audits for the round-2 pipeline operators
(sampling / packing / decontamination) — the properties that matter at
100 TB, pinned so a refactor cannot silently regress them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.decontam import ngram_contamination
from decision_tree_stuff_spark.operators.sampling import (
    deterministic_sample,
    global_shuffle,
    pack_sequences,
    stratified_sample,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sample_is_shuffle_free_filter(spark, sf_dir):
    plan = _plan(
        deterministic_sample(_docs(spark, sf_dir), 0.2, ["doc_id"], "s")
    )
    assert "Exchange" not in plan, "hash sampling must not shuffle"
    assert "Filter" in plan


def test_stratified_sample_is_shuffle_free(spark, sf_dir):
    plan = _plan(
        stratified_sample(
            _docs(spark, sf_dir), "lang", {"en": 0.5}, ["doc_id"], "s", 0.1
        )
    )
    assert "Exchange" not in plan


def test_global_shuffle_has_no_big_single_partition(spark, sf_dir):
    """The rank window must partition by bucket (parallel); the only
    SinglePartition exchange allowed is the 256-row base-offset frame,
    which must be on the broadcast side."""
    df = _docs(spark, sf_dir).select("doc_id")
    plan = _plan(global_shuffle(df, ["doc_id"], "s"))
    # the big-side window is bucket-partitioned
    assert "hashpartitioning(_bucket" in plan, plan[:800]
    # base offsets travel by broadcast, not by co-shuffle
    assert "BroadcastExchange" in plan
    # window over the full set would show an empty partition spec
    head = plan.split("BroadcastExchange")[0]
    assert "Exchange SinglePartition" not in head, (
        "rank window collapsed to one partition:\n" + head[:800]
    )


def test_pack_sequences_same_two_phase_shape(spark, sf_dir):
    df = _docs(spark, sf_dir).select(
        "doc_id", F.length("text").alias("n_tokens")
    )
    plan = _plan(pack_sequences(df, "n_tokens", 512, ["doc_id"], "s"))
    assert "hashpartitioning(_bucket" in plan
    assert "BroadcastExchange" in plan
    head = plan.split("BroadcastExchange")[0]
    assert "Exchange SinglePartition" not in head


def test_decontam_broadcasts_benchmark_side(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    plan = _plan(
        ngram_contamination(
            docs.where("doc_id % 97 <> 0"), docs.where("doc_id % 97 = 0")
        )
    )
    assert "BroadcastHashJoin" in plan, "bench grams must broadcast"
    # the training side never passes through a global distinct
    # (set semantics come from per-doc array_distinct)
    assert plan.count("HashAggregate") <= 4, plan[:1200]


def test_decontam_prunes_scan_to_id_and_text(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    plan = _plan(
        ngram_contamination(
            docs.where("doc_id % 97 <> 0"), docs.where("doc_id % 97 = 0")
        )
    )
    assert "struct<doc_id:bigint,text:string>" in plan, (
        "gram build must read only (doc_id, text):\n" + plan[-600:]
    )
