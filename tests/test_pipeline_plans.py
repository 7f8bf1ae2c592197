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


def test_bloom_decontam_corpus_side_is_pure_projection(spark, sf_dir):
    """The Bloom variant's raison d'être: the corpus side must carry
    NO join and NO exchange — membership is k element_at probes into
    a literal bitset inside one projection, so the plan is
    scan -> project -> filter and nothing else."""
    from decision_tree_stuff_spark.operators.decontam import bloom_decontaminate

    docs = _docs(spark, sf_dir)
    clean = bloom_decontaminate(
        docs.where("doc_id % 97 <> 0"),
        docs.where("doc_id % 97 = 0"),
        m=1 << 16,
    )
    plan = _plan(clean)
    assert "Join" not in plan, plan[:1200]
    # spread_small's guarded round-robin is the only exchange allowed
    # (and disappears at real scale); no hash/single partitioning
    assert "hashpartitioning" not in plan, plan[:1200]
    assert "Exchange SinglePartition" not in plan, plan[:1200]
    # the pushdown fence must keep the threshold filter ABOVE the
    # spread exchange: without it Catalyst inlines the gram build into
    # the scan-stage filter and the probe runs serialized in the
    # single-split scan task (measured 10 s vs 1 s at sf0.1). The
    # only thing below the exchange may be the id-predicate scan
    # filter — never tokenization.
    below_exchange = plan.split("Exchange")[-1]
    assert "regexp_replace" not in below_exchange, below_exchange[:800]


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


def test_pack_materialize_two_phase_and_bounded_groups(spark, sf_dir):
    """The physical packer must keep the two-phase bucketed prefix-sum
    (no single-task window on the big side) and reassemble packs with
    a hash aggregate keyed by pack_id — per-group state is bounded by
    seq_len, never a global sort or collect."""
    from decision_tree_stuff_spark.functions.text import tokens
    from decision_tree_stuff_spark.operators.sampling import pack_materialize

    df = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    plan = _plan(pack_materialize(df, "toks", 512, ["doc_id"], "s"))
    assert "hashpartitioning(_bucket" in plan
    assert "BroadcastExchange" in plan
    head = plan.split("BroadcastExchange")[0]
    assert "Exchange SinglePartition" not in head, (
        "prefix-sum window collapsed to one partition:\n" + head[:800]
    )
    assert "hashpartitioning(pack_id" in plan
    assert "Sort [pack_id" not in plan.split("ObjectHashAggregate")[0], (
        "pack reassembly must be a hash aggregate, not a global sort"
    )


def test_rh_lsh_broadcasts_queries_not_corpus(spark, sf_dir):
    """rh-LSH joins the corpus to a BROADCAST query side — the only
    hash exchange allowed is the top-k window's (on query_id, i.e. on
    candidate rows, already bucket-filtered); the corpus itself must
    never shuffle (the whole point of the bucket equi-join at
    100 TB)."""
    import re

    from decision_tree_stuff_spark.operators.similarity import rh_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(
        rh_lsh_topk(emb, list(range(10)), k=5, n_planes=4, multiprobe=True)
    )
    assert "BroadcastExchange" in plan
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and all(k == "query_id" for k in keys), (
        f"corpus-side shuffle detected (exchange keys {keys}):\n"
        + plan[:800]
    )


def test_minhash_verification_runs_after_pair_dedup(spark, sf_dir):
    """The measured staging property (r4): the 64-element zip_with
    verification must consume the DEDUPLICATED candidate pairs — in
    the top-down plan print the zip_with projection sits ABOVE the
    (id_a, id_b) aggregate. Folding verification into the band join
    (zip_with below the dedup) measured 2-8x slower: it pays the
    array comparison once per exploded bucket match x bands."""
    from decision_tree_stuff_spark.operators.dedup import minhash_lsh_pairs

    plan = _plan(
        minhash_lsh_pairs(_docs(spark, sf_dir), bands=8, threshold=0.7)
    )
    assert "zip_with" in plan and "HashAggregate(keys=[id_a" in plan
    assert plan.index("zip_with") < plan.index("HashAggregate(keys=[id_a"), (
        "verification must be applied above the candidate-pair dedup"
    )


def test_incremental_dedup_prunes_corpus_scan(spark, sf_dir):
    """The historical-corpus side of the incremental dedup anti-join
    must scan ONLY the text column it fingerprints (plus the filter
    key) — reading full corpus rows to compute a 16-byte digest is
    the difference between a 100 TB scan and a projection of it."""
    from decision_tree_stuff_spark.operators.dedup import dedup_against_corpus

    docs = _docs(spark, sf_dir)
    out = dedup_against_corpus(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        mode="exact",
    )
    plan = _plan(out)
    assert "LeftAnti" in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    corpus_scans = [l for l in scans if "text" in l and "lang" not in l]
    assert corpus_scans, (
        "corpus side must prune to (id, text):\n" + "\n".join(scans)
    )
