"""The end-to-end ingest pipeline as ONE stream (round-7 task 7):
span-strip against a materialized boilerplate table → LM-quality
filter against a materialized unigram model → per-group quota fold,
audited per batch — pinned stream ≡ batch over ≥3 micro-batches with
genuine cross-batch quota contention.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_ingest_pipeline_stream_equals_batch(spark, sf_dir, tmp_path):
    """Final quota state of the streamed pipeline equals the one-shot
    batch composition strip → quality → cap over ALL input, and the
    audit funnels account for every row (per-doc stages sum across
    batches to the batch totals)."""
    from decision_tree_stuff_spark.operators.dedup import (
        frequent_spans,
        span_dedup_against_corpus,
    )
    from decision_tree_stuff_spark.operators.sampling import cap_per_group
    from decision_tree_stuff_spark.operators.textstats import (
        unigram_logprob,
        unigram_model,
    )
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_ingest_pipeline,
    )

    docs = _docs(spark, sf_dir)
    # "historical corpus" = even ids: learn boilerplate + LM offline,
    # MATERIALIZE both (the persist-once contract), reload from disk
    hist = docs.where(F.col("doc_id") % 2 == 0)
    freq_path = str(tmp_path / "frequent_spans")
    model_path = str(tmp_path / "unigram_model")
    frequent_spans(hist, n=5, min_docs=2).write.parquet(freq_path)
    unigram_model(hist).write.parquet(model_path)
    freq = spark.read.parquet(freq_path)
    model = spark.read.parquet(model_path)

    # threshold = the 20th percentile of the incoming docs' scores
    # (on STRIPPED text, same as the pipeline computes them) so the
    # quality stage REALLY drops rows — a fixed literal left the
    # filter vacuous on this corpus
    incoming = docs.where(F.col("doc_id") % 2 == 1)
    pre_stripped = span_dedup_against_corpus(
        incoming, freq, n=5
    ).select("doc_id", "text")
    pre_staged = incoming.drop("text").join(pre_stripped, "doc_id")
    min_lp = float(
        unigram_logprob(pre_staged, model=model)
        .agg(F.percentile_approx("mean_logprob", 0.2, 10000))
        .first()[0]
    )

    # 3 parquet files by id%3 + maxFilesPerTrigger=1 → ≥3 micro-batches
    d = tmp_path / "incoming"
    d.mkdir()
    for i in range(3):
        staging = str(tmp_path / f"stage{i}")
        incoming.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            staging
        )
        shutil.move(
            glob.glob(f"{staging}/part-*.parquet")[0],
            str(d / f"third{i}.parquet"),
        )

    state = str(tmp_path / "ingest_state")
    audit = []
    q = stream_ingest_pipeline(
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d)),
        state,
        freq,
        model,
        group_cols=["lang"],
        n=7,
        key_cols=["doc_id"],
        span_n=5,
        min_logprob=min_lp,
        seed="ingest",
        audit_log=audit,
    )
    assert q.lastProgress is not None
    assert len(audit) >= 3, "expected >= 3 micro-batches"

    # batch twin over ALL input, same static tables
    stripped = span_dedup_against_corpus(
        incoming, freq, n=5
    ).select("doc_id", "text")
    staged = incoming.drop("text").join(stripped, "doc_id")
    keep = (
        unigram_logprob(staged, model=model)
        .where(F.col("mean_logprob") >= min_lp)
        .select("doc_id")
    )
    staged = staged.join(keep, "doc_id")
    want_df = cap_per_group(staged, ["lang"], 7, ["doc_id"], seed="ingest")

    cols = sorted(want_df.columns)

    def rows(df):
        return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())

    got = rows(read_capped_state(spark, state))
    want = rows(want_df)
    assert got == want and len(got) > 0

    # audit accounting: per-doc stages → batch sums equal global counts
    sums = {}
    for _bid, funnel in audit:
        for row in funnel:
            sums[row["stage"]] = sums.get(row["stage"], 0) + row["rows"]
    assert sums["input"] == incoming.count()
    assert sums["span_strip"] == sums["input"], (
        "span strip rewrites text, never drops documents"
    )
    assert sums["lm_quality"] == staged.count()
    assert sums["lm_quality"] < sums["input"], (
        "quality threshold must actually drop rows for this pin to "
        "mean anything"
    )

    # retention: only the last snapshot and its predecessor remain
    versions = [v for v in os.listdir(state) if v.startswith("v")]
    assert len(versions) <= 2, versions


def test_stream_ingest_bloom_semantic_match_e12_stages(
    spark, sf_dir, tmp_path
):
    """r10 (r9 verdict task 8): with the Bloom + semantic stages
    enabled, the streamed ingest's kept set over ≥3 micro-batches
    equals applying ``e12_batch_ingest``'s OWN s5/s6 stage callables
    (``ingest_stages``'s bloom_decontam + semantic_decontam) to the
    full input in batch — the stream now matches the batch flagship
    stage-for-stage. Strip/quality/cap are configured neutral so the
    equality isolates the two new stages; benchmark members must drop
    on their own 1.0 self-containment (the planted leak)."""
    from decision_tree_stuff_spark.operators.textstats import unigram_model
    from decision_tree_stuff_spark.queries._shared import BLOOM_T, DECON_N
    from decision_tree_stuff_spark.queries.ingest import ingest_stages
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_ingest_pipeline,
    )

    docs = _docs(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bloom_bench = docs.where(F.col("doc_id") % 7 == 0)
    bench_emb = emb.where(
        (F.col("vec_id") % 7 == 0) & (F.col("vec_id") < 10_000_000)
    )
    emb_lookup = emb.select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )

    d = tmp_path / "in"
    d.mkdir()
    for i in range(3):
        staging = str(tmp_path / f"s{i}")
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            staging
        )
        shutil.move(
            glob.glob(f"{staging}/part-*.parquet")[0],
            str(d / f"b{i}.parquet"),
        )

    empty_freq = spark.createDataFrame([], "span_key string")
    state = str(tmp_path / "state")
    audit = []
    stream_ingest_pipeline(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d)),
        state,
        empty_freq,
        unigram_model(docs),
        group_cols=["lang"],
        n=10**9,           # quota never binds: state = sem(bloom(all))
        key_cols=["doc_id"],
        span_n=5,
        min_logprob=-100.0,  # quality never drops
        seed="e12eq",
        audit_log=audit,
        bloom_bench=bloom_bench,
        bloom_n=DECON_N,
        bloom_threshold=BLOOM_T,
        emb_lookup=emb_lookup,
        bench_emb=bench_emb,
        sem_threshold=0.8,
    )
    assert len(audit) >= 3, "expected >= 3 micro-batches"

    # batch twin: e12_batch_ingest's OWN stage callables, same order
    stages = dict(ingest_stages(spark, sf_dir))
    want_df = stages["semantic_decontam"](stages["bloom_decontam"](docs))

    got = sorted(
        r["doc_id"] for r in read_capped_state(spark, state).collect()
    )
    want = sorted(r["doc_id"] for r in want_df.select("doc_id").collect())
    assert got == want and got
    # the stages actually fired: benchmark members (planted leaks,
    # 1.0 self-containment) are gone, and something was kept
    assert all(i % 7 != 0 for i in got)
    assert len(got) < docs.count()


def test_stream_ingest_incremental_dedup_stage(spark, sf_dir, tmp_path):
    """r10: with ``dedup_corpus`` given, the stream's first stage is
    the incremental minhash-band dedup against the materialized
    historical corpus — the kept set over ≥3 micro-batches equals the
    batch ``dedup_against_corpus`` over the full input (the stage is
    a stateless per-row decision against a static table)."""
    from decision_tree_stuff_spark.operators.dedup import (
        dedup_against_corpus,
    )
    from decision_tree_stuff_spark.operators.textstats import unigram_model
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_ingest_pipeline,
    )

    docs = _docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 == 1)

    d = tmp_path / "in"
    d.mkdir()
    for i in range(3):
        staging = str(tmp_path / f"s{i}")
        incoming.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            staging
        )
        shutil.move(
            glob.glob(f"{staging}/part-*.parquet")[0],
            str(d / f"b{i}.parquet"),
        )

    state = str(tmp_path / "state")
    audit = []
    stream_ingest_pipeline(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d)),
        state,
        spark.createDataFrame([], "span_key string"),  # strip neutral
        unigram_model(docs),
        group_cols=["lang"],
        n=10**9,             # quota never binds
        key_cols=["doc_id"],
        span_n=5,
        min_logprob=-100.0,  # quality never drops
        seed="dedup",
        audit_log=audit,
        dedup_corpus=corpus,
    )
    assert len(audit) >= 3
    assert audit[0][1][1]["stage"] == "incremental_dedup"

    got = sorted(
        r["doc_id"] for r in read_capped_state(spark, state).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in dedup_against_corpus(
            incoming, corpus, mode="minhash", bands=8, hash_fn="md5km"
        ).collect()
    )
    assert got == want and got
    assert len(got) < incoming.count(), "dedup stage must actually drop"


def test_ingest_pipeline_cross_batch_eviction(spark, tmp_path):
    """A later micro-batch carrying lower-hash rows evicts earlier
    keepers through the strip+quality stages — the compacted-state
    merge, exercised end-to-end on a hand-built corpus."""
    from decision_tree_stuff_spark.operators.sampling import cap_per_group
    from decision_tree_stuff_spark.streaming import (
        read_capped_state,
        stream_ingest_pipeline,
    )

    rows = [
        # one group ('g'), texts identical → strip/quality neutral;
        # quota decided purely by md5(doc_id) hash order
        (i, "g", "common words repeated here") for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    d = tmp_path / "in"
    d.mkdir()
    import glob as g
    import shutil as sh

    for i in range(3):
        staging = str(tmp_path / f"s{i}")
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(staging)
        sh.move(
            g.glob(f"{staging}/part-*.parquet")[0], str(d / f"b{i}.parquet")
        )

    empty_freq = spark.createDataFrame([], "span_key string")
    # uniform model over the corpus's own vocabulary → nothing OOV
    from decision_tree_stuff_spark.operators.textstats import unigram_model

    model = unigram_model(docs)
    state = str(tmp_path / "state")
    stream_ingest_pipeline(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d)),
        state,
        empty_freq,
        model,
        group_cols=["lang"],
        n=5,
        key_cols=["doc_id"],
        span_n=5,
        min_logprob=-30.0,
        seed="evict",
    )
    got = sorted(
        r["doc_id"] for r in read_capped_state(spark, state).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in cap_per_group(
            docs, ["lang"], 5, ["doc_id"], seed="evict"
        ).collect()
    )
    assert got == want and len(got) == 5
    # the winning set must span multiple batches (id % 3 classes),
    # otherwise no eviction was exercised
    assert len({i % 3 for i in got}) >= 2, got
