"""Streaming semantic decontamination (r9): stream ≡ batch over
multiple micro-batches — stateless by construction (stream-static
anti join against the broadcast eval set), so any file slicing must
yield exactly the batch exact path's kept set.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.decontam import (
    embedding_decontamination,
)
from decision_tree_stuff_spark.streaming import stream_semantic_decontam

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
THRESHOLD = 0.8


@pytest.fixture(scope="module")
def emb_stream_dir(spark, tmp_path_factory):
    """Corpus embeddings split into 3 parquet files so
    maxFilesPerTrigger=1 forces 3 micro-batches — with PLANTED leaks
    (exact clones of three benchmark embeddings under fresh ids, one
    per file) so the drop is non-vacuous at any threshold: random
    64-dim vectors never reach cos 0.8 at this sf on their own."""
    d = tmp_path_factory.mktemp("emb_stream")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plants = (
        emb.where("vec_id % 7 = 0")
        .orderBy("vec_id")
        .limit(3)
        .select(
            (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
            "embedding",
            "label",
        )
    )
    corpus = emb.where("vec_id % 7 <> 0").unionByName(plants)
    for i in range(3):
        corpus.where(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"part{i}"))
    return d, corpus


def test_stream_semantic_decontam_equals_batch(spark, tmp_path, emb_stream_dir):
    d, corpus = emb_stream_dir
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bench = emb.where("vec_id % 7 = 0")

    batch_kept = sorted(
        r["vec_id"]
        for r in embedding_decontamination(
            corpus, bench, threshold=THRESHOLD, exact=True
        )
        .where(~F.col("contaminated"))
        .collect()
    )
    # sanity: the threshold actually drops something at this sf, or
    # the equality below would be vacuous
    assert len(batch_kept) < corpus.count()

    schema = corpus.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "part*"))
    )
    out = stream_semantic_decontam(stream, bench, threshold=THRESHOLD)
    q = (
        out.writeStream.format("memory")
        .queryName("sem_decontam_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    stream_kept = sorted(
        r["vec_id"]
        for r in spark.sql("SELECT vec_id FROM sem_decontam_stream").collect()
    )
    assert n_batches >= 3, n_batches  # the slicing was real
    assert stream_kept == batch_kept


def test_stream_semantic_decontam_is_stateless_plan(spark, emb_stream_dir):
    """No watermark, no state store: the streaming plan must contain
    no stateful operator (the whole point of the anti-join shape)."""
    d, _ = emb_stream_dir
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bench = emb.where("vec_id % 7 = 0")
    schema = spark.read.parquet(str(d / "part0")).schema
    stream = spark.readStream.schema(schema).parquet(str(d / "part*"))
    out = stream_semantic_decontam(stream, bench, threshold=THRESHOLD)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" not in plan
    q = (
        out.writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert all(
        p.get("stateOperators") in ([], None)
        for p in (q.recentProgress or [])
    ), [p.get("stateOperators") for p in q.recentProgress]
