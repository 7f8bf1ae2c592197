"""Composed retrieval pipeline (r8): BM25 top-k + dense top-k → RRF
fusion → benchmark decontamination, with the funnel-audit accounting
check the e7b composition established — `run_with_audit` boundary
counts must equal independently-computed stage counts, and the final
frame must equal the registered `e4_retrieval_pipeline` query.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.audit import (
    audit_counts,
    run_with_audit,
)
from decision_tree_stuff_spark.queries import (
    ALL_QUERIES,
    DECON_N,
    DECON_THRESHOLD,
    HYBRID_K,
    HYBRID_PROBES,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _stages(spark):
    """The pipeline as named run_with_audit stages over the fused
    top-k frame: decontamination is the one row-dropping boundary."""
    from decision_tree_stuff_spark.operators.decontam import (
        ngram_contamination,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def decontam(fused):
        retrieved = docs.join(fused.select("doc_id").distinct(), "doc_id")
        contaminated = (
            ngram_contamination(
                retrieved,
                docs.where("doc_id % 7 = 0"),
                n=DECON_N,
                threshold=DECON_THRESHOLD,
            )
            .select(F.col("train_id").alias("doc_id"))
            .distinct()
        )
        return fused.join(contaminated, "doc_id", "left_anti")

    return [("decontam", decontam)]


def _fused(spark):
    from decision_tree_stuff_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from decision_tree_stuff_spark.operators.similarity import cosine_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probes = docs.where(F.col("doc_id").isin(HYBRID_PROBES)).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    lex = bm25_topk(docs, probes, k=HYBRID_K).select(
        "query_id", "doc_id", "rank"
    )
    dense = cosine_topk(emb, HYBRID_PROBES, k=HYBRID_K).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse(lex, dense, k=HYBRID_K)


def test_audit_counts_match_independent_counts(spark):
    fused = _fused(spark)
    out, obs = run_with_audit(fused, _stages(spark))
    rows = [tuple(r) for r in out.collect()]
    funnel = audit_counts(obs)
    by_stage = {f["stage"]: f for f in funnel}
    n_fused = fused.count()
    assert by_stage["input"]["rows"] == n_fused
    assert by_stage["decontam"]["rows"] == len(rows)
    assert by_stage["decontam"]["dropped"] == n_fused - len(rows)
    # retrieval found something, decontam did not wipe the output
    assert n_fused >= len(HYBRID_PROBES)
    assert len(rows) > 0


def test_pipeline_query_equals_audited_composition(spark):
    """The registered gate-facing query is the same computation as
    the audited stage composition."""
    out, _ = run_with_audit(_fused(spark), _stages(spark))
    got = sorted(
        tuple(r)
        for r in out.select(
            "query_id", "doc_id", "rrf_score", "rank"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ALL_QUERIES["e4_retrieval_pipeline"](
            spark, SF_DIR
        ).collect()
    )
    assert got == want


def test_benchmark_members_never_survive(spark):
    """A retrieved %7==0 doc is a benchmark member: its 1.0
    self-containment must always drop it — except a doc too short to
    have any n-gram at all (no containment is defined for it)."""
    from decision_tree_stuff_spark.functions.text import tokens

    out, _ = run_with_audit(_fused(spark), _stages(spark))
    survivors = [
        r["doc_id"] for r in out.collect() if r["doc_id"] % 7 == 0
    ]
    if not survivors:
        return
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lens = {
        r["doc_id"]: r["n"]
        for r in docs.where(F.col("doc_id").isin(survivors))
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    assert all(lens[d] < DECON_N for d in survivors), lens
