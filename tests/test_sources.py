"""Source-format tests: CSV / JSONL readers must round-trip the
documents table exactly (explicit schema, FAILFAST — no inference
pass, no silent nulls) and fail loudly on malformed input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from decision_tree_stuff_spark.sources import read_csv, read_jsonl

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _rows(df):
    return sorted(tuple(r) for r in df.select(*DOCS_SCHEMA.names).collect())


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_csv_round_trip(spark, docs, tmp_path):
    p = str(tmp_path / "docs_csv")
    # quoting/escaping must survive commas and quotes inside text
    docs.write.option("header", True).csv(p)
    back = read_csv(spark, p, DOCS_SCHEMA)
    assert _rows(back) == _rows(docs)


def test_jsonl_round_trip(spark, docs, tmp_path):
    p = str(tmp_path / "docs_jsonl")
    docs.write.json(p)
    back = read_jsonl(spark, p, DOCS_SCHEMA)
    assert _rows(back) == _rows(docs)


def test_csv_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("doc_id,text,lang,source,n_chars\nnot_a_number,x,en,web,5\n")
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_csv(spark, str(p), DOCS_SCHEMA).collect()


def test_operators_run_on_csv_source(spark, docs, tmp_path):
    """Operators are source-agnostic: the same quality filter over a
    CSV scan returns the same kept set as over parquet."""
    from decision_tree_stuff_spark.operators.textstats import quality_filter

    p = str(tmp_path / "docs_csv2")
    docs.write.option("header", True).csv(p)
    kept_csv = {
        r.doc_id for r in quality_filter(read_csv(spark, p, DOCS_SCHEMA)).collect()
    }
    kept_parquet = {r.doc_id for r in quality_filter(docs).collect()}
    assert kept_csv == kept_parquet and kept_csv


def test_orc_round_trip_with_partitioning_and_pushdown(spark, docs, tmp_path):
    """ORC round-trips exactly; a lang-partitioned write prunes
    partitions and pushes filters at the scan (same guarantees the
    parquet path pins in test_plans)."""
    from decision_tree_stuff_spark.sources import read_orc, write_orc

    p = str(tmp_path / "docs_orc")
    write_orc(docs, p, partition_by=["lang"])
    back = read_orc(spark, p)
    assert _rows(back) == _rows(docs)

    one_lang = [r.lang for r in docs.select("lang").distinct().collect()][0]
    q = read_orc(spark, p).where(F.col("lang") == one_lang).where(
        F.col("n_chars") > 100
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split(
        "PartitionFilters"
    )[1][:80], "lang filter must prune partitions, not scan+filter"
    assert "PushedFilters: [" in plan and "n_chars" in plan.split(
        "PushedFilters"
    )[1][:120], "n_chars predicate must push to the ORC reader"
    got = {r.doc_id for r in q.collect()}
    want = {
        r.doc_id
        for r in docs.where(
            (F.col("lang") == one_lang) & (F.col("n_chars") > 100)
        ).collect()
    }
    assert got == want


def test_operator_runs_unchanged_on_orc(spark, docs, tmp_path):
    """The dedup operator is format-agnostic: identical results over
    an ORC copy of the corpus."""
    from decision_tree_stuff_spark.operators.dedup import exact_dedup
    from decision_tree_stuff_spark.sources import read_orc, write_orc

    p = str(tmp_path / "docs_orc2")
    write_orc(docs, p)
    a = {
        tuple(r)
        for r in exact_dedup(docs, ["text"], "doc_id").collect()
    }
    b = {
        tuple(r)
        for r in exact_dedup(read_orc(spark, p), ["text"], "doc_id").collect()
    }
    assert a == b


def test_stream_document_stats_equals_batch(spark, docs, sf_dir, tmp_path):
    """document_stats is one stateless projection, so the text-quality
    scorer runs unchanged on a streaming source (append mode, no
    state) and scores every document identically to batch — the shape
    of an ingest-time quality gate."""
    import shutil

    from decision_tree_stuff_spark.operators.textstats import document_stats
    from decision_tree_stuff_spark.streaming import run_stream_to_memory

    d = tmp_path / "docs_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", d / "documents.parquet")

    stream = document_stats(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = run_stream_to_memory(stream, "doc_stats_stream", mode="append")
    try:
        cols = ["doc_id", "quality", "lang_guess"]

        def rows(df):
            return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())

        got = rows(spark.table("doc_stats_stream"))
        want = rows(document_stats(docs))
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_stream_incremental_dedup_against_static_corpus(
    spark, docs, sf_dir, tmp_path
):
    """Production ingest dedup: NEW documents stream in; the
    historical corpus is the STATIC side of a stream-static left-anti
    join on the text fingerprint. Structured Streaming plans this
    natively (no state store — the static side is just a batch
    relation), and the surviving set equals the batch operator's."""
    import shutil

    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.dedup import dedup_against_corpus
    from decision_tree_stuff_spark.streaming import run_stream_to_memory

    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new_batch = docs.where(F.col("doc_id") % 2 == 1)

    d = tmp_path / "new_docs_stream"
    new_batch.write.parquet(str(d))

    stream_new = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    survivors_stream = dedup_against_corpus(stream_new, corpus, mode="exact")
    q = run_stream_to_memory(survivors_stream, "incr_dedup_stream", mode="append")
    try:
        got = {r.doc_id for r in spark.table("incr_dedup_stream").collect()}
        want = {
            r.doc_id
            for r in dedup_against_corpus(new_batch, corpus, mode="exact").collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()
