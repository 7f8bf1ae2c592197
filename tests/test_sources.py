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

    # the production shape: the static side is the MATERIALIZED
    # fingerprint table (corpus hashed once, ever) — same survivors
    from decision_tree_stuff_spark.operators.dedup import corpus_fingerprints

    fp = corpus_fingerprints(corpus).cache()
    stream_new2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q2 = run_stream_to_memory(
        dedup_against_corpus(
            stream_new2, fp, mode="exact", corpus_precomputed=True
        ),
        "incr_dedup_stream_pre",
        mode="append",
    )
    try:
        got2 = {
            r.doc_id for r in spark.table("incr_dedup_stream_pre").collect()
        }
        assert got2 == want
    finally:
        q2.stop()
        fp.unpersist()


def test_stream_minhash_dedup_against_corpus_band_table(
    spark, docs, tmp_path
):
    """Streaming NEAR-dup incremental dedup (mode='minhash'): the
    static side is the materialized corpus band table; the stream side
    computes per-row signatures in a projection and survives iff every
    per-band LEFT ANTI join keeps it. Must equal the batch operator on
    the same input — including a token-less doc, which has no bands
    and always survives."""
    import shutil

    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.dedup import (
        corpus_band_table,
        dedup_against_corpus,
    )
    from decision_tree_stuff_spark.streaming import run_stream_to_memory

    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new_batch = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text"
    ).union(spark.createDataFrame([(999983, "")], "doc_id bigint, text string"))

    d = tmp_path / "new_docs_minhash_stream"
    new_batch.write.parquet(str(d))
    kw = dict(mode="minhash", bands=8, hash_fn="md5km")
    bands_tbl = corpus_band_table(
        corpus, bands=8, hash_fn="md5km"
    ).cache()  # materialized-table stand-in

    stream_new = (
        spark.readStream.schema(new_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    survivors_stream = dedup_against_corpus(
        stream_new, bands_tbl, corpus_precomputed=True, **kw
    )
    q = run_stream_to_memory(
        survivors_stream, "incr_minhash_stream", mode="append"
    )
    try:
        got = {r.doc_id for r in spark.table("incr_minhash_stream").collect()}
        want = {
            r.doc_id
            for r in dedup_against_corpus(new_batch, corpus, **kw).collect()
        }
        assert got == want
        assert 999983 in got  # token-less doc has no bands → survives
        assert 0 < len(want) < new_batch.count()  # join actually dropped some
    finally:
        q.stop()
        bands_tbl.unpersist()


def test_dedup_against_corpus_precomputed_matches_raw(spark, docs):
    """The production escape hatch: feeding the materialized
    fingerprint / band table back must give exactly the raw-corpus
    result — the 100 TB corpus is hashed once, ever."""
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.dedup import (
        corpus_band_table,
        corpus_fingerprints,
        dedup_against_corpus,
    )

    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)

    raw = dedup_against_corpus(new, corpus, mode="exact")
    pre = dedup_against_corpus(
        new, corpus_fingerprints(corpus), mode="exact",
        corpus_precomputed=True,
    )
    assert {r.doc_id for r in raw.collect()} == {
        r.doc_id for r in pre.collect()
    }

    kw = dict(mode="minhash", bands=8, hash_fn="md5km")
    raw_mh = dedup_against_corpus(new, corpus, **kw)
    pre_mh = dedup_against_corpus(
        new, corpus_band_table(corpus, bands=8, hash_fn="md5km"),
        corpus_precomputed=True, **kw,
    )
    assert {r.doc_id for r in raw_mh.collect()} == {
        r.doc_id for r in pre_mh.collect()
    }


def test_dedup_against_corpus_refuses_reserved_fp_column(spark, docs):
    """A caller column named '__fp' would be silently replaced and
    dropped by the fingerprint projection — refuse it instead."""
    import pytest as _pytest

    from decision_tree_stuff_spark.operators.dedup import dedup_against_corpus

    poisoned = docs.withColumn("__fp", docs["doc_id"])
    with _pytest.raises(ValueError, match="__fp"):
        dedup_against_corpus(poisoned, docs, mode="exact")


def test_events_stream_starts_on_empty_directory(spark, sf_dir, tmp_path):
    """The normal file-source streaming setup points at an initially
    EMPTY watch directory; the reader must fall back to the default
    MICROS/LTZ schema instead of raising at stream-definition time,
    and then consume files dropped in later."""
    import shutil

    from decision_tree_stuff_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        stream_tumbling_counts,
    )

    d = tmp_path / "events_watch"
    d.mkdir()
    stream = read_events_stream(spark, str(d))  # must not raise
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    q = run_stream_to_memory(
        stream_tumbling_counts(stream), "empty_dir_events", mode="complete"
    )
    try:
        assert spark.table("empty_dir_events").count() > 0
    finally:
        q.stop()


def test_stream_ingest_dedup_composition(spark, docs, tmp_path):
    """The full ingest-dedup shape in ONE streaming query: new docs
    arrive with internal duplicates; the pipeline drops corpus-known
    docs (stream-static LEFT ANTI on the materialized fingerprint
    table) and collapses within-stream duplicates (stateful
    dropDuplicates on the same fingerprint). Survivor fingerprint set
    must equal the batch computation's."""
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.functions.text import fingerprint
    from decision_tree_stuff_spark.operators.dedup import (
        corpus_fingerprints,
        dedup_against_corpus,
    )
    from decision_tree_stuff_spark.streaming import run_stream_to_memory

    corpus = docs.where(F.col("doc_id") % 2 == 0)
    odd = docs.where(F.col("doc_id") % 2 == 1)
    # duplicate a third of the new batch under fresh ids
    dupes = odd.where(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    new_batch = odd.union(dupes)

    d = tmp_path / "ingest_dedup_stream"
    new_batch.write.parquet(str(d))
    fp = corpus_fingerprints(corpus).cache()

    stream = (
        spark.readStream.schema(new_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    survivors = (
        dedup_against_corpus(stream, fp, mode="exact", corpus_precomputed=True)
        .withColumn("fp", fingerprint(F.col("text")))
        .dropDuplicates(["fp"])
    )
    q = run_stream_to_memory(survivors, "ingest_dedup", mode="append")
    try:
        got = {r.fp for r in spark.table("ingest_dedup").collect()}
        want = {
            r.fp
            for r in dedup_against_corpus(new_batch, corpus, mode="exact")
            .select(fingerprint(F.col("text")).alias("fp"))
            .distinct()
            .collect()
        }
        assert got == want and 0 < len(want) < new_batch.count()
    finally:
        q.stop()
        fp.unpersist()


def test_stream_pii_scrub_equals_batch(spark, docs, sf_dir, tmp_path):
    """scrub_documents is one stateless regexp projection, so the PII
    redaction pass runs unchanged on a streaming source (append mode,
    no state) — the shape of an ingest-time scrubbing gate. Planted
    PII rides along as an extra file so redactions actually fire."""
    import shutil

    from decision_tree_stuff_spark.operators.textstats import (
        scrub_documents,
    )
    from decision_tree_stuff_spark.streaming import run_stream_to_memory

    d = tmp_path / "scrub_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", d / "documents.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [10_000_001, 10_000_002],
                "text": ["mail bob@example.com from 10.0.0.1",
                         "ssn 123-45-6789"],
                "lang": ["en", "en"],
                "source": ["web", "web"],
                "n_chars": [34, 15],
            }
        ),
        str(d / "planted.parquet"),
    )

    stream = scrub_documents(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = run_stream_to_memory(stream, "pii_scrub_stream", mode="append")
    try:
        def rows(df):
            return sorted(tuple(r) for r in df.collect())

        got = rows(spark.table("pii_scrub_stream"))
        want = rows(scrub_documents(spark.read.parquet(str(d))))
        assert got == want and len(got) > 0
        by_id = {r[0]: r for r in got}
        assert by_id[10_000_001][1] == "mail <EMAIL> from <IP>"
        assert by_id[10_000_002][1:] == ("ssn <ID>", 0, 0, 1)
    finally:
        q.stop()
