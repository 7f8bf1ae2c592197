"""Source-format tests: CSV / JSONL readers must round-trip the
documents table exactly (explicit schema, FAILFAST — no inference
pass, no silent nulls) and fail loudly on malformed input."""

from __future__ import annotations

import pytest
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
