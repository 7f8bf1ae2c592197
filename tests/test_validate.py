"""Deequ-style validation suite (E-13): per-kind hand-math, null and
empty-input behavior, approx-distinct mode."""

from __future__ import annotations

import pytest

from decision_tree_stuff_spark.operators.validate import validate


@pytest.fixture(scope="module")
def vdf(spark):
    rows = [
        (0, "alpha beta", "en", 10),
        (1, "gamma delta", "en", 20),
        (2, "epsilon", "de", 30),
        (3, None, "fr", 40),          # null text
        (4, "zeta eta", None, 5000),  # null lang, out-of-range chars
        (4, "theta", "en", 60),       # duplicate id
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )


def test_all_kinds_hand_math(vdf):
    suite = [
        {"check": "row_count_min", "min": 5},
        {"check": "completeness", "column": "text", "min": 0.9},
        {"check": "uniqueness", "column": "doc_id", "min": 1.0},
        {"check": "min_value", "column": "n_chars", "ge": 1},
        {"check": "max_value", "column": "n_chars", "le": 100},
        {"check": "in_set_fraction", "column": "lang",
         "values": ["en", "de"], "min": 0.5},
        {"check": "in_range_fraction", "column": "n_chars",
         "lo": 1, "hi": 100, "min": 0.9},
        {"check": "pattern_fraction", "column": "text",
         "pattern": "^[a-z ]+$", "min": 0.8},
    ]
    got = [tuple(r) for r in validate(vdf, suite).collect()]
    assert got == [
        ("row_count_min", None, 6.0, True),
        ("completeness", "text", round(5 / 6, 6), False),
        ("uniqueness", "doc_id", round(5 / 6, 6), False),
        ("min_value", "n_chars", 10.0, True),
        ("max_value", "n_chars", 5000.0, False),
        ("in_set_fraction", "lang", round(4 / 6, 6), True),
        ("in_range_fraction", "n_chars", round(5 / 6, 6), False),
        ("pattern_fraction", "text", round(5 / 6, 6), True),
    ]


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, lang string")
    got = [
        tuple(r)
        for r in validate(
            df,
            [
                {"check": "row_count_min", "min": 1},
                {"check": "completeness", "column": "lang", "min": 0.5},
                {"check": "min_value", "column": "doc_id", "ge": 0},
            ],
        ).collect()
    ]
    assert got == [
        ("row_count_min", None, 0.0, False),
        ("completeness", "lang", None, False),
        ("min_value", "doc_id", None, False),
    ]


def test_unknown_kind_and_empty_suite_raise(vdf):
    with pytest.raises(ValueError, match="unknown check"):
        validate(vdf, [{"check": "nope"}])
    with pytest.raises(ValueError, match="empty check suite"):
        validate(vdf, [])


def test_approx_distinct_mode(vdf):
    got = validate(
        vdf,
        [{"check": "uniqueness", "column": "doc_id", "min": 0.5}],
        approx_distinct=True,
    ).collect()[0]
    # HLL at n=5: near-exact; the check is that the mode runs and
    # lands in the right ballpark, not a fixed value
    assert 0.5 <= got["value"] <= 1.0
    assert got["passed"]


def test_stream_validate_equals_batch(spark, tmp_path_factory):
    """Drain a 3-micro-batch documents stream through the mergeable
    validation fold: the verdict frame equals batch validate() over
    the full input exactly, and only the newest snapshot
    (+ predecessor) is retained."""
    import os

    import pyarrow.parquet as pq

    from decision_tree_stuff_spark.streaming import (
        read_validation_state,
        stream_validate,
    )

    SF_DIR = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    suite = [
        {"check": "row_count_min", "min": 100},
        {"check": "completeness", "column": "text", "min": 1.0},
        {"check": "min_value", "column": "n_chars", "ge": 100},
        {"check": "max_value", "column": "n_chars", "le": 600},
        {"check": "in_set_fraction", "column": "lang",
         "values": ["en", "de", "es"], "min": 0.9},
        {"check": "in_range_fraction", "column": "n_chars",
         "lo": 100, "hi": 500, "min": 0.5},
        {"check": "pattern_fraction", "column": "text",
         "pattern": "^[a-z ]+$", "min": 0.99},
    ]

    d = tmp_path_factory.mktemp("val_stream_in")
    state = str(tmp_path_factory.mktemp("val_state"))
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    third = t.num_rows // 3
    for i in range(3):
        n = third if i < 2 else t.num_rows - 2 * third
        pq.write_table(t.slice(i * third, n), f"{d}/part{i}.parquet")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    stream_validate(stream, state, suite)

    from decision_tree_stuff_spark.operators.validate import validate

    got = [
        tuple(r) for r in read_validation_state(spark, state, suite).collect()
    ]
    want = [tuple(r) for r in validate(docs, suite).collect()]
    assert got == want
    versions = [v for v in os.listdir(state) if v.startswith("v")]
    assert len(versions) <= 2, versions


def test_stream_validate_rejects_uniqueness(spark, tmp_path_factory):
    from decision_tree_stuff_spark.operators.validate import compile_checks

    with pytest.raises(ValueError, match="not a mergeable metric"):
        compile_checks(
            [{"check": "uniqueness", "column": "doc_id", "min": 1.0}],
            mergeable_only=True,
        )
