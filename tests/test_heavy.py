"""Exact two-pass heavy hitters (E-4hh): differential vs the exact
groupBy under adversarial partitionings, MG decrement mechanics,
guarantee edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.heavy import heavy_hitters


def _exact(rows, k):
    from collections import Counter

    c = Counter(rows)
    n = len(rows)
    return {key: v for key, v in c.items() if v * (k + 1) > n}


# skewed stream: a few heavies + a long tail of near-singletons
ROWS = (
    ["heavy_a"] * 400
    + ["heavy_b"] * 250
    + ["mid"] * 90
    + [f"tail{i}" for i in range(260)]
)


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_matches_exact_counts_any_partitioning(spark, parts):
    df = spark.createDataFrame([(r,) for r in ROWS], "tok string").repartition(
        parts
    )
    for k in (3, 9):
        got = {r["tok"]: r["cnt"] for r in heavy_hitters(df, "tok", k=k).collect()}
        assert got == _exact(ROWS, k), (parts, k)


def test_decrements_cannot_evict_true_heavy(spark):
    # k=1: the single counter is decremented constantly by the tail,
    # but the majority item (> n/2) must still be found with its
    # exact count — the Boyer-Moore special case of MG
    rows = ["maj"] * 600 + [f"t{i}" for i in range(599)]
    df = spark.createDataFrame([(r,) for r in rows], "tok string").repartition(7)
    got = {r["tok"]: r["cnt"] for r in heavy_hitters(df, "tok", k=1).collect()}
    assert got == {"maj": 600}


def test_no_heavy_hitters_is_empty(spark):
    rows = [f"u{i}" for i in range(100)]  # all singletons, k=9
    df = spark.createDataFrame([(r,) for r in rows], "tok string")
    assert heavy_hitters(df, "tok", k=9).count() == 0


def test_nulls_ignored_and_bigint_keys(spark):
    rows = [(1,)] * 10 + [(2,)] * 2 + [(None,)] * 50
    df = spark.createDataFrame(rows, "v long")
    got = {r["v"]: r["cnt"] for r in heavy_hitters(df, "v", k=2).collect()}
    # n=12 non-null items; share > 1/3 -> only key 1 (10/12)
    assert got == {1: 10}


def test_k_validation(spark):
    df = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "tok", k=0)
