"""Differential tests: the level-wise (PLANET) training plan must
produce trees byte-identical to the depth-first reference-parity fit —
same JSON, same predictions — across splitters, metrics, gates and
prune, on fixtures and on real parquet."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.dtree import DecisionTree, DecisionTreeParams
from decision_tree_stuff_spark.plans import fit_level_wise


def _assert_same_tree(spark_df, params, prune=False):
    dt = DecisionTree(params)
    dt.fit(spark_df, prune=prune)
    lw = fit_level_wise(params, spark_df, prune=prune)
    assert lw.dict()["nodes"] == dt.dict()["nodes"], (
        f"params={params}\ndepth-first: {dt.json()}\nlevel-wise:  {lw.json()}"
    )
    a = sorted(map(str, dt.transform(spark_df).collect()))
    b = sorted(map(str, lw.transform(spark_df).collect()))
    assert a == b


@pytest.mark.parametrize("method", ["midpoint", "median", "mean"])
@pytest.mark.parametrize("metric", ["entropy", "gini"])
def test_level_wise_matches_depth_first_hetero(heterodf, method, metric):
    _assert_same_tree(
        heterodf, DecisionTreeParams(["x_coord", "y_coord"], "color", method, metric)
    )


def test_level_wise_smalldf(smalldf):
    _assert_same_tree(smalldf, DecisionTreeParams([], "class", "mean", "entropy"))


def test_level_wise_gates_and_prune(spark):
    random.seed(7)
    rows = [
        (
            round(random.uniform(0, 10), 3),
            round(random.uniform(-5, 5), 3),
            round(random.uniform(0, 1), 3),
        )
        for _ in range(200)
    ]
    rows = [(a, b, c, int(a + b > 5)) for a, b, c in rows]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, class bigint")
    for params, prune in [
        (DecisionTreeParams([], "class", "mean", "entropy", max_depth=3), False),
        (DecisionTreeParams([], "class", "midpoint", "gini", max_depth=5), False),
        (DecisionTreeParams([], "class", "mean", "entropy", min_split_samples=40), False),
        (DecisionTreeParams([], "class", "mean", "entropy", min_split_entropy=0.4), False),
        (DecisionTreeParams([], "class", "median", "entropy", max_depth=4), True),
    ]:
        _assert_same_tree(df, params, prune=prune)


def test_level_wise_on_parquet(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        (F.col("l_discount") > 0.05).cast("bigint").alias("class"),
    )
    params = DecisionTreeParams([], "class", "mean", "entropy", max_depth=4)
    _assert_same_tree(li, params)


def test_level_wise_pure_input(spark):
    df = spark.createDataFrame([(1.0, 0), (2.0, 0)], "f double, class bigint")
    lw = fit_level_wise(DecisionTreeParams([]), df)
    from decision_tree_stuff_spark.dtree import LeafNode

    assert isinstance(lw.learned_tree, LeafNode) and lw.learned_tree.label == 0
