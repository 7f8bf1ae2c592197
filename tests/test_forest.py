"""Bagged decision forest (forest.py): deterministic bagging,
majority-vote semantics, single-projection inference plan, serde."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from decision_tree_stuff_spark import (
    DecisionForest,
    DecisionTreeParams,
    ForestParams,
)
from decision_tree_stuff_spark.dtree import DecisionTree, LeafNode


def _labeled(spark, n=600):
    """Separable by x > 50 with two noisy features."""
    rows = [
        (i, float(i % 100), float((i * 37) % 100), int(i % 100 > 50))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "row_id bigint, x double, noise double, class bigint"
    )


def _params(n_trees=5):
    return ForestParams(
        DecisionTreeParams([], "class", "mean", "entropy", max_depth=4),
        n_trees=n_trees,
        sample_rate=0.7,
        seed="t",
    )


def test_forest_fits_and_classifies_separable_data(spark):
    df = _labeled(spark)
    forest = DecisionForest(_params())
    forest.fit(df.select("x", "noise", "class"), key_cols=["x", "noise"])
    assert len(forest.trees) == 5
    acc = (
        forest.transform(df)
        .agg(F.avg((F.col("prediction") == F.col("class")).cast("double")))
        .first()[0]
    )
    # deterministic bags + deterministic fit -> this exact value is
    # stable (0.97 measured); the floor guards against vote breakage
    # without demanding a depth-4 tree nail the boundary on every bag
    assert acc >= 0.95
    assert dict(forest.transform(df).dtypes)["prediction"] == "tinyint"


def test_forest_fit_is_deterministic(spark):
    df = _labeled(spark).select("x", "noise", "class")
    a = DecisionForest(_params())
    a.fit(df, key_cols=["x", "noise"])
    b = DecisionForest(_params())
    b.fit(df, key_cols=["x", "noise"])
    assert a.dict() == b.dict()
    # different seed -> different bags -> (almost surely) different forest
    c = DecisionForest(_params()._replace(seed="u"))
    c.fit(df, key_cols=["x", "noise"])
    assert c.dict() != a.dict()


def test_majority_vote_ties_go_to_zero(spark):
    """Hand-built even forest split 2-2 must predict 0 (the smaller
    label — same tie rule as get_majority)."""
    ones = DecisionTree(
        DecisionTreeParams([], "class", "mean", "entropy"),
        LeafNode(1),
        0,
    )
    zeros = DecisionTree(
        DecisionTreeParams([], "class", "mean", "entropy"),
        LeafNode(0),
        0,
    )
    forest = DecisionForest(_params(4), [ones, ones, zeros, zeros])
    df = spark.range(3)
    assert [r.prediction for r in forest.classify(df).collect()] == [0, 0, 0]
    # 3-1 majority of ones wins
    forest2 = DecisionForest(_params(4), [ones, ones, ones, zeros])
    assert [r.prediction for r in forest2.classify(df).collect()] == [1, 1, 1]


def test_forest_inference_is_single_shuffle_free_projection(spark):
    df = _labeled(spark).select("x", "noise", "class")
    forest = DecisionForest(_params(3))
    forest.fit(df, key_cols=["x", "noise"])
    plan = (
        forest.transform(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, "forest inference must not shuffle"
    assert plan.count("Project") <= 2


def test_forest_serde_round_trip(spark):
    df = _labeled(spark).select("x", "noise", "class")
    forest = DecisionForest(_params(3))
    forest.fit(df, key_cols=["x", "noise"])
    tmpf = tempfile.mktemp()
    forest.save_json(tmpf)
    back = DecisionForest.load_json(tmpf)
    assert back.dict() == forest.dict()
    assert json.loads(forest.json()) == forest.dict()
    got = {
        tuple(r)
        for r in back.transform(df).collect()
    }
    want = {
        tuple(r)
        for r in forest.transform(df).collect()
    }
    assert got == want


def test_forest_feature_importances_aggregate(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_quantity",
        "l_discount",
        (F.col("l_discount") > 0.05).cast("bigint").alias("class"),
    )
    forest = DecisionForest(
        ForestParams(
            DecisionTreeParams([], "class", "mean", "entropy", max_depth=3),
            n_trees=3,
            sample_rate=0.7,
            seed="imp",
        )
    )
    forest.fit(li, key_cols=["l_quantity", "l_discount"])
    imp = forest.feature_importances()
    assert imp and abs(sum(imp.values()) - 1.0) < 1e-12
    assert imp.get("l_discount", 0) > 0.9  # boundary feature dominates


def test_forest_transform_proba_soft_voting(spark):
    """Forest p1 = mean of member trees' empirical leaf probabilities
    (soft voting); on the clean boundary corpus every tree's leaves
    are pure, so the mean is exactly 0/1 and agrees with the majority
    vote."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_quantity",
        "l_discount",
        (F.col("l_discount") > 0.05).cast("bigint").alias("class"),
    )
    forest = DecisionForest(
        ForestParams(
            DecisionTreeParams([], "class", "mean", "entropy", max_depth=3),
            n_trees=3,
            sample_rate=0.7,
            seed="proba",
        )
    )
    forest.fit(li, key_cols=["l_quantity", "l_discount"])
    out = forest.transform_proba(li)
    rows = out.select("prediction", "p1").distinct().collect()
    # bagged trees learn slightly different boundaries, so leaves are
    # impure against the FULL frame: p1 is a genuine soft vote in
    # [0, 1], strongly aligned with the hard majority vote
    assert all(0.0 <= r["p1"] <= 1.0 for r in rows)
    assert all(r["prediction"] == 1 for r in rows if r["p1"] >= 0.8)
    assert all(r["prediction"] == 0 for r in rows if r["p1"] <= 0.2)
    # thresholding the soft vote recovers the label almost everywhere
    acc = out.where(
        "(CAST(p1 >= 0.5 AS INT)) = CAST(class AS INT)"
    ).count() / out.count()
    assert acc > 0.95, acc
