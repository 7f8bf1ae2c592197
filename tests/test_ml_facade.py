"""MLlib facade + fit(strategy=) wiring tests."""

from __future__ import annotations

from pyspark.ml import Pipeline

from decision_tree_stuff_spark.dtree import DecisionTree, DecisionTreeParams
from decision_tree_stuff_spark.ml import (
    DecisionTreeStuffClassifier,
    DecisionTreeStuffModel,
)


def test_estimator_in_pipeline(heterodf, tmp_path):
    est = DecisionTreeStuffClassifier(
        classCol="color", splittingMethod="midpoint", splitMetric="entropy"
    )
    model = Pipeline(stages=[est]).fit(heterodf).stages[0]
    out = model.transform(heterodf)
    assert all(r["prediction"] == r["color"] for r in out.collect())

    p = str(tmp_path / "model.json")
    model.save_json(p)
    again = DecisionTreeStuffModel.load_json(p)
    assert again.tree.dict()["nodes"] == model.tree.dict()["nodes"]


def test_fit_strategy_level_wise_matches(heterodf):
    params = DecisionTreeParams(["x_coord", "y_coord"], "color", "midpoint", "entropy")
    a = DecisionTree(params)
    a.fit(heterodf)
    b = DecisionTree(params)
    b.fit(heterodf, strategy="level_wise")
    assert a.dict() == b.dict()


def test_estimator_level_wise_strategy(heterodf):
    est = DecisionTreeStuffClassifier(
        classCol="color", splittingMethod="midpoint", strategy="level_wise"
    )
    model = est.fit(heterodf)
    out = model.transform(heterodf)
    assert all(r["prediction"] == r["color"] for r in out.collect())


def test_forest_estimator_in_pipeline(heterodf, tmp_path):
    """Forest facade (r6): fits in a pyspark.ml Pipeline, votes
    correctly on separable data, JSON round-trips, and the fit is
    deterministic (hash bagging, no RNG state)."""
    from decision_tree_stuff_spark.ml import (
        DecisionForestClassifier,
        DecisionForestModel,
    )

    est = DecisionForestClassifier(
        classCol="color", splittingMethod="midpoint", nTrees=3,
        sampleRate=0.8, seed="t",
    )
    model = Pipeline(stages=[est]).fit(heterodf).stages[0]
    out = model.transform(heterodf)
    assert all(r["prediction"] == r["color"] for r in out.collect())

    p = str(tmp_path / "forest.json")
    model.save_json(p)
    again = DecisionForestModel.load_json(p)
    assert again.forest.dict() == model.forest.dict()

    model2 = est.fit(heterodf)
    assert model2.forest.dict() == model.forest.dict()
