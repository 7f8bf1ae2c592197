"""RegressionTree: hand math, pure-Python differential, stop rules,
fused-inference plan, serde round trip."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.regression_tree import (
    RegressionTree,
    _round_away,
)


def _py_fit(rows, target, attrs, max_depth, min_samples=2, depth=0):
    """Driver-side reference: identical rules, plain Python."""
    ys = [r[target] for r in rows]
    n = len(ys)
    leaf = {"value": _round_away(sum(ys) / n, 6)}
    if min(ys) == max(ys) or depth == max_depth or n < min_samples:
        return leaf
    cands = []
    for a in attrs:
        thr = sum(r[a] for r in rows) / n
        l = [r[target] for r in rows if r[a] <= thr]
        r_ = [r[target] for r in rows if r[a] > thr]

        def sse(v):
            if not v:
                return 0.0
            s, q = sum(v), sum(x * x for x in v)
            return q - s * s / len(v)

        cands.append((sse(l) + sse(r_), a, thr, len(l), len(r_)))
    cands.sort(key=lambda c: (c[0], c[1]))
    score, a, thr, ln, rn = cands[0]
    if min(ln, rn) == 0:
        return leaf
    return {
        "variable": a,
        "threshold": thr,
        "left": _py_fit(
            [r for r in rows if r[a] <= thr],
            target, attrs, max_depth, min_samples, depth + 1,
        ),
        "right": _py_fit(
            [r for r in rows if r[a] > thr],
            target, attrs, max_depth, min_samples, depth + 1,
        ),
    }


def test_hand_math_single_split(spark):
    """4 points, one clean step in y along x: the root splits at
    mean(x) and the leaves carry each side's mean."""
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 10.0), (3.0, 20.0), (4.0, 20.0)],
        "x double, y double",
    )
    rt = RegressionTree("y", features=["x"], max_depth=1).fit(df)
    assert rt.tree_ == {
        "variable": "x",
        "threshold": 2.5,
        "left": {"value": 10.0},
        "right": {"value": 20.0},
    }
    got = {
        (r["x"], r["prediction"]) for r in rt.transform(df).collect()
    }
    assert got == {(1.0, 10.0), (2.0, 10.0), (3.0, 20.0), (4.0, 20.0)}


def test_tie_breaks_on_feature_name(spark):
    """Two identical features produce identical scores — the split
    must pick the lexicographically smaller name (Q-3 convention)."""
    df = spark.createDataFrame(
        [(1.0, 1.0, 5.0), (2.0, 2.0, 7.0), (3.0, 3.0, 9.0)],
        "b double, a double, y double",
    )
    rt = RegressionTree("y", features=["b", "a"], max_depth=1).fit(df)
    assert rt.tree_["variable"] == "a"


@pytest.mark.parametrize("seed,depth", [(0, 2), (1, 3), (2, 3)])
def test_differential_vs_pure_python(spark, seed, depth):
    """Random data, random tree depth: the distributed fit derives the
    exact tree (structure, thresholds, leaf values) the driver-side
    reference derives."""
    rng = random.Random(seed)
    rows = [
        {
            "u": rng.uniform(0, 10),
            "v": rng.uniform(-5, 5),
            "y": rng.uniform(0, 1),
        }
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(r["u"], r["v"], r["y"]) for r in rows],
        "u double, v double, y double",
    ).repartition(7)
    rt = RegressionTree("y", features=["u", "v"], max_depth=depth).fit(df)
    want = _py_fit(rows, "y", ["u", "v"], depth)

    def close(a, b):
        if set(a) != set(b):
            return False
        if "value" in a:
            return abs(a["value"] - b["value"]) < 1e-9
        return (
            a["variable"] == b["variable"]
            and abs(a["threshold"] - b["threshold"]) < 1e-9
            and close(a["left"], b["left"])
            and close(a["right"], b["right"])
        )

    assert close(rt.tree_, want), (rt.tree_, want)


def test_stops(spark):
    """Pure node → leaf; depth 0 → leaf; min_samples → leaf."""
    pure = spark.createDataFrame(
        [(1.0, 3.0), (2.0, 3.0)], "x double, y double"
    )
    assert RegressionTree("y", features=["x"]).fit(pure).tree_ == {
        "value": 3.0
    }
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0)], "x double, y double"
    )
    assert RegressionTree(
        "y", features=["x"], max_depth=0
    ).fit(df).tree_ == {"value": 1.5}
    assert RegressionTree(
        "y", features=["x"], min_samples=3
    ).fit(df).tree_ == {"value": 1.5}


def test_leaf_rounding_is_half_away(spark):
    """A mean landing exactly on a 5e-7 boundary rounds away from
    zero, matching F.round / DuckDB round."""
    df = spark.createDataFrame(
        [(1.0, 0.0000015), (2.0, 0.0000015)], "x double, y double"
    )
    rt = RegressionTree("y", features=["x"], max_depth=0).fit(df)
    assert rt.tree_ == {"value": 0.000002}
    assert _round_away(-0.0000015) == -0.000002


def test_inference_is_single_projection(spark, tmp_path):
    """The fused transform must stay one Project over the scan — no
    shuffle, no join (the family's O-11 plan pin)."""
    df = spark.createDataFrame(
        [(float(i), float(i % 5), float(i % 3)) for i in range(100)],
        "x double, z double, y double",
    )
    path = str(tmp_path / "rt.parquet")
    df.write.parquet(path)
    src = spark.read.parquet(path)
    rt = RegressionTree("y", features=["x", "z"], max_depth=2).fit(src)
    plan = (
        rt.transform(src)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan, plan


def _py_gbt(rows, target, attrs, n_trees, lr, depth):
    n = len(rows)
    base = _round_away(sum(r[target] for r in rows) / n, 6)
    fhat = {i: base for i in range(n)}
    trees = []

    def predict(tree, r):
        while "value" not in tree:
            tree = (
                tree["left"]
                if r[tree["variable"]] <= tree["threshold"]
                else tree["right"]
            )
        return tree["value"]

    for _ in range(n_trees):
        staged = [
            dict(r, __res=r[target] - fhat[i]) for i, r in enumerate(rows)
        ]
        t = _py_fit(staged, "__res", attrs, depth)
        trees.append(t)
        fhat = {
            i: fhat[i] + lr * predict(t, r) for i, r in enumerate(rows)
        }
    return base, trees, fhat


def test_gbt_differential_vs_pure_python(spark):
    """3-stage boosting on random data matches the driver-side
    reference: same base, same stage trees, same final predictions."""
    rng = random.Random(11)
    rows = [
        {"u": rng.uniform(0, 10), "v": rng.uniform(-3, 3),
         "y": rng.uniform(0, 1)}
        for _ in range(150)
    ]
    df = spark.createDataFrame(
        [(r["u"], r["v"], r["y"]) for r in rows], "u double, v double, y double"
    ).repartition(5)
    from decision_tree_stuff_spark.operators.regression_tree import (
        GradientBoostedTrees,
    )

    gbt = GradientBoostedTrees(
        "y", features=["u", "v"], n_trees=3, learning_rate=0.5, max_depth=2
    ).fit(df)
    base, trees, fhat = _py_gbt(rows, "y", ["u", "v"], 3, 0.5, 2)
    assert gbt.base_ == base
    assert len(gbt.trees_) == 3

    def close(a, b):
        if set(a) != set(b):
            return False
        if "value" in a:
            return abs(a["value"] - b["value"]) < 1e-9
        return (
            a["variable"] == b["variable"]
            and abs(a["threshold"] - b["threshold"]) < 1e-9
            and close(a["left"], b["left"])
            and close(a["right"], b["right"])
        )

    for got, want in zip(gbt.trees_, trees):
        assert close(got.tree_, want), (got.tree_, want)


def test_gbt_training_loss_decreases(spark):
    """Each added stage must not increase squared training error —
    Friedman's monotone-loss property under lr<=1 (checked on data
    with real structure)."""
    df = spark.createDataFrame(
        [(float(i), float(i % 7), float((i % 7) * 2 + (i % 3)))
         for i in range(300)],
        "a double, b double, y double",
    )
    from decision_tree_stuff_spark.operators.regression_tree import (
        GradientBoostedTrees,
    )

    losses = []
    for n in (1, 2, 4):
        gbt = GradientBoostedTrees(
            "y", features=["a", "b"], n_trees=n, learning_rate=0.5,
            max_depth=2,
        ).fit(df)
        loss = (
            gbt.transform(df)
            .agg(F.avg(F.pow(F.col("y") - F.col("prediction"), 2)))
            .first()[0]
        )
        losses.append(loss)
    assert losses[0] >= losses[1] >= losses[2]
    assert losses[2] < losses[0]


def test_gbt_inference_is_single_projection(spark, tmp_path):
    df = spark.createDataFrame(
        [(float(i), float(i % 4)) for i in range(80)], "x double, y double"
    )
    path = str(tmp_path / "gbt.parquet")
    df.write.parquet(path)
    src = spark.read.parquet(path)
    from decision_tree_stuff_spark.operators.regression_tree import (
        GradientBoostedTrees,
    )

    gbt = GradientBoostedTrees(
        "y", features=["x"], n_trees=2, max_depth=1
    ).fit(src)
    plan = (
        gbt.transform(src)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_gbt_serde_round_trip(spark):
    df = spark.createDataFrame(
        [(float(i), math.cos(i)) for i in range(60)], "x double, y double"
    )
    from decision_tree_stuff_spark.operators.regression_tree import (
        GradientBoostedTrees,
    )

    gbt = GradientBoostedTrees(
        "y", features=["x"], n_trees=2, max_depth=1
    ).fit(df)
    back = GradientBoostedTrees.from_json(gbt.to_json())
    assert back.to_dict() == gbt.to_dict()
    a = sorted(r["prediction"] for r in gbt.transform(df).collect())
    b = sorted(r["prediction"] for r in back.transform(df).collect())
    assert a == b


def test_serde_round_trip(spark):
    df = spark.createDataFrame(
        [(float(i), math.sin(i)) for i in range(50)], "x double, y double"
    )
    rt = RegressionTree("y", features=["x"], max_depth=2).fit(df)
    back = RegressionTree.from_json(rt.to_json())
    assert back.to_dict() == rt.to_dict()
    a = sorted(r["prediction"] for r in rt.transform(df).collect())
    b = sorted(r["prediction"] for r in back.transform(df).collect())
    assert a == b
