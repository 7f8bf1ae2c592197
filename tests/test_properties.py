"""Property-based + differential tests (SURVEY.md §5 strategy (c)/(d)).

A pure-Python reimplementation of the reference fit semantics
(Q-1..Q-6 + our deterministic tie-breaks) serves as the oracle;
Hypothesis generates small frames on a 0.25 grid so every sum/mean is
exact in binary floating point — partial-aggregation order then can't
produce ulp drift and tree equality is exact, not approximate.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from decision_tree_stuff_spark.dtree import (
    DecisionNode,
    DecisionTree,
    DecisionTreeParams,
    LeafNode,
)
from decision_tree_stuff_spark.splitting import resolve_metric

# ---------------------------------------------------------------------
# Pure-Python oracle for fit (reference semantics, deterministic ties)
# ---------------------------------------------------------------------


def _py_threshold(vals, method):
    s = sorted(vals)
    if method == "mean":
        return sum(s) / len(s)
    if method == "midpoint":
        return (min(s) + max(s)) / 2.0
    if method == "median":
        h = (len(s) - 1) * 0.5
        lo = int(math.floor(h))
        if lo + 1 >= len(s):
            return float(s[lo])
        return s[lo] + (s[lo + 1] - s[lo]) * (h - lo)
    raise AssertionError(method)


def _py_entropy(p1):
    if p1 <= 0.0 or p1 >= 1.0:
        return 0.0
    p0 = 1.0 - p1
    return -p0 * math.log2(p0) - p1 * math.log2(p1)


def py_fit(rows, feats, cls, method, metric, params, depth=0):
    """Returns a nested ('leaf', label) / ('split', attr, thr, l, r)."""
    metric_cls = resolve_metric(metric)
    n = len(rows)
    n1 = sum(r[cls] for r in rows)
    majority = 1 if 2 * n1 > n else 0
    entropy = _py_entropy(n1 / n)
    if entropy == 0.0:
        return ("leaf", majority)
    if not (
        entropy >= params.min_split_entropy
        and n >= params.min_split_samples
        and depth != params.max_depth
    ):
        return ("leaf", majority)
    candidates = []
    for a in sorted(feats):
        thr = _py_threshold([r[a] for r in rows], method)
        left = [r for r in rows if r[a] <= thr]
        right = [r for r in rows if r[a] > thr]
        lp = (sum(r[cls] for r in left) / len(left)) if left else 0.0
        rp = (sum(r[cls] for r in right) / len(right)) if right else 0.0
        score = metric_cls.eval_py(lp) + metric_cls.eval_py(rp)
        if math.isnan(score):
            score = 0.0
        candidates.append((score, a, thr, left, right))
    sign = 1.0 if metric_cls.seek_minimum else -1.0
    candidates.sort(key=lambda c: (sign * c[0], c[1]))
    _, attr, thr, left, right = candidates[0]
    if not left or not right:
        return ("leaf", majority)
    return (
        "split",
        attr,
        thr,
        py_fit(left, feats, cls, method, metric, params, depth + 1),
        py_fit(right, feats, cls, method, metric, params, depth + 1),
    )


def _tree_equal(node, py):
    if isinstance(node, LeafNode):
        return py[0] == "leaf" and py[1] == node.label
    assert isinstance(node, DecisionNode)
    return (
        py[0] == "split"
        and py[1] == node.attribute
        and py[2] == node.threshold
        and _tree_equal(node.left, py[3])
        and _tree_equal(node.right, py[4])
    )


# grid values are exact in binary fp → sums exact under any order
grid = st.integers(min_value=-8, max_value=8).map(lambda i: i * 0.25)


@st.composite
def frames(draw):
    k = draw(st.integers(1, 3))
    n = draw(st.integers(2, 12))
    feats = [f"f{i}" for i in range(k)]
    rows = [
        {**{a: draw(grid) for a in feats}, "class": draw(st.integers(0, 1))}
        for _ in range(n)
    ]
    return feats, rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=frames(),
    method=st.sampled_from(["mean", "midpoint", "median"]),
    metric=st.sampled_from(["entropy", "gini"]),
    max_depth=st.sampled_from([-1, 1, 2]),
)
def test_fit_matches_python_oracle(spark, data, method, metric, max_depth):
    feats, rows = data
    params = DecisionTreeParams(feats, "class", method, metric, max_depth=max_depth)
    df = spark.createDataFrame(
        [tuple(r[a] for a in feats) + (r["class"],) for r in rows],
        ", ".join(f"{a} double" for a in feats) + ", class bigint",
    )
    dt = DecisionTree(params)
    dt.fit(df)
    py = py_fit(rows, feats, "class", method, metric, params)
    assert _tree_equal(dt.learned_tree, py), (
        f"\nspark: {dt.json()}\npy:    {py}\nrows: {rows}"
    )

    # invariants on the same fit
    preds = [r["prediction"] for r in dt.transform(df).collect()]
    assert set(preds) <= {0, 1}
    assert DecisionTree.from_dict(dt.dict()).dict() == dt.dict()

    def depth_of(node):
        if isinstance(node, LeafNode):
            return 0
        return 1 + max(depth_of(node.left), depth_of(node.right))

    if max_depth >= 0:
        assert depth_of(dt.learned_tree) <= max_depth


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=frames())
def test_prune_leaves_no_uniform_subtree(spark, data):
    feats, rows = data
    params = DecisionTreeParams(feats, "class", "mean", "entropy")
    df = spark.createDataFrame(
        [tuple(r[a] for a in feats) + (r["class"],) for r in rows],
        ", ".join(f"{a} double" for a in feats) + ", class bigint",
    )
    dt = DecisionTree(params)
    dt.fit(df, prune=True)

    def leafset(node):
        if isinstance(node, LeafNode):
            return {node.label}
        return leafset(node.left) | leafset(node.right)

    def check(node):
        if isinstance(node, LeafNode):
            return
        assert len(leafset(node)) > 1, "prune left a uniform subtree"
        check(node.left)
        check(node.right)

    check(dt.learned_tree)


def test_pure_node_single_leaf(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 1), (3.0, 1)], "f double, class bigint")
    dt = DecisionTree(DecisionTreeParams(["f"]))
    dt.fit(df)
    assert isinstance(dt.learned_tree, LeafNode) and dt.learned_tree.label == 1


def test_non_binary_labels_rejected(spark):
    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 2), (3.0, 1)], "f double, class bigint"
    )
    dt = DecisionTree(DecisionTreeParams(["f"]))
    try:
        dt.fit(df)
        raise AssertionError("expected ValueError for non-binary labels")
    except ValueError as e:
        assert "binary" in str(e)


def py_prune(tree):
    """Post-order uniform-subtree collapse on the python-oracle tree
    (Q-7). The collapsed label equals the uniform leaf label, which is
    necessarily the node's majority."""
    if tree[0] == "leaf":
        return tree

    left = py_prune(tree[3])
    right = py_prune(tree[4])

    def leafset(t):
        if t[0] == "leaf":
            return {t[1]}
        return leafset(t[3]) | leafset(t[4])

    ls = leafset(("split", tree[1], tree[2], left, right))
    if len(ls) == 1:
        return ("leaf", next(iter(ls)))
    return ("split", tree[1], tree[2], left, right)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=frames(),
    method=st.sampled_from(["mean", "midpoint"]),
)
def test_prune_matches_python_oracle(spark, data, method):
    feats, rows = data
    params = DecisionTreeParams(feats, "class", method, "entropy")
    df = spark.createDataFrame(
        [tuple(r[a] for a in feats) + (r["class"],) for r in rows],
        ", ".join(f"{a} double" for a in feats) + ", class bigint",
    )
    dt = DecisionTree(params)
    dt.fit(df, prune=True)
    py = py_prune(py_fit(rows, feats, "class", method, "entropy", params))
    assert _tree_equal(dt.learned_tree, py), (
        f"\nspark: {dt.json()}\npy:    {py}\nrows: {rows}"
    )
