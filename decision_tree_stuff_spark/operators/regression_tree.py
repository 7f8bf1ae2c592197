"""CART regression tree — the variance-reduction member of the tree
family (E-12): same Spark-first induction shape as the reference-parity
classifier (`dtree.py` — two shuffle-free wide-aggregate jobs per
internal node, stats flowing down so stopped children cost zero jobs,
inference fused into ONE nested-CASE projection), but the split
criterion is within-node sum of squared errors and leaves predict the
node mean, so the target is any numeric column instead of a binary
class.

This is a beyond-reference extension (the reference,
/root/reference/decision_tree_stuff/dtree.py, is classification-only);
it exists because large-scale data-curation pipelines regress
continuous quality/score targets (LM logprob, click-through,
human-rating regressors) with exactly this machinery.

Scale notes (100 TB):

* Split search per node = 2 wide aggregates (thresholds, then 10
  conditional aggregates per feature) — map-side partial aggregation,
  no unpivot row explosion, no windows, no shuffle beyond the
  single-row agg exchange. Past ``AGG_CHUNK_COLUMNS`` expressions the
  passes chunk into several jobs (same 64KB-codegen guard as the
  classifier's wide path).
* SSE is computed from (count, sum, sum-of-squares) — a mergeable
  3-tuple, so the aggregate combines partially on the map side; no
  per-node variance pass.
* Inference is a single Project over the scan: zero shuffles, zero
  joins, whole-stage-codegen'd (same plan pin as the classifier).

Cross-engine determinism recipe (matches the k-means / logistic-gate
contract, queries.py): thresholds and scores use raw double
arithmetic in the identical expression shape on both engines (the
classification twin's measured-safe convention); leaf predictions —
the only floats that reach the output hash — are rounded
half-away-from-zero to 6dp (`F.round` / DuckDB `round` convention).
Purity stops compare exact min/max equality, never an epsilon.
"""

from __future__ import annotations

import json
import math
from typing import Any, Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from decision_tree_stuff_spark.splitting import (
    MethodOrStr,
    chunked_agg_row,
    resolve_method,
    splittable_attributes,
)


def _round_away(x: float, dp: int = 6) -> float:
    """Half-away-from-zero — the F.round / DuckDB convention (Python's
    builtin is half-even and diverges on boundary ties)."""
    q = 10**dp
    return math.floor(abs(x) * q + 0.5) / q * (1 if x >= 0 else -1)


def _sse(n: int, s: float, q: float) -> float:
    """Sum of squared errors about the mean from the mergeable
    (count, sum, sum-of-squares) triple: q - s*s/n. The same literal
    expression shape the DuckDB twin uses, so both engines walk the
    identical double ops."""
    if n <= 0:
        return 0.0
    return q - s * s / n


class RegressionTree:
    """Binary regression tree: splits minimize SSE(left) + SSE(right),
    leaves predict the node mean rounded to 6dp.

    Stopping rules, in the order they are checked (each mirrored
    verbatim by the ``rtree_fit_transform`` DuckDB twin):

    1. pure node — min(y) == max(y) exactly;
    2. depth == ``max_depth``;
    3. n < ``min_samples``;
    4. no candidate threshold (all-null feature) or the best split
       leaves one side empty.

    Ties in the split search break on (score, feature-name) ascending
    — the family's deterministic Q-3 convention.
    """

    def __init__(
        self,
        target: str,
        features: Optional[List[str]] = None,
        method: MethodOrStr = "mean",
        max_depth: int = 3,
        min_samples: int = 2,
    ) -> None:
        assert max_depth >= 0
        self.target = target
        self.features = features
        self.method = method
        self.max_depth = max_depth
        self.min_samples = min_samples
        self.tree_: Optional[Dict[str, Any]] = None

    # -- training ------------------------------------------------------

    def fit(self, df: DataFrame) -> "RegressionTree":
        y = F.col(self.target)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y).alias("s"),
            F.sum(y * y).alias("q"),
            F.min(y).alias("lo"),
            F.max(y).alias("hi"),
        ).first()
        if row["n"] == 0:
            raise ValueError("cannot fit a regression tree on 0 rows")
        attrs = (
            sorted(self.features)
            if self.features
            else splittable_attributes(df, self.target)
        )
        self.tree_ = self._fit_node(
            df,
            attrs,
            depth=0,
            n=int(row["n"]),
            s=float(row["s"]),
            q=float(row["q"]),
            lo=float(row["lo"]),
            hi=float(row["hi"]),
        )
        return self

    def _fit_node(
        self,
        df: DataFrame,
        attrs: List[str],
        depth: int,
        n: int,
        s: float,
        q: float,
        lo: float,
        hi: float,
    ) -> Dict[str, Any]:
        leaf = {"value": _round_away(s / n, 6)}
        if lo == hi or depth == self.max_depth or n < self.min_samples:
            return leaf

        from pyspark import StorageLevel

        cached_here = False
        if df.storageLevel == StorageLevel.NONE:
            df.persist(StorageLevel.MEMORY_AND_DISK)
            cached_here = True
        try:
            method_cls = resolve_method(self.method)
            thr_row = chunked_agg_row(
                df,
                [
                    method_cls.threshold_expr(F.col(a)).alias(f"t{i}")
                    for i, a in enumerate(attrs)
                ],
            )
            live = [
                (a, thr_row[f"t{i}"])
                for i, a in enumerate(attrs)
                if thr_row[f"t{i}"] is not None
            ]
            if not live:
                return leaf

            y = F.col(self.target)
            aggs: List[Column] = []
            for i, (a, thr) in enumerate(live):
                left = F.col(a) <= F.lit(thr)
                for tag, cond in (("l", left), ("r", ~left)):
                    aggs.append(
                        F.count(F.when(cond, F.lit(1))).alias(f"{tag}n{i}")
                    )
                    aggs.append(F.sum(F.when(cond, y)).alias(f"{tag}s{i}"))
                    aggs.append(
                        F.sum(F.when(cond, y * y)).alias(f"{tag}q{i}")
                    )
                    aggs.append(F.min(F.when(cond, y)).alias(f"{tag}lo{i}"))
                    aggs.append(F.max(F.when(cond, y)).alias(f"{tag}hi{i}"))
            row = chunked_agg_row(df, aggs)

            cands = []
            for i, (a, thr) in enumerate(live):
                stats = {
                    k: {
                        "n": int(row[f"{k}n{i}"]),
                        "s": float(row[f"{k}s{i}"] or 0.0),
                        "q": float(row[f"{k}q{i}"] or 0.0),
                        "lo": row[f"{k}lo{i}"],
                        "hi": row[f"{k}hi{i}"],
                    }
                    for k in ("l", "r")
                }
                score = _sse(
                    stats["l"]["n"], stats["l"]["s"], stats["l"]["q"]
                ) + _sse(stats["r"]["n"], stats["r"]["s"], stats["r"]["q"])
                cands.append((score, a, thr, stats))
            cands.sort(key=lambda c: (c[0], c[1]))
            score, a, thr, stats = cands[0]
            if min(stats["l"]["n"], stats["r"]["n"]) == 0:
                return leaf

            l_df = df.filter(F.col(a) <= F.lit(thr))
            r_df = df.filter(F.col(a) > F.lit(thr))
            return {
                "variable": a,
                "threshold": float(thr),
                "left": self._fit_node(
                    l_df,
                    attrs,
                    depth + 1,
                    stats["l"]["n"],
                    stats["l"]["s"],
                    stats["l"]["q"],
                    float(stats["l"]["lo"]),
                    float(stats["l"]["hi"]),
                ),
                "right": self._fit_node(
                    r_df,
                    attrs,
                    depth + 1,
                    stats["r"]["n"],
                    stats["r"]["s"],
                    stats["r"]["q"],
                    float(stats["r"]["lo"]),
                    float(stats["r"]["hi"]),
                ),
            }
        finally:
            if cached_here:
                df.unpersist()

    # -- inference -----------------------------------------------------

    def prediction_expr(self) -> Column:
        """The whole tree as ONE nested CASE expression — inference is
        a single shuffle-free Project over the scan, the family's O-11
        fused shape."""
        assert self.tree_ is not None, "fit() first"

        def walk(node: Dict[str, Any]) -> Column:
            if "value" in node:
                return F.lit(node["value"])
            return F.when(
                F.col(node["variable"]) <= F.lit(node["threshold"]),
                walk(node["left"]),
            ).otherwise(walk(node["right"]))

        return walk(self.tree_)

    def transform(
        self, df: DataFrame, output_col: str = "prediction"
    ) -> DataFrame:
        return df.withColumn(output_col, self.prediction_expr())

    # -- serde ---------------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        assert self.tree_ is not None, "fit() first"
        return {
            "target": self.target,
            "method": resolve_method(self.method).name,
            "max_depth": self.max_depth,
            "min_samples": self.min_samples,
            "tree": self.tree_,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "RegressionTree":
        rt = cls(
            d["target"],
            method=d["method"],
            max_depth=d["max_depth"],
            min_samples=d["min_samples"],
        )
        rt.tree_ = d["tree"]
        return rt

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "RegressionTree":
        return cls.from_dict(json.loads(s))


class GradientBoostedTrees:
    """Squared-error gradient boosting (Friedman 2001) over
    ``RegressionTree`` stages: F_0 = round(mean(y), 6); each stage
    fits the fixed-config tree to the CURRENT residual ``y - F_{m-1}``
    and advances ``F_m = F_{m-1} + lr * tree_m``.

    Spark-first shape: the residual is an EXPRESSION over the input
    frame (prior stages' trees are nested-CASE literals), never a
    materialized column of a shuffled intermediate — each stage's
    split search therefore runs the same two wide-aggregate passes per
    node directly over the source scan, and final inference is ONE
    fused projection summing all stages (zero shuffles, zero joins).

    Determinism contract (what makes the unrolled-CTE DuckDB twin
    exact): leaf values are 6dp half-away means; ``lr`` should be
    exactly representable (0.5, 0.25, ...); the additive chain is
    left-associated in both engines; the final prediction rounds to
    6dp.
    """

    def __init__(
        self,
        target: str,
        features: Optional[List[str]] = None,
        n_trees: int = 3,
        learning_rate: float = 0.5,
        max_depth: int = 2,
        min_samples: int = 2,
        method: MethodOrStr = "mean",
    ) -> None:
        assert n_trees >= 1
        self.target = target
        self.features = features
        self.n_trees = n_trees
        self.learning_rate = float(learning_rate)
        self.max_depth = max_depth
        self.min_samples = min_samples
        self.method = method
        self.base_: Optional[float] = None
        self.trees_: List[RegressionTree] = []

    def fit(self, df: DataFrame) -> "GradientBoostedTrees":
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col(self.target)).alias("s")
        ).first()
        if row["n"] == 0:
            raise ValueError("cannot fit GBT on 0 rows")
        self.base_ = _round_away(float(row["s"]) / int(row["n"]), 6)
        # resolve features against the ORIGINAL frame so neither the
        # target nor the staged residual column can become a split
        # candidate (a silent label leak otherwise)
        feats = self.features or splittable_attributes(df, self.target)
        self.trees_ = []
        cur: Column = F.lit(self.base_)
        for m in range(self.n_trees):
            residual = F.col(self.target) - cur
            staged = df.withColumn("__res", residual)
            tree = RegressionTree(
                "__res",
                features=feats,
                method=self.method,
                max_depth=self.max_depth,
                min_samples=self.min_samples,
            ).fit(staged)
            self.trees_.append(tree)
            cur = cur + F.lit(self.learning_rate) * tree.prediction_expr()
        return self

    def prediction_expr(self, dp: int = 6) -> Column:
        assert self.base_ is not None, "fit() first"
        cur: Column = F.lit(self.base_)
        for tree in self.trees_:
            cur = cur + F.lit(self.learning_rate) * tree.prediction_expr()
        return F.round(cur, dp)

    def transform(
        self, df: DataFrame, output_col: str = "prediction"
    ) -> DataFrame:
        return df.withColumn(output_col, self.prediction_expr())

    def to_dict(self) -> Dict[str, Any]:
        assert self.base_ is not None, "fit() first"
        return {
            "target": self.target,
            "n_trees": self.n_trees,
            "learning_rate": self.learning_rate,
            "max_depth": self.max_depth,
            "min_samples": self.min_samples,
            "method": resolve_method(self.method).name,
            "base": self.base_,
            "trees": [t.tree_ for t in self.trees_],
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "GradientBoostedTrees":
        gbt = cls(
            d["target"],
            n_trees=d["n_trees"],
            learning_rate=d["learning_rate"],
            max_depth=d["max_depth"],
            min_samples=d["min_samples"],
            method=d["method"],
        )
        gbt.base_ = d["base"]
        gbt.trees_ = []
        for t in d["trees"]:
            rt = RegressionTree(
                d["target"],
                method=d["method"],
                max_depth=d["max_depth"],
                min_samples=d["min_samples"],
            )
            rt.tree_ = t
            gbt.trees_.append(rt)
        return gbt

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "GradientBoostedTrees":
        return cls.from_dict(json.loads(s))
