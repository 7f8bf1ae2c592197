"""Bagged decision forest — an ensemble extension over the core tree.

Beyond the reference (its model is a single tree; SURVEY.md §2.2) but
a natural one for this engine: bagging is embarrassingly parallel and
every piece already exists Spark-first.

Design, in the shapes that survive 100 TB:

* **Bagging via deterministic hash sampling**, not ``df.sample``:
  each tree trains on ``deterministic_sample(df, rate, keys,
  seed=f"{seed}|{i}")`` — a shuffle-free md5-threshold filter pushed
  into the scan, stable under task retries and identical on reruns
  (operators/sampling.py rationale). No RNG state anywhere.
* **Trees fit concurrently from the driver**: independent jobs on
  independent sampled frames — the same scheduler-level parallelism
  the sibling-subtree fits already use (``dtree.py`` fit), bounded by
  a thread pool so a wide forest cannot stampede the driver.
* **Inference is ONE projection**: each learned tree compiles to its
  nested CASE WHEN expression; the majority vote is
  ``sum(tree_i(x)) * 2 > n`` — still a single narrow whole-stage
  codegen'd stage, zero shuffles, same plan class the single-tree
  ``transform`` pins in tests/test_plans.py. (Binary labels {0, 1}
  per the reference's classifier contract; ties at n/2 go to 0, the
  smaller label, matching ``get_majority``'s tie rule.)
* Serde: a JSON list of the trees' reference-format dicts.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from typing import List, NamedTuple, Optional

from pyspark.sql import Column, DataFrame, functions as F

from decision_tree_stuff_spark.dtree import (
    PREDICTION_TYPE,
    DecisionTree,
    DecisionTreeParams,
)
from decision_tree_stuff_spark.operators.sampling import deterministic_sample


class ForestParams(NamedTuple):
    tree_params: DecisionTreeParams
    n_trees: int = 5
    sample_rate: float = 0.7
    seed: str = "forest"
    #: driver-side concurrency for tree fits (each fit is itself a
    #: sequence of Spark jobs; 4 concurrent fits saturate a local
    #: scheduler without starving sibling-subtree threads)
    max_parallel_fits: int = 4


class DecisionForest:
    """Bagged ensemble of ``DecisionTree``s with majority-vote
    inference compiled to a single expression."""

    def __init__(
        self, params: ForestParams, trees: Optional[List[DecisionTree]] = None
    ):
        self._params = params
        self._trees: List[DecisionTree] = trees or []

    @property
    def trees(self) -> List[DecisionTree]:
        return self._trees

    # -- training ------------------------------------------------------

    def fit(self, dataset: DataFrame, key_cols: Optional[List[str]] = None) -> None:
        """Fit ``n_trees`` trees on deterministic bagged subsets.

        ``key_cols``: columns identifying a row for the hash sampler
        (default: every feature column — adequate when rows are
        near-unique; pass an id column when available). The sampled
        frame for tree i is a pure function of (seed, i, row), so a
        re-fit reproduces the forest exactly.
        """
        p = self._params
        keys = key_cols or [
            c
            for c in dataset.columns
            if c != p.tree_params.class_column
        ]

        def fit_one(i: int) -> DecisionTree:
            subset = deterministic_sample(
                dataset, p.sample_rate, keys, seed=f"{p.seed}|{i}"
            )
            t = DecisionTree(p.tree_params)
            t.fit(subset)
            return t

        with ThreadPoolExecutor(max_workers=p.max_parallel_fits) as ex:
            self._trees = list(ex.map(fit_one, range(p.n_trees)))

    # -- inference -----------------------------------------------------

    def prediction_expr(self) -> Column:
        """Majority vote over the trees' fused expressions, as one
        Column: sum of {0,1} votes, 1 iff strictly more than half.
        Single projection — no joins, no shuffles, no per-tree passes.
        """
        assert self._trees, "fit (or load) the forest first"
        votes = sum(
            (t.prediction_expr().cast("int") for t in self._trees),
            F.lit(0),
        )
        n = len(self._trees)
        return (
            (votes * 2 > F.lit(n)).cast(PREDICTION_TYPE).alias("prediction")
        )

    def classify(self, samples: DataFrame) -> DataFrame:
        return samples.select(self.prediction_expr())

    def transform(self, dataset: DataFrame) -> DataFrame:
        return dataset.withColumn("prediction", self.prediction_expr())

    def transform_proba(
        self, dataset: DataFrame, stats_from: Optional[DataFrame] = None
    ) -> DataFrame:
        """Input + ``prediction`` (majority vote, unchanged) + ``p1``
        (mean of the member trees' empirical leaf probabilities — the
        standard soft-voting ensemble probability). One bounded
        leaf-stats aggregation per tree against ``stats_from``
        (default: ``dataset``); scoring averages the per-tree literal
        CASEs in a single shuffle-free projection."""
        assert self._trees, "fit (or load) the forest first"
        src = dataset if stats_from is None else stats_from
        total = None
        for t in self._trees:
            p = t.p1_expr(src)
            total = p if total is None else total + p
        mean_p1 = F.round(total / F.lit(len(self._trees)), 6)
        return self.transform(dataset).withColumn("p1", mean_p1)

    def feature_importances(self, weighting: str = "count") -> dict:
        """Mean of the member trees' split-based importances (absent
        features contribute 0), re-normalized to sum 1 — the standard
        bagged-ensemble aggregation. Driver-side, zero Spark jobs."""
        assert self._trees, "fit (or load) the forest first"
        acc: dict = {}
        for t in self._trees:
            for k, v in t.feature_importances(weighting).items():
                acc[k] = acc.get(k, 0.0) + v
        total = sum(acc.values())
        if total == 0:
            return {}
        return {k: v / total for k, v in sorted(acc.items())}

    # -- serde ---------------------------------------------------------

    def dict(self) -> dict:
        return {
            "params": {
                "n_trees": self._params.n_trees,
                "sample_rate": self._params.sample_rate,
                "seed": self._params.seed,
            },
            "trees": [t.dict() for t in self._trees],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "DecisionForest":
        trees = [DecisionTree.from_dict(td) for td in d["trees"]]
        tp = trees[0]._params if trees else DecisionTreeParams([])
        return cls(
            ForestParams(
                tree_params=tp,
                n_trees=d["params"]["n_trees"],
                sample_rate=d["params"]["sample_rate"],
                seed=d["params"]["seed"],
            ),
            trees,
        )

    def json(self, indent: Optional[int] = None) -> str:
        return json.dumps(self.dict(), indent=indent)

    def save_json(self, filepath: str) -> None:
        with open(filepath, "w") as f:
            f.write(self.json(indent=4))

    @classmethod
    def load_json(cls, filepath: str) -> "DecisionForest":
        with open(filepath) as f:
            return cls.from_dict(json.loads(f.read()))
