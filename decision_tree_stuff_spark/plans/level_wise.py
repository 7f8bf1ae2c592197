"""Level-wise (PLANET-style) tree training: one pass per DEPTH.

The reference's fit (and our depth-first port) recurses node by node
— ≥2 Spark jobs per internal node, O(2^depth) job submissions, each
re-filtering its parent's rows (reference dtree.py:203-254). At 100 TB
with a deep tree that is death by driver round-trips.

This plan trains every node of a level simultaneously over ONE frame
carrying a ``__node`` id column (root=1, left=2i, right=2i+1):

  per level — Job A: groupBy(__node) → per-node count, class-sum and
  per-feature candidate thresholds (all map-side combined);
  Job B: broadcast-join the tiny per-node threshold table, then
  groupBy(__node) → per-(node, feature) conditional side stats.
  The driver scores candidates (identical math/tie-breaks to
  splitting.score_all_splits_wide) and routes rows to child ids with
  one whole-stage-codegen'd projection. 2 jobs per LEVEL, no matter
  how many nodes the level has.

Semantics are bit-identical to the depth-first fit: each node's
computation depends only on its own row subset, and both paths use
the same per-node stats math (eval_py), gates (Q-4/Q-6), empty-side
guard (Q-2), unweighted scores (Q-1) and (metric, variable)
tie-breaks (Q-3) — verified by the differential test in
tests/test_level_wise.py.

When to use which (measured at sf0.1, local[32]): with the
depth-first plan's parallel sibling submission (dtree.py), depth-first
wins both local regimes (narrow 24-node/depth-8: 8.6s vs 24s;
wide 54-node/depth-6: 9.8s vs 19s) because each node's cached frame
shrinks as you descend while level-wise re-scans all active rows per
level. Level-wise's advantage is TOTAL JOB COUNT — O(depth) vs
O(2^depth) submissions — which matters on a busy shared cluster where
each job round-trip costs seconds and thread-parallel submission
saturates the scheduler queue; it is also the only plan whose driver
memory/thread footprint is independent of tree width.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from decision_tree_stuff_spark.dtree import (
    DecisionTree,
    DecisionTreeParams,
    DecisionNode,
    LeafNode,
    TreeNode,
    _majority_from_stats,
)
from decision_tree_stuff_spark.splitting import (
    EntropySplitMetric,
    chunked_groupby_agg_rows,
    resolve_method,
    resolve_metric,
    splittable_attributes,
)

NODE_COL = "__node"


def fit_level_wise(
    params: DecisionTreeParams, dataset: DataFrame, prune: bool = False
) -> DecisionTree:
    """Train a DecisionTree with the level-wise plan; returns a tree
    whose structure matches ``DecisionTree.fit`` exactly."""
    cls = params.class_column
    metric_cls = resolve_metric(params.split_metric)
    method_cls = resolve_method(params.splitting_method)
    attrs = splittable_attributes(dataset, cls, params.fit_feature_columns())
    spark = dataset.sparkSession

    splits: Dict[int, tuple] = {}      # node_id -> (attr, threshold)
    leaves: Dict[int, int] = {}        # node_id -> label
    majorities: Dict[int, int] = {}    # node_id -> majority label

    frame = dataset.select(*attrs, cls, F.lit(1).alias(NODE_COL)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    root_entropy = -float("inf")
    depth = 0
    # nodes whose (n, n1) are already known from the parent's Job B
    known_stats: Dict[int, tuple] = {}
    # the parent level's frame, released only AFTER the child frame
    # has materialized (r9): unpersisting it at reassignment time —
    # before anything has executed the child — evicted the blocks the
    # child's first job rebuilds from, so every level's Job A
    # recomputed the whole routing chain back to the original scan.
    # That is QUADRATIC in depth; measured at sf10/depth 6 it was the
    # difference between 94 s and linear-in-levels behavior.
    pending_release = None

    while True:
        # ---- Job A: per-node stats + candidate thresholds ----------
        extra = (
            [
                F.min(F.col(cls)).alias("__lo"),
                F.max(F.col(cls)).alias("__hi"),
                # interior values pass the min/max guard — count them
                F.count(F.when(~F.col(cls).isin(0, 1), F.lit(1))).alias(
                    "__bad"
                ),
            ]
            if depth == 0
            else []
        )
        # chunked past AGG_CHUNK_COLUMNS expressions (>1000-feature
        # frames) so every job stays inside whole-stage codegen; one
        # identical job otherwise
        stat_rows = list(
            chunked_groupby_agg_rows(
                frame,
                NODE_COL,
                [
                    F.count(F.lit(1)).alias("__n"),
                    F.sum(F.col(cls)).alias("__n1"),
                    *extra,
                    *[
                        method_cls.threshold_expr(F.col(a)).alias(f"__t{i}")
                        for i, a in enumerate(attrs)
                    ],
                ],
            ).values()
        )
        # Job A has executed -> the current frame's blocks are live;
        # the parent's blocks are now safe to drop
        if pending_release is not None:
            pending_release.unpersist()
            pending_release = None
        if not stat_rows:
            break
        if depth == 0:
            lo, hi = stat_rows[0]["__lo"], stat_rows[0]["__hi"]
            bad = stat_rows[0]["__bad"]
            if bad > 0 or not (lo in (0, 1) and hi in (0, 1)):
                raise ValueError(
                    f"class column {cls!r} must be binary {{0,1}}; "
                    f"found {bad} non-{{0,1}} values in [{lo}, {hi}]"
                )
            n0, n10 = int(stat_rows[0]["__n"]), int(stat_rows[0]["__n1"] or 0)
            root_entropy = EntropySplitMetric.eval_py(n10 / n0) if n0 else 0.0

        eligible: List[dict] = []
        for row in stat_rows:
            nid = row[NODE_COL]
            n = int(row["__n"])
            n1 = int(row["__n1"]) if row["__n1"] is not None else 0
            majority = _majority_from_stats(n, n1)
            majorities[nid] = majority
            # Q-4: gate entropy is always the entropy metric
            entropy = EntropySplitMetric.eval_py(n1 / n)
            if entropy == 0.0:
                leaves[nid] = majority
                continue
            # Q-6 stop order (depth `!=` gate; -1 ⇒ unlimited)
            if not (
                entropy >= params.min_split_entropy
                and n >= params.min_split_samples
                and depth != params.max_depth
            ):
                leaves[nid] = majority
                continue
            thresholds = {
                a: row[f"__t{i}"]
                for i, a in enumerate(attrs)
                if row[f"__t{i}"] is not None
            }
            if not thresholds:
                leaves[nid] = majority
                continue
            eligible.append(
                {"nid": nid, "majority": majority, "thresholds": thresholds}
            )

        if not eligible:
            break

        # ---- Job B: conditional side stats per (node, feature) -----
        # tiny per-node threshold table, broadcast-joined on __node
        thr_rows = [
            tuple([e["nid"]] + [float(e["thresholds"].get(a)) if e["thresholds"].get(a) is not None else None for a in attrs])
        for e in eligible]
        thr_schema = f"{NODE_COL} int, " + ", ".join(
            f"__thr_{i} double" for i in range(len(attrs))
        )
        thr_df = spark.createDataFrame(thr_rows, thr_schema)
        joined = frame.join(F.broadcast(thr_df), NODE_COL)

        aggs = []
        for i, a in enumerate(attrs):
            left = F.col(a) <= F.col(f"__thr_{i}")
            c = F.col(cls)
            aggs.append(F.avg(F.when(left, c)).alias(f"lp{i}"))
            aggs.append(F.avg(F.when(~left, c)).alias(f"rp{i}"))
            aggs.append(F.count(F.when(left, F.lit(1))).alias(f"ln{i}"))
            aggs.append(F.count(F.when(~left, F.lit(1))).alias(f"rn{i}"))
            aggs.append(F.sum(F.when(left, c)).alias(f"ls{i}"))
            aggs.append(F.sum(F.when(~left, c)).alias(f"rs{i}"))
        side_rows = chunked_groupby_agg_rows(joined, NODE_COL, aggs)

        # ---- driver: score candidates, pick best per node ----------
        new_known: Dict[int, tuple] = {}
        level_splits: Dict[int, tuple] = {}
        for e in eligible:
            nid = e["nid"]
            row = side_rows[nid]
            candidates: List[Dict[str, Any]] = []
            for i, a in enumerate(attrs):
                if a not in e["thresholds"]:
                    continue
                lp = row[f"lp{i}"] if row[f"lp{i}"] is not None else 0.0
                rp = row[f"rp{i}"] if row[f"rp{i}"] is not None else 0.0
                score = metric_cls.eval_py(lp) + metric_cls.eval_py(rp)
                if math.isnan(score):
                    score = 0.0
                candidates.append(
                    {
                        "variable": a,
                        "threshold": e["thresholds"][a],
                        "metric": score,
                        "left_n": row[f"ln{i}"],
                        "right_n": row[f"rn{i}"],
                        "left_s": row[f"ls{i}"] if row[f"ls{i}"] is not None else 0,
                        "right_s": row[f"rs{i}"] if row[f"rs{i}"] is not None else 0,
                    }
                )
            sign = 1.0 if metric_cls.seek_minimum else -1.0
            candidates.sort(key=lambda c: (sign * c["metric"], c["variable"]))
            best = candidates[0]
            # Q-2 empty-side guard → stay a majority leaf
            if min(best["left_n"], best["right_n"]) == 0:
                leaves[nid] = e["majority"]
                continue
            level_splits[nid] = (best["variable"], best["threshold"])
            splits[nid] = (best["variable"], best["threshold"])
            new_known[2 * nid] = (int(best["left_n"]), int(best["left_s"]))
            new_known[2 * nid + 1] = (int(best["right_n"]), int(best["right_s"]))

        if not level_splits:
            break

        # ---- route rows to child node ids (one codegen projection) -
        split_map_rows = [
            (nid, attr, float(thr)) for nid, (attr, thr) in level_splits.items()
        ]
        split_df = spark.createDataFrame(
            split_map_rows, f"{NODE_COL} int, __attr string, __thr double"
        )
        routed = frame.join(F.broadcast(split_df), NODE_COL)  # drops stopped nodes
        feature_value = None
        for a in attrs:
            feature_value = (
                F.when(F.col("__attr") == a, F.col(a))
                if feature_value is None
                else feature_value.when(F.col("__attr") == a, F.col(a))
            )
        child = (
            F.col(NODE_COL) * 2
            + F.when(feature_value <= F.col("__thr"), F.lit(0)).otherwise(F.lit(1))
        ).cast("int")
        pending_release, frame = frame, routed.select(
            *attrs, cls, child.alias(NODE_COL)
        ).persist(StorageLevel.MEMORY_AND_DISK)
        known_stats = new_known
        depth += 1

    frame.unpersist()
    if pending_release is not None:
        pending_release.unpersist()

    # ---- assemble the driver-side tree -----------------------------
    def build(nid: int) -> TreeNode:
        if nid in splits:
            attr, thr = splits[nid]
            node = DecisionNode(attr, thr)
            node.left = build(2 * nid)
            node.right = build(2 * nid + 1)
            return node
        label = leaves.get(nid)
        if label is None:
            # child known pure from parent's Job B stats
            n, n1 = known_stats.get(nid, (1, 0))
            label = _majority_from_stats(n, n1)
        return LeafNode(label, cls)

    root: TreeNode
    if not splits and not leaves:
        raise AssertionError("Cannot fit on an empty dataset")
    root = build(1)

    if prune:
        root = _prune(root, 1, majorities, cls)

    tree = DecisionTree(params)
    tree._root = root  # noqa: SLF001 — plans module is package-internal
    tree._entropy = root_entropy  # gate entropy of the full dataset (Q-4)
    return tree


def _prune(node: TreeNode, nid: int, majorities: Dict[int, int], cls: str) -> TreeNode:
    """Post-order collapse of uniform subtrees (Q-7) — identical
    fixpoint to the reference's in-recursion prune."""
    if isinstance(node, LeafNode):
        return node
    assert isinstance(node, DecisionNode)
    node.left = _prune(node.left, 2 * nid, majorities, cls)
    node.right = _prune(node.right, 2 * nid + 1, majorities, cls)

    def leaf_set(t: TreeNode) -> set:
        if isinstance(t, LeafNode):
            return {t.label}
        return leaf_set(t.left) | leaf_set(t.right)

    if len(leaf_set(node)) == 1:
        return LeafNode(majorities.get(nid, next(iter(leaf_set(node)))), cls)
    return node
