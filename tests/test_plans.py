"""Physical-plan audits: assert the plans are the ones we designed
for scale, not just plans that produce correct rows.

These pin: pushdown reaching the parquet scan, column pruning,
shuffle-free inference, broadcast joins on dims, and top-k instead of
global sort — regressions here are silent at sf0.1 but fatal at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from decision_tree_stuff_spark.dtree import DecisionTree, DecisionTreeParams
from decision_tree_stuff_spark.queries import SPARK_QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_inference_is_single_shuffle_free_projection(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dt = DecisionTree.from_dict(
        {
            "params": {"feature_columns": [], "class_column": "class"},
            "depth": 0,
            "nodes": {
                "l_discount <= 0.05": {"class": 0},
                "l_discount > 0.05": {"class": 1},
            },
        }
    )
    plan = _plan(dt.transform(li))
    assert "Exchange" not in plan, "inference must not shuffle"
    # one codegen stage: every codegen'd operator is tagged *(1)
    assert "*(1) Project" in plan and "*(2)" not in plan, plan[:400]


def test_classify_prunes_scan_columns(spark, sf_dir):
    """classify projects only the prediction — the parquet scan must
    read just the tree's feature columns, not all 11."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dt = DecisionTree.from_dict(
        {
            "params": {"feature_columns": [], "class_column": "class"},
            "depth": 0,
            "nodes": {
                "l_discount <= 0.05": {"class": 0},
                "l_discount > 0.05": {"class": 1},
            },
        }
    )
    plan = _plan(dt.classify(li))
    assert "ReadSchema: struct<l_discount:double>" in plan, plan[-500:]


def test_filter_split_pushes_predicate_to_scan(spark, sf_dir):
    plan = _plan(SPARK_QUERIES["o01_filter_split"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_quantity), LessThanOrEqual(l_quantity," in plan


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(SPARK_QUERIES["rel_top_customers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dims must broadcast, not sort-merge"


def test_best_split_uses_top_k_not_global_sort(spark, sf_dir):
    plan = _plan(SPARK_QUERIES["o07_best_split"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "orderBy().limit(1) should plan top-k"


def test_topk_similarity_window_group_limit(spark, sf_dir):
    """Per-query top-k must push a group limit below the rank window
    (partial top-k per partition before the shuffle)."""
    plan = _plan(SPARK_QUERIES["e3_cosine_topk"](spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan[-800:]


def test_unpivot_reads_only_needed_columns(spark, sf_dir):
    plan = _plan(SPARK_QUERIES["o02_unpivot"](spark, sf_dir))
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,"
        "l_quantity:double,l_discount:double>" in plan
    )


def test_fit_jobs_are_bounded(spark, sf_dir):
    """Depth-first fit must cost exactly 2 jobs per internal node +
    1 root-stats job — no hidden actions."""
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_discount", "l_quantity",
        (F.col("l_discount") > 0.05).cast("bigint").alias("class"),
    )
    dt = DecisionTree(DecisionTreeParams([], "class", "mean", "entropy", max_depth=2))
    dt.fit(li)
    after = len(tracker.getJobIdsForGroup(None) or [])
    import json

    # each internal node serializes exactly one "attr <= thr" key
    n_internal = json.dumps(dt.dict()["nodes"]).count("<=")
    # driver ACTIONS: 1 root-stats + 2 per internal node + 2 per leaf
    # that attempted a split (≤ n_internal + 1 leaves). Under AQE one
    # action runs ~2-3 scheduler jobs (one per stage), hence the ×3.
    # The bound still catches per-row/per-partition action explosions.
    actions = 1 + 2 * n_internal + 2 * (n_internal + 1)
    assert after - before <= 3 * actions, (
        f"{after - before} jobs for {n_internal} internal nodes"
    )


def test_span_dedup_plan_shape(spark, sf_dir):
    """Span dedup: no cartesian product, the frequent-span side
    broadcasts (AQE or static), and the reconstruct join's base scan
    prunes to the id column (the original text never travels)."""
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(span_dedup(docs, n=10, min_docs=2))
    assert "CartesianProduct" not in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan, (
        "base side of the rebuild join must prune to the id column"
    )


def test_cap_per_group_window_group_limit(spark, sf_dir):
    """The row_number<=n filter must be planned as WindowGroupLimit so
    map tasks pre-prune each group before the exchange."""
    from decision_tree_stuff_spark.operators.sampling import cap_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    plan = _plan(cap_per_group(docs, ["lang"], 50, ["doc_id"]))
    assert "WindowGroupLimit" in plan


def test_semdedup_assignment_broadcasts_centroids(spark, sf_dir):
    """SemDeDup cell assignment must broadcast the centroid table —
    the corpus never shuffles to be assigned. (The later cid-equi
    self-join may shuffle; that one is bounded per cell.)"""
    from decision_tree_stuff_spark.operators.similarity import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(semdedup(emb, n_centroids=16, eps=0.4))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_pq_encode_is_shuffle_free_projection(spark, sf_dir):
    """pq_codes must be ONE narrow projection — the codebook rides as
    literals, no exchange, no join; and pq_topk's only exchange is the
    final per-query top-k (WindowGroupLimit-pruned)."""
    from decision_tree_stuff_spark.operators.similarity import (
        pq_codebook,
        pq_codes,
        pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    enc_plan = _plan(pq_codes(emb, pq_codebook(emb, 8, 16)))
    assert "Exchange" not in enc_plan and "Join" not in enc_plan
    topk_plan = _plan(pq_topk(emb, list(range(10)), k=5))
    assert "CartesianProduct" not in topk_plan
    assert "WindowGroupLimit" in topk_plan
    assert topk_plan.count("Exchange") <= 2  # the top-k window only
