"""Distributed Lloyd k-means (similarity.kmeans_fit/assign):
hand-checkable convergence on planted clusters, the determinism
contract (rounding, ties, empty clusters), and the shuffle-free
assignment plan pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.similarity import (
    kmeans_assign,
    kmeans_fit,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_recovers_planted_clusters(spark):
    """Two tight 2-d blobs; init takes the two lowest-id vectors (one
    from each blob by construction) and one iteration already lands
    each centroid on its blob mean."""
    a = [(0, [0.0, 0.1]), (2, [0.1, 0.0]), (4, [0.0, 0.0]), (6, [0.1, 0.1])]
    b = [(1, [5.0, 5.1]), (3, [5.1, 5.0]), (5, [5.0, 5.0]), (7, [5.1, 5.1])]
    emb = _emb(spark, a + b)
    cents = kmeans_fit(emb, k=2, iters=2)
    got = dict(cents)
    assert got[0] == [0.05, 0.05]  # mean of blob a, rounded to 6dp
    assert got[1] == [5.05, 5.05]
    assigned = {
        r["vec_id"]: r["cid"]
        for r in kmeans_assign(emb, [c for _, c in cents]).collect()
    }
    assert all(assigned[i] == 0 for i, _ in a)
    assert all(assigned[i] == 1 for i, _ in b)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """k=3 over two blobs: centroid 1 (init [0.2, 0]) loses every
    point to centroid 0 after the first update and must retain its
    last coordinates instead of collapsing to null."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.2, 0.0]),
        (2, [9.0, 9.0]),
        (3, [0.1, 0.0]),
        (4, [9.1, 9.0]),
    ]
    cents = dict(kmeans_fit(_emb(spark, rows), k=3, iters=3))
    assert cents[2] == [9.05, 9.0]  # the far blob
    # cluster 1's centroid stays a real coordinate list (its exact
    # value depends on when it empties; it must never be None)
    assert cents[1] is not None and len(cents[1]) == 2


def test_kmeans_assignment_ties_to_lowest_cid(spark):
    """A point equidistant (after 6dp rounding) from two identical
    centroids must go to the lower cid."""
    emb = _emb(spark, [(0, [1.0, 1.0])])
    out = kmeans_assign(emb, [[0.0, 0.0], [2.0, 2.0]]).collect()
    # dist to both = 2.0 exactly -> cid 0
    assert out[0]["cid"] == 0 and out[0]["dist"] == 2.0


def test_kmeans_fit_raises_when_corpus_smaller_than_k(spark):
    import pytest

    with pytest.raises(ValueError, match="k=5"):
        kmeans_fit(_emb(spark, [(0, [1.0]), (1, [2.0])]), k=5, iters=1)


def test_kmeans_assign_is_shuffle_free(spark, sf_dir):
    """Assignment must never shuffle ON A KEY — the only admissible
    exchange is spread_small's guarded round-robin parallelism spread
    of a single-split input (r10), which no-ops on real multi-split
    tables."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [[0.0] * 64, [1.0] * 64]
    plan = _plan(kmeans_assign(emb, cents))
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1, "at most the round-robin spread"
    # pre-spread input (>= defaultParallelism partitions): the guard
    # no-ops and the plan is the pure projection the operator claims
    pre = emb.repartition(
        spark.sparkContext.defaultParallelism
    ).localCheckpoint(eager=True)
    plan2 = _plan(kmeans_assign(pre, cents))
    assert "Exchange" not in plan2, "assignment must be a pure projection"


def test_kmeans_distortion_decreases_on_real_corpus(spark, sf_dir):
    """Lloyd's invariant — total within-cluster squared distance is
    non-increasing per iteration — on the real embeddings table.
    (Label purity is NOT asserted: the synthetic embeddings' planted
    labels are near-structureless — within-label spread ~7x the
    centroid separation — the same measured data property documented
    for rp_topk recall in ROUND7_NOTES.md.)"""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def distortion(iters):
        cents = kmeans_fit(emb, k=8, iters=iters)
        return (
            kmeans_assign(emb, [c for _, c in cents])
            .agg(F.sum("dist"))
            .first()[0]
        )

    d0, d1, d3 = distortion(0), distortion(1), distortion(3)
    # 1e-3 slack: the 6dp rounding contract can wiggle the last digit
    assert d1 <= d0 + 1e-3, (d0, d1)
    assert d3 <= d1 + 1e-3, (d1, d3)
    assert d3 < d0, (d0, d3)
