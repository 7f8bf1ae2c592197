"""Learned text classifier (E-4lr): binary logistic regression over
hashed n-gram counts — the learned-weights member of the
fastText-style quality/language gate family (``textstats.nb_model``
is the counts-only member; this one actually descends a loss).

Training is full-batch gradient descent with a FIXED iteration count
and a rounding contract, the same recipe that made the distributed
k-means and tree-fit oracles exact:

    z_i = round(bias + Σ_b c_ib·w_b, 6)        (per-doc, one join+agg)
    p_i = round(σ(z_i), 6)
    w_b += round(lr · Σ_i c_ib·(y_i − p_i) / N, 6)  (per-bucket agg)

Rounding z before σ and the weights after every update absorbs
partial-sum ulp noise, so the trajectory is independent of
partitioning AND engine — the DuckDB twin unrolls the same iterations
as MATERIALIZED CTEs and matches exactly. σ's exp differs at most 1
ulp between libm and Java Math; after the 6 dp rounds that cannot
surface.

Scale design: features are ``selection.hashed_ngram_features`` (one
projection + explode + grouped count — the only corpus-sized
shuffle); each GD iteration joins the cached feature rows against a
BROADCAST (n_buckets+1)-row weight table, aggregates per doc
(map-side combinable) and per bucket, and collects exactly
n_buckets+1 doubles to the driver. Inference is the same join + one
per-doc agg — no iteration, no window.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, functions as F

from decision_tree_stuff_spark.operators.selection import (
    hashed_ngram_features,
)

BIAS_BUCKET = -1  # the bias term's row in the portable weight table


def _round_away(x: float, dp: int = 6) -> float:
    """Half-away-from-zero rounding — the convention Spark's
    ``F.round`` (BigDecimal HALF_UP) and DuckDB's ``round`` share;
    Python's builtin ``round`` is half-even and would diverge on exact
    boundary ties."""
    q = 10**dp
    return math.floor(abs(x) * q + 0.5) / q * (1 if x >= 0 else -1)


def lr_fit(
    docs: DataFrame,
    label_col: str,
    n_buckets: int = 64,
    iters: int = 4,
    lr: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
    cache: bool = True,
) -> List[Tuple[int, float]]:
    """Train; returns ``[(bucket, weight), ...]`` with the bias at
    ``bucket == BIAS_BUCKET``. ``label_col`` must be 0/1-valued
    (cast to double internally). Documents with no tokens still train
    the bias (their z is the bias alone)."""
    spark = docs.sparkSession
    labels = docs.select(
        F.col(id_col), F.col(label_col).cast("double").alias("y")
    )
    # the bias is a constant feature (bucket BIAS_BUCKET, c=1) on
    # every document — it rides the same join/aggregates as the real
    # buckets, so each GD iteration is exactly ONE action (the
    # per-bucket gradient collect) instead of a separate bias pass,
    # and token-less docs train the bias through the same path.
    feats = hashed_ngram_features(docs, id_col, text_col, n_buckets).union(
        labels.select(
            F.col(id_col),
            F.lit(BIAS_BUCKET).cast("bigint").alias("bucket"),
            F.lit(1).cast("bigint").alias("c"),
        )
    )
    if cache:
        from pyspark import StorageLevel

        feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
        labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = labels.count()
        if n == 0:
            raise ValueError("lr_fit: empty corpus")
        w: Dict[int, float] = {b: 0.0 for b in range(n_buckets)}
        w[BIAS_BUCKET] = 0.0
        for _ in range(iters):
            wdf = spark.createDataFrame(
                list(w.items()), "bucket bigint, wt double"
            )
            zf = (
                feats.join(F.broadcast(wdf), "bucket")
                .groupBy(id_col)
                .agg(F.sum(F.col("c") * F.col("wt")).alias("zf"))
            )
            resid = labels.join(zf, id_col).select(
                F.col(id_col),
                (
                    F.col("y")
                    - F.round(
                        F.lit(1.0)
                        / (
                            F.lit(1.0)
                            + F.exp(-F.round(F.col("zf"), round_dp))
                        ),
                        round_dp,
                    )
                ).alias("r"),
            )
            grows = (
                feats.join(resid, id_col)
                .groupBy("bucket")
                .agg(F.sum(F.col("c") * F.col("r")).alias("g"))
                .collect()
            )
            g = {r["bucket"]: r["g"] for r in grows}
            w = {
                b: _round_away(w[b] + lr * g.get(b, 0.0) / n, round_dp)
                for b in w
            }
        return sorted(w.items())
    finally:
        if cache:
            feats.unpersist()
            labels.unpersist()


def lr_classify(
    docs: DataFrame,
    weights: List[Tuple[int, float]],
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
) -> DataFrame:
    """(id, score, pred) under a trained weight list — the feature
    projection + ONE broadcast join + one per-doc aggregate; the
    weight table never exceeds n_buckets+1 rows however large the
    corpus."""
    spark = docs.sparkSession
    wmap = dict(weights)
    bias = wmap.pop(BIAS_BUCKET, 0.0)
    n_buckets = (max(wmap) + 1) if wmap else 1
    wdf = spark.createDataFrame(
        sorted(wmap.items()), "bucket bigint, wt double"
    )
    feats = hashed_ngram_features(docs, id_col, text_col, n_buckets)
    zf = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.coalesce(F.col("wt"), F.lit(0.0))).alias(
                "zf"
            )
        )
    )
    score = F.round(
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.exp(
                -F.round(
                    F.coalesce(F.col("zf"), F.lit(0.0)) + F.lit(bias),
                    round_dp,
                )
            )
        ),
        round_dp,
    )
    return (
        docs.select(id_col)
        .join(zf, id_col, "left")
        .select(
            F.col(id_col),
            score.alias("score"),
            (score >= F.lit(threshold)).alias("pred"),
        )
    )
