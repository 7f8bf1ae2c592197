"""ANN quality regression guards: the approximate variants must stay
close to the exact top-k on the test corpus (catches silent bucketing
or tie-break regressions that row-level checks can't)."""

from __future__ import annotations

from decision_tree_stuff_spark.queries import SPARK_QUERIES


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_recall_floor(spark, sf_dir):
    exact = _pairs(SPARK_QUERIES["e3_cosine_topk"](spark, sf_dir))
    ivf = _pairs(SPARK_QUERIES["e3_ivf_topk"](spark, sf_dir))
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"


def test_sign_lsh_results_are_true_neighbors(spark, sf_dir):
    """LSH may return fewer rows (bucket recall), but every returned
    cosine must equal the exact cosine for that pair."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in SPARK_QUERIES["e3_cosine_topk"](spark, sf_dir).collect()
    }
    # exact top-k only has k rows/query; recompute cosines for LSH pairs
    from decision_tree_stuff_spark.functions.array_math import cosine_similarity
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh = SPARK_QUERIES["e3_sign_lsh_topk"](spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
    joined = lsh.join(a, "query_id").join(b, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        "cosine",
        F.round(cosine_similarity(F.col("qv"), F.col("nv")), 6).alias("true_cos"),
    )
    rows = joined.collect()
    assert rows
    assert all(r["cosine"] == r["true_cos"] for r in rows)
