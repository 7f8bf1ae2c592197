"""r14 verdict task 2: component-split e7f_label_prop's 6.05 s (3.0x
its 2.0 s DuckDB twin — the only >2x row with a >1 s denominator) the
way r13 profiled pagerank (SCALING_r13.md §3).

Components, same-session min-of-2 warm with GC drains between:

  A. full row            — label_propagation(docs, pairs, 3) as the
                           registry runs it (emitter inside)
  B. pair emitter alone  — the blocked-Jaccard pipeline through its
                           localCheckpoint materialization (what the
                           LPA loop consumes)
  C. LPA loop alone      — label_propagation on PRE-materialized
                           edges (a localCheckpoint-ed pairs frame),
                           so the emitter is out of the measurement
  D. loop, checkpoint-free — the same rounds with lazy lineage
                           growth instead of per-round
                           localCheckpoint (the pagerank wash-check)

Usage: python scripts/lpa_profile_r14.py [sf_dir]   (default sf0.1)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from decision_tree_stuff_spark.operators.graph import (
        label_propagation,
    )
    from decision_tree_stuff_spark.queries._shared import _pair_graph

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lpa-profile-r14")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))  # warmup

    def drain():
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def timed(fn, n=2):
        drain()
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # A. full row (emitter + loop), exactly the registry shape
    def full_row():
        docs, pairs = _pair_graph(spark, SF_DIR)
        noop(label_propagation(docs, pairs, iterations=3))

    # B. emitter alone, through the same materialization the loop eats
    def emitter():
        _, pairs = _pair_graph(spark, SF_DIR)
        edges = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
        edges.unpersist(False)

    # C. loop alone on pre-materialized pairs
    docs0, pairs0 = _pair_graph(spark, SF_DIR)
    pairs_mat = pairs0.localCheckpoint(eager=True)
    docs_mat = docs0.select("doc_id").localCheckpoint(eager=True)
    n_pairs = pairs_mat.count()
    n_docs = docs_mat.count()

    def loop_only():
        noop(label_propagation(docs_mat, pairs_mat, iterations=3))

    # D. loop without per-round checkpoints (lazy lineage growth)
    def loop_lazy():
        a, b = "id_a", "id_b"
        edges = pairs_mat.select(
            F.col(a).alias("src"), F.col(b).alias("dst")
        ).union(
            pairs_mat.select(F.col(b).alias("src"), F.col(a).alias("dst"))
        )
        labels = docs_mat.select(
            F.col("doc_id").alias("id"), F.col("doc_id").alias("label")
        )
        for _ in range(3):
            votes = (
                edges.join(
                    labels.select(F.col("id").alias("src"), "label"),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            winner = votes.groupBy("id").agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label"))
                )["label"].alias("new_label")
            )
            labels = labels.join(winner, "id", "left").select(
                "id",
                F.coalesce(
                    F.col("new_label"), F.col("label")
                ).alias("label"),
            )
        noop(labels)

    res = {
        "sf_dir": SF_DIR,
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "A_full_row": timed(full_row),
        "B_emitter_only": timed(emitter),
        "C_loop_only_checkpointed": timed(loop_only),
        "D_loop_only_lazy": timed(loop_lazy),
    }
    import json

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
