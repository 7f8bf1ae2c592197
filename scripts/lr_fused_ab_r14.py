"""Same-session interleaved A/B for the r14 fused dense LR fit
(classifier.py `_lr_fit_dense` fused vs `_lr_fit_dense_loop`): times
the FULL e4_lr_langid bench row shape (fit + classify into the noop
sink) with the dense path switched between the two implementations,
plus weight-identity verification each round.

Usage: python scripts/lr_fused_ab_r14.py [sf_dir] [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from decision_tree_stuff_spark.operators import classifier as C
    from decision_tree_stuff_spark.operators.classifier import lr_classify
    from decision_tree_stuff_spark.queries._shared import _docs
    from decision_tree_stuff_spark.queries._shared import (
        LR_BUCKETS, LR_ITERS, LR_RATE,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("lr-fused-ab-r14")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").write.format(
        "noop"
    ).mode("overwrite").save()

    docs = _docs(spark, SF_DIR)
    train = docs.where("doc_id % 2 = 0").withColumn(
        "is_en", (F.col("lang") == "en").cast("int")
    )
    score = docs.where("doc_id % 2 = 1")

    def drain() -> None:
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def run(fit_fn):
        t0 = time.time()
        w = fit_fn(
            train, "is_en", LR_BUCKETS, LR_ITERS, LR_RATE,
            "doc_id", "text", 6, True,
        )
        lr_classify(score, w).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0, w

    print(f"{'round':>5s} {'loop':>7s} {'fused':>7s}  identical")
    for i in range(ROUNDS):
        drain()
        t_loop, w_loop = run(C._lr_fit_dense_loop)
        drain()
        t_fused, w_fused = run(C._lr_fit_dense)
        print(
            f"{i:5d} {t_loop:7.2f} {t_fused:7.2f}  {w_loop == w_fused}",
            flush=True,
        )
        if w_loop != w_fused:
            raise SystemExit("weight mismatch")
    spark.stop()


if __name__ == "__main__":
    main()
