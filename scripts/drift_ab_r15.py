"""r15 verdict task 9: re-time the two untouched rows whose r14
driver readings regressed hardest (e2_minhash_pairs 0.47,
e3_kmeans_assign 0.62 speedup) under the min-of-3 drift rule —
same-session, bench.py protocol (per-query GC drain, min-of-2 warm
noop sink ×3 rounds, local[32], sf0.1). The r15pre full bench already
read them at 5.36 / 4.64 s (vs the driver's 9.1 / 6.3); this pins the
min-of-3 confirmation the noise protocol requires.

Usage: python scripts/drift_ab_r15.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

# name -> (r13 driver sec, r14 driver sec) from PERF_r14.json
REFERENCE = {
    "e2_minhash_pairs": (4.3, 9.1),
    "e3_kmeans_assign": (3.9, 6.3),
    # control: a row the r14 driver read flat
    "e2_winnow_pairs": (3.7, 3.8),
}


def main() -> None:
    from pyspark.sql import SparkSession

    from decision_tree_stuff_spark.queries import ALL_QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("drift-ab-r15")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))

    def drain():
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    for name, (r13, r14) in REFERENCE.items():
        samples = []
        for _ in range(3):
            drain()
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                noop(ALL_QUERIES[name](spark, SF_DIR))
                best = min(best, time.time() - t0)
            samples.append(round(best, 2))
        print(
            f"{name}: min-of-2 x3 = {samples} (driver r13 {r13}, "
            f"r14 {r14})",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
