"""Same-session A/B for the r10 bench-ratio drift (r10 verdict task
1): the driver's ex-outlier common-subset ratio moved 1.153 (r9) ->
1.31 (r10) via a broad +0.3-1.9 s on queries whose PLANS ARE
UNTOUCHED between the rounds (judge-checked against git log). Since
there is no code delta to A/B, the attribution question is: does the
identical plan, re-timed now under the driver's own protocol
(per-query GC drain, min-of-2 warm noop sink, local[32], sf0.1),
reproduce the r9 numbers or the r10 numbers?

  * reproduces r9  -> the r10 inflation was transient box load
    (BASELINE.md documents a +-30-50% shared-box band), not a
    regression;
  * reproduces r10 -> something environmental-but-persistent (or an
    unnoticed dependency change) is inflating these plans and needs
    a per-query investigation.

Rows: the three biggest drifts the verdict names, plus two controls
— e9c_ivf_decontam (a REAL r10 improvement: its delta should
persist) and o06_split_scores (small drifted row, near-pure fixed
stage cost).

Usage: python scripts/drift_ab_r11.py [sf_dir]   (default sf0.1)
Prints one JSON line; paste the table into SCALING_r11.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

# name -> (r9 driver sec, r10 driver sec) from BENCH_DETAIL_r09/r10
REFERENCE = {
    "e2_minhash_km_pairs": (4.9, 6.8),
    "e7_dedup_clusters": (7.0, 8.8),
    "tree_fit_level_wise": (7.3, 8.2),
    "e9c_ivf_decontam": (4.9, 3.0),
    "o06_split_scores": (1.7, 2.5),
}


def main() -> None:
    from pyspark.sql import SparkSession

    from decision_tree_stuff_spark.dtree import (
        DecisionTree,
        DecisionTreeParams,
    )
    from decision_tree_stuff_spark.queries import ALL_QUERIES
    from decision_tree_stuff_spark.queries._shared import (
        FEATURES,
        _lineitem_base,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("drift-ab-r11")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup, exactly like bench.py
    noop(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))

    def drain():
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def timed_query(name):
        drain()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            noop(ALL_QUERIES[name](spark, SF_DIR))
            best = min(best, time.time() - t0)
        return round(best, 3)

    def timed_level_wise():
        # bench.py times level-wise fit ONCE, cold-ish, right after
        # the depth-first fit; approximate with min-of-2 like the rest
        # (the compile cost is shared with the depth-first warmup).
        base = _lineitem_base(spark, SF_DIR)
        dt0 = DecisionTree(
            DecisionTreeParams([], "class", "mean", "entropy", max_depth=4)
        )
        dt0.fit(base.select(*FEATURES, "class"))  # warm, like bench order
        drain()
        best = float("inf")
        for _ in range(2):
            dt = DecisionTree(
                DecisionTreeParams(
                    [], "class", "mean", "entropy", max_depth=4
                )
            )
            t0 = time.time()
            dt.fit(base.select(*FEATURES, "class"), strategy="level_wise")
            best = min(best, time.time() - t0)
        return round(best, 3)

    out = {}
    for name, (r9, r10) in REFERENCE.items():
        now = (
            timed_level_wise()
            if name == "tree_fit_level_wise"
            else timed_query(name)
        )
        # which round does the fresh number sit closer to?
        verdict = "r9" if abs(now - r9) <= abs(now - r10) else "r10"
        out[name] = {"r9": r9, "r10": r10, "now": now, "closer_to": verdict}
        print(f"  {name}: r9={r9} r10={r10} now={now} -> {verdict}",
              file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
