"""r15 verdict task 6: same-session A/B of the decision-tree fit
strategies (depth-first one-job-per-node vs level-wise
one-job-per-LEVEL) at a given core count, plus the gbt composition.

    python scripts/tree_strategy_ab_r15.py 32
    python scripts/tree_strategy_ab_r15.py 8

Optional second arg = sf dir (default /root/testdata/sf0.1).
Parity between the two strategies is already pinned by
tests/test_level_wise.py; this script only times.
"""

from __future__ import annotations

import gc
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"tree-strategy-ab-c{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))

    from decision_tree_stuff_spark.dtree import (
        DecisionTree,
        DecisionTreeParams,
    )
    from decision_tree_stuff_spark.queries import _lineitem_base, FEATURES

    base = _lineitem_base(spark, sf_dir)
    train = base.select(*FEATURES, "class")

    def drain():
        spark.catalog.clearCache()
        gc.collect()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def fit_once(strategy):
        dt = DecisionTree(
            DecisionTreeParams([], "class", "mean", "entropy", max_depth=4)
        )
        t0 = time.monotonic()
        if strategy == "default":
            dt.fit(train)
        else:
            dt.fit(train, strategy="level_wise")
        return time.monotonic() - t0

    for rnd in range(3):
        drain()
        a = fit_once("default")
        drain()
        b = fit_once("level_wise")
        print(
            f"[c{cpus} round {rnd}] depth_first={a:.2f}s "
            f"level_wise={b:.2f}s",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
