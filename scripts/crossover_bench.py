"""Level-wise vs depth-first fit crossover (r9 verdict task 6): time
``DecisionTree.fit`` under both strategies on lineitem at increasing
scale and depth. At sf0.1/depth-4 the depth-first loop wins (its
per-node jobs are cheap and the tree is shallow); the 100 TB training
mode is level-wise (one pass per LEVEL instead of one per NODE — at
depth d, 2^d node passes each re-scan the table vs d level passes).
This script measures where the lines cross.

Usage:
  SPARK_GRAFT_XOVER_DEPTHS=4,6 python scripts/crossover_bench.py \
      /root/testdata/sf0.1 /tmp/sf1 [...]

One JSON line per (sf_dir, depth, strategy): {"sf_dir", "depth",
"strategy", "sec", "n_nodes"}. min-of-1 (training is multi-job and
self-warming; the cold-start is part of what is being compared).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from decision_tree_stuff_spark.dtree import (  # noqa: E402
    DecisionTree,
    DecisionTreeParams,
)
from decision_tree_stuff_spark.queries import FEATURES  # noqa: E402

DEPTHS = [
    int(d)
    for d in os.environ.get("SPARK_GRAFT_XOVER_DEPTHS", "4,6").split(",")
]


def _n_nodes(node) -> int:
    if node is None:
        return 0
    kids = [getattr(node, "left", None), getattr(node, "right", None)]
    return 1 + sum(_n_nodes(k) for k in kids)


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("crossover-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        # a SAWTOOTH label (parity of integer quantity): the bench
        # class (l_discount > 0.05) is perfectly learned by depth 3 —
        # 7 nodes at any max_depth, so the 2^d-vs-d job-count question
        # never engages. Parity keeps every quantity split profitable,
        # so the tree actually fills its depth budget (2^d - 1 nodes)
        base = li.select(
            *FEATURES,
            (F.col("l_quantity").cast("int") % 2).cast("bigint").alias(
                "class"
            ),
        )
        # warm the scan once per sf so strategy A doesn't absorb the
        # page-cache fill strategy B then rides
        base.write.format("noop").mode("overwrite").save()
        for depth in DEPTHS:
            for strategy in ("depth_first", "level_wise"):
                dt = DecisionTree(
                    DecisionTreeParams(
                        [], "class", "mean", "entropy", max_depth=depth
                    )
                )
                t0 = time.time()
                dt.fit(base, strategy=strategy)
                sec = round(time.time() - t0, 2)
                print(
                    json.dumps(
                        {
                            "sf_dir": sf_dir,
                            "depth": depth,
                            "strategy": strategy,
                            "sec": sec,
                            "n_nodes": _n_nodes(dt.learned_tree),
                        }
                    ),
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
