"""r14 verdict task 3: second DH symbol-walk throughput attempt —
the staged (first_l, index_l) byte-arithmetic variant the r13
bit-reversal-peek attempt did not separately measure.

Same-session interleaved A/B (the box-noise rule) of the
e6_png_dyn_decode bench shape at sf0.1: DH_SYM_IMPL='fold' (the
stateful count walk, current default) vs 'peek' (15-bit flat peek +
staged lims/cums prefix tables, no per-bit struct fold;
_dh_decode_sym_peek). Hashes are re-verified identical inside the
same session before timing.

Usage: python scripts/dh_walk_ab_r14.py [sf_dir]   (default sf0.1)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import SparkSession

    import decision_tree_stuff_spark.operators.multimodal as mm
    from decision_tree_stuff_spark.queries import ALL_QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dh-walk-ab-r14")
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

    q = ALL_QUERIES["e6_png_dyn_decode"]

    # hash identity inside the same session, before any timing
    def result_sig():
        rows = sorted(
            tuple(r) for r in q(spark, SF_DIR).collect()
        )
        return hash(str(rows)), len(rows)

    mm.DH_SYM_IMPL = "fold"
    sig_fold = result_sig()
    mm.DH_SYM_IMPL = "peek"
    sig_peek = result_sig()
    assert sig_fold == sig_peek, (sig_fold, sig_peek)

    def timed(impl):
        mm.DH_SYM_IMPL = impl
        drain()
        t0 = time.time()
        noop(q(spark, SF_DIR))
        return round(time.time() - t0, 3)

    # interleaved x2 (A B A B) — min of each
    runs = {"fold": [], "peek": []}
    for _ in range(2):
        runs["fold"].append(timed("fold"))
        runs["peek"].append(timed("peek"))
    mm.DH_SYM_IMPL = "fold"

    res = {
        "sf_dir": SF_DIR,
        "rows": sig_fold[1],
        "hash_identical": True,
        "fold_runs": runs["fold"],
        "peek_runs": runs["peek"],
        "fold_min": min(runs["fold"]),
        "peek_min": min(runs["peek"]),
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
