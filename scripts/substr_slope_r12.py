"""Bounded-slope demonstration for ExactSubstr (r11 verdict task 3):
e1f/e9e re-run at sf0.1 -> /tmp/sf1p -> /tmp/sf10p under FIXED caps,
with the cap's drop accounting made explicit per scale point.

Configs: the registry baseline (min_len=25, max_df=50), a tighter
cap (max_df=10), and the Lee et al. 2022 setting (min_len=250 chars
~ their 50 tokens, max_df=50). One JSON line per (config, sf, kind).
Spark-only timings, driver protocol (single run past 60 s else
min-of-2). Usage: python scripts/substr_slope_r12.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.1", "/tmp/sf1p", "/tmp/sf10p"
]
CONFIGS = {
    "base_L25_df50": dict(min_len=25, max_df=50),
    "tight_L25_df10": dict(min_len=25, max_df=10),
    "lee_L250_df50": dict(min_len=250, max_df=50),
}


def main() -> None:
    from pyspark.sql import SparkSession

    from decision_tree_stuff_spark.operators.dedup import (
        exact_substring_cap_report,
        exact_substring_matches,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("substr-slope-r12")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def drain():
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def timed(build):
        drain()
        t0 = time.time()
        noop(build())
        best = time.time() - t0
        if best < 60:
            t0 = time.time()
            noop(build())
            best = min(best, time.time() - t0)
        return round(best, 2)

    rows = []
    for sf_dir in SF_DIRS:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        for cname, cfg in CONFIGS.items():
            sec = timed(lambda: exact_substring_matches(docs, **cfg))
            n_matches = exact_substring_matches(docs, **cfg).count()
            rep = exact_substring_cap_report(docs, **cfg).first().asDict()
            rec = {"config": cname, "sf_dir": sf_dir, "sec": sec,
                   "n_matches": n_matches, **{k: rep[k] for k in (
                       "n_grams", "n_dropped_grams", "n_anchors",
                       "n_dropped_anchors")},
                   "example_gram": (rep["example_gram"] or "")[:40]}
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
