"""Replay-pathology sweep (r14 optimization round, second session):
for each candidate bench row, build the frame at sf0.01 and count
physical-plan node types — multiple `Scan parquet` nodes over the
same table inside ONE plan = the docsets/KMV multi-consumer replay
shape (guide §5 caching rule) worth a same-session A/B.

Usage: python scripts/replay_scan_r14b.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = (
    [q for q in sys.argv[2].split(",") if q] if len(sys.argv) > 2 else None
)

DEFAULT = [
    "e12_batch_ingest",
    "e7b_minhash_dedup_keep",
    "e7_dedup_clusters",
    "e4_retrieval_pipeline",
    "e3_kmeans_assign",
    "e9c_semantic_decontam",
    "e9c_ivf_decontam",
    "e4_lr_langid",
    "e4_lr_langid_joined",
    "e2_minhash_km_pairs",
    "e2_minhash_pairs",
    "e7d_pagerank",
    "e7e_triangles",
    "e7f_label_prop",
    "e4_kmv_matrix",
    "e4_hybrid_rrf",
    "e2_simhash_dups",
    "e2_simhash_md5_dups",
    "gbt_fit_transform",
    "e9e_substring_decontam",
    "e2_snm_pairs",
    "e2_winnow_pairs",
    "e2_edit_verified",
    "e1f_exact_substring",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from decision_tree_stuff_spark.queries import ALL_QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("replay-scan")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = ONLY if ONLY is not None else DEFAULT
    print(
        f"{'row':28s} {'scans':>5} {'tables (scan count per parquet file)':40s}"
        f" {'Exch':>4} {'HashAgg':>7} {'SMJ':>3} {'BHJ':>3} {'IMTS':>4}"
        f" {'kB':>6}"
    )
    for name in names:
        try:
            df = ALL_QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR {e}")
            continue
        scans = re.findall(r"Scan parquet[^\n]*", plan)
        tabs = Counter()
        for s in scans:
            m = re.search(r"(\w+)\.parquet", s)
            tabs[m.group(1) if m else "?"] += 1
        counts = Counter(
            m.group(1)
            for m in re.finditer(
                r"\b(Exchange|HashAggregate|SortMergeJoin|"
                r"BroadcastHashJoin|InMemoryTableScan|Scan ExistingRDD)"
                r"\b",
                plan,
            )
        )
        tab_s = ",".join(f"{t}x{c}" for t, c in sorted(tabs.items()))
        print(
            f"{name:28s} {len(scans):5d} {tab_s:40s}"
            f" {counts['Exchange']:4d} {counts['HashAggregate']:7d}"
            f" {counts['SortMergeJoin']:3d} {counts['BroadcastHashJoin']:3d}"
            f" {counts['InMemoryTableScan'] + counts['Scan ExistingRDD']:4d}"
            f" {len(plan)//1024:6d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
