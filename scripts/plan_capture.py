"""Capture ``.explain('formatted')`` for bench queries into
``plans/<tag>/<name>_<suffix>.txt`` (r14 optimization-round
deliverable: committed before/after plan evidence).

Usage:
  python scripts/plan_capture.py <suffix> [sf_dir] [query1,query2,...]

With no query list, captures every BENCH_QUERIES row.
Tag defaults to r14; override with $PLAN_TAG.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
ONLY = (
    [q for q in sys.argv[3].split(",") if q] if len(sys.argv) > 3 else None
)
TAG = os.environ.get("PLAN_TAG", "r14")


def main() -> None:
    from pyspark.sql import SparkSession

    from bench import BENCH_QUERIES
    from decision_tree_stuff_spark.queries import ALL_QUERIES

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(HERE, "plans", TAG)
    os.makedirs(outdir, exist_ok=True)
    names = ONLY if ONLY is not None else list(BENCH_QUERIES)
    for name in names:
        try:
            df = ALL_QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — capture records, not raises
            plan = f"ERROR building plan: {e}"
        path = os.path.join(outdir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
