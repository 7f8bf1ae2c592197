"""r15: same-session interleaved A/B of the measured-size broadcast
hints on checkpoint-backed graph frames (utils.broadcast_if_small —
guide §3.1: a LogicalRDD has no size stats, so the planner never
auto-broadcasts it; the hint fires from the MEASURED block size).

Variants toggle via SPARK_GRAFT_NO_SIZE_HINT (read per call).
Protocol: value identity (sorted-row hash) verified BEFORE timing;
min-of-2 warm into the noop sink; GC drain between pairs.

Usage: python scripts/size_hint_ab_r15.py [sf_dir] [rounds] [rows]
"""

from __future__ import annotations

import gc
import hashlib
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _row_hash(df) -> str:
    rows = df.collect()
    cols = sorted(df.columns)
    keyed = sorted(tuple(repr(r[c]) for c in cols) for r in rows)
    h = hashlib.md5()
    for t in keyed:
        h.update("|".join(t).encode())
    return h.hexdigest()


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("size-hint-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from decision_tree_stuff_spark import queries as Q

    reg = Q.ALL_QUERIES
    rows = ONLY or [
        "e7e_triangles",
        "e7f_label_prop",
        "e7d_pagerank",
        "e7_dedup_clusters",
        "e7b_minhash_dedup_keep",
    ]

    def set_variant(on: bool):
        os.environ["SPARK_GRAFT_NO_SIZE_HINT"] = "0" if on else "1"

    for name in rows:
        set_variant(False)
        h0 = _row_hash(reg[name](spark, SF_DIR))
        set_variant(True)
        h1 = _row_hash(reg[name](spark, SF_DIR))
        ok = h0 == h1
        print(f"identity {name}: {ok}", flush=True)
        if not ok:
            print("ABORT: identity mismatch", flush=True)
            return

    def timed(name, on):
        set_variant(on)
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            _noop(reg[name](spark, SF_DIR))
            best = min(best, time.monotonic() - t0)
        return best

    for rnd in range(ROUNDS):
        for name in rows:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            a = timed(name, False)
            b = timed(name, True)
            print(
                f"round {rnd} {name}: no_hint={a:.2f}s hint={b:.2f}s",
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
