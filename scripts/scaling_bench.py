"""Scaling-slope bench (round-7 task 2): the heaviest queries at
sf0.1 vs the synthetic sf1 (scripts/make_scaled_sf.py), Spark vs the
DuckDB oracle twins, one JSON line per (engine, sf, query).

Protocol matches bench.py: Spark = min-of-2 warm noop-sink writes
(single run past 30 s); DuckDB = min-of-2 warm fetchall (single run
past the slow cutoff), interrupted at DUCK_TIMEOUT_SEC and recorded
as DNF — at 10x the clone-union blow-up some twins are expected to
time out, which is itself the scaling finding.

Usage: python scripts/scaling_bench.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "e2_jaccard_pairs",
    "e2_winnow_pairs",
    "e9_decontamination",
    "e7_dedup_clusters",
    "e7b_minhash_dedup_keep",
    "tree_fit_transform",
]
# override the query list without editing the script:
#   SPARK_GRAFT_SCALING_QUERIES=a,b,c python scripts/scaling_bench.py ...
if os.environ.get("SPARK_GRAFT_SCALING_QUERIES"):
    QUERIES = os.environ["SPARK_GRAFT_SCALING_QUERIES"].split(",")
DUCK_TIMEOUT_SEC = float(os.environ.get("SPARK_GRAFT_DUCK_TIMEOUT", "240"))
SPARK_SINGLE_RUN_PAST = 30.0


def bench_spark(sf_dirs):
    from pyspark.sql import SparkSession

    from decision_tree_stuff_spark.queries import ALL_QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaling-bench")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf_dir in sf_dirs:
        for name in QUERIES:
            fn = ALL_QUERIES[name]
            spark.catalog.clearCache()
            for _ in range(2):
                spark._jvm.System.gc()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = time.time() - t0
            if best < SPARK_SINGLE_RUN_PAST:
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            out[(sf_dir, name)] = round(best, 2)
            print(
                json.dumps(
                    {"engine": "spark", "sf_dir": sf_dir, "query": name,
                     "sec": round(best, 2)}
                ),
                flush=True,
            )
    spark.stop()
    return out


def _duck_con(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _duck_one(con, sql):
    """One timed run, interrupted past DUCK_TIMEOUT_SEC -> None."""
    timer = threading.Timer(DUCK_TIMEOUT_SEC, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        return time.time() - t0
    except Exception:
        return None
    finally:
        timer.cancel()


def bench_duck(sf_dirs):
    from decision_tree_stuff_spark.queries import ALL_ORACLE_SQL

    for sf_dir in sf_dirs:
        con = _duck_con(sf_dir)
        for name in QUERIES:
            sql = ALL_ORACLE_SQL.get(name)
            if sql is None:
                # e7b: recursive-CTE transitive closure, DNF >290 s at
                # sf0.1 already (bench.py DUCKDB_TWIN_EXCLUDED) — use
                # the committed exclusion SQL if absent
                print(
                    json.dumps(
                        {"engine": "duckdb", "sf_dir": sf_dir,
                         "query": name, "sec": None,
                         "note": "no twin in oracle registry"}
                    ),
                    flush=True,
                )
                continue
            best = _duck_one(con, sql)
            if best is not None and best < 5.0:
                second = _duck_one(con, sql)
                if second is not None:
                    best = min(best, second)
            print(
                json.dumps(
                    {"engine": "duckdb", "sf_dir": sf_dir, "query": name,
                     "sec": round(best, 2) if best is not None else None,
                     "note": None if best is not None
                     else f"DNF >{DUCK_TIMEOUT_SEC:.0f}s (interrupted)"}
                ),
                flush=True,
            )
        con.close()


if __name__ == "__main__":
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("spark", "both"):
        bench_spark(sf_dirs)
    if mode in ("duckdb", "both"):
        bench_duck(sf_dirs)
