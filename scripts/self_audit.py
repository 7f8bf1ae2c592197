"""Per-round self-audit: replay the driver's correctness protocol —
every registered query (gate + EXTRA parity) against its DuckDB
oracle at sf0.01, multiset value compare over name-sorted columns —
and write CORRECTNESS_SELF_r{N}.json.

Usage: python scripts/self_audit.py [sf_dir] [out_json]
Optional env SELF_AUDIT_ONLY=comma,separated,keys restricts the run
to a subset (spot checks); the full-registry JSON is the committable
artifact.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_SELF_r08.json",
    )
)


def _norm(v):
    import datetime
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def key(t):
        # NULLs (ROLLUP grouping rows) sort before any value; tag each
        # cell with its type name so None/str/float never compare raw
        return tuple(
            (v is not None, type(v).__name__, v) if v is not None
            else (False, "", "")
            for v in t
        )

    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=key
    )


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from decision_tree_stuff_spark.queries import (
        ALL_ORACLE_SQL,
        ALL_QUERIES,
        SPARK_QUERIES,
    )
    from decision_tree_stuff_spark.sources import TABLES

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("self-audit")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET threads=16")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    only = {
        k for k in os.environ.get("SELF_AUDIT_ONLY", "").split(",") if k
    }
    results = {}
    counts = {"match": 0, "rows_only": 0, "mismatch_or_error": 0}
    for name, fn in ALL_QUERIES.items():
        if only and name not in only:
            continue
        entry = {"gate": name in SPARK_QUERIES}
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            entry["rows"] = len(srows)
            sql = ALL_ORACLE_SQL.get(name)
            if sql is None:
                entry["status"] = "rows_only"
            else:
                res = con.execute(sql)
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                entry["oracle_rows"] = len(orows)
                entry["status"] = (
                    "match"
                    if sorted(scols) == sorted(ocols)
                    and _multiset(srows, scols) == _multiset(orows, ocols)
                    else "mismatch"
                )
        except Exception as e:  # noqa: BLE001 — audit records, not raises
            entry["status"] = "error"
            entry["err"] = str(e)[:300]
        key = (
            entry["status"]
            if entry["status"] in ("match", "rows_only")
            else "mismatch_or_error"
        )
        counts[key] += 1
        results[name] = entry
        print(f"{name}: {entry['status']}", file=sys.stderr, flush=True)

    out = {
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "n_queries": len(results),
        **counts,
        "queries": results,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
