"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet, compare row multisets exactly (columns sorted
by name, exact values — the driver hashes, so approximate equality is
not enough).

Runs at sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from decision_tree_stuff_spark.queries import ALL_ORACLE_SQL, ALL_QUERIES
from decision_tree_stuff_spark.sources import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and represent exactly
        return repr(v + 0.0)
    if isinstance(v, bool):
        return repr(v)
    return repr(v)


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for row in rows:
        key = tuple(_norm(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", sorted(ALL_ORACLE_SQL))
def test_oracle_parity(name, spark, duck):
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ALL_ORACLE_SQL[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column names differ: spark={scols} duck={dcols}"
    )
    sm = _multiset(srows, [c.lower() for c in scols])
    dm = _multiset(drows, [c.lower() for c in dcols])
    if sm != dm:
        only_s = {k: v for k, v in sm.items() if dm.get(k) != v}
        only_d = {k: v for k, v in dm.items() if sm.get(k) != v}
        raise AssertionError(
            f"{name}: value mismatch; spark rows={len(srows)} duck rows={len(drows)}\n"
            f"sample spark-only: {list(only_s.items())[:5]}\n"
            f"sample duck-only: {list(only_d.items())[:5]}"
        )


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ALL_ORACLE_SQL)))
def test_rows_only_queries_run(name, spark):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
