"""Session-timezone invariance of the event-time queries.

Spark interprets TIMESTAMP (LTZ) casts and some datetime functions in
the SESSION timezone, so a query that accidentally round-trips an NTZ
column through LTZ gives different answers on a box configured for a
non-UTC zone — while the DuckDB oracle (NTZ arithmetic throughout) is
timezone-free. Round 5 caught exactly this in e10b_interval_join
(date_trunc forced an NTZ→LTZ cast; 1065 vs 1094 rows under
Asia/Kolkata). This test pins every time-sensitive gate query to
produce identical results under UTC and two non-UTC session zones
(one half-hour-offset zone, one DST zone).
"""

from __future__ import annotations

import pytest

from decision_tree_stuff_spark.queries import ALL_QUERIES

TIME_QUERIES = [
    "e5_tumbling_counts",
    "e5_sliding_counts",
    "e5_sessions",
    "e5b_session_assignment",
    "e10_asof_join",
    "e10b_interval_join",
]


def _multiset(df):
    cols = df.columns
    out = {}
    for r in df.collect():
        k = tuple(repr(v) for v in r)
        out[k] = out.get(k, 0) + 1
    return cols, out


@pytest.mark.parametrize("name", TIME_QUERIES)
def test_query_is_session_timezone_invariant(spark, sf_dir, name):
    base_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        want = _multiset(ALL_QUERIES[name](spark, sf_dir))
        for tz in ("Asia/Kolkata", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = _multiset(ALL_QUERIES[name](spark, sf_dir))
            assert got == want, f"{name} differs under session tz {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", base_tz)
