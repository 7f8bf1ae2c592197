"""The engine's queries are equally servable through ``spark.sql`` —
register the tables as views and run ANSI forms of the core operator
pipeline, comparing against the DataFrame builders. (The oracle SQL
strings themselves are DuckDB-dialect; these are the Spark-dialect
equivalents, which for the core relational operators are identical
ANSI.)"""

from __future__ import annotations

import math

from decision_tree_stuff_spark.queries import SPARK_QUERIES
from decision_tree_stuff_spark.sources import register_views


def test_sql_melt_window_agg_pipeline(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = """
    WITH base AS (
      SELECT l_quantity, l_discount,
             CAST(l_discount > 0.05 AS BIGINT) AS class
      FROM lineitem
    ),
    melt AS (
      SELECT class, 'l_discount' AS variable, l_discount AS value FROM base
      UNION ALL
      SELECT class, 'l_quantity', l_quantity FROM base
    ),
    t AS (
      SELECT *, AVG(value) OVER (PARTITION BY variable) AS threshold FROM melt
    )
    SELECT variable, round(ANY_VALUE(threshold), 6) AS threshold,
           round(COALESCE(AVG(CASE WHEN value <= threshold THEN class END), 0.0), 6) AS left_p1,
           round(COALESCE(AVG(CASE WHEN value > threshold THEN class END), 0.0), 6) AS right_p1
    FROM t GROUP BY variable, threshold
    """
    got = {
        r["variable"]: (r["threshold"], r["left_p1"], r["right_p1"])
        for r in spark.sql(sql).collect()
    }
    want = {
        r["variable"]: (r["threshold"], r["left_p1"], r["right_p1"])
        for r in SPARK_QUERIES["o05_conditional_agg"](spark, sf_dir).collect()
        if r["variable"] in ("l_discount", "l_quantity")
    }
    assert got.keys() == want.keys()
    for k in got:
        for a, b in zip(got[k], want[k]):
            assert math.isclose(a, b, abs_tol=1e-9), (k, got[k], want[k])


def test_sql_tree_inference_matches_compiled_expression(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = """
    SELECT l_orderkey, l_linenumber,
           CAST(CASE WHEN l_discount <= 0.05 THEN 0
                     ELSE CASE WHEN l_quantity <= 25.0 THEN 0 ELSE 1 END
                END AS TINYINT) AS prediction
    FROM lineitem
    """
    a = sorted(map(str, spark.sql(sql).collect()))
    b = sorted(map(str, SPARK_QUERIES["o11_tree_inference"](spark, sf_dir).collect()))
    assert a == b
