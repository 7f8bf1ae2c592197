"""Relational coverage: multi-way joins, rollup, wide aggregation, skew-salted aggregates.

Split out of the monolithic queries.py (r9); function and
oracle text moved verbatim — see queries/__init__.py for
the registry.
"""

from __future__ import annotations

from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    F,
    _read_parquet,
)



# ---------------------------------------------------------------------
# Relational coverage: multi-way joins + wide aggregation
# ---------------------------------------------------------------------

def q_skew_salted_agg(spark, sf_dir):
    """Salted two-phase aggregation — the oracle is the plain GROUP BY
    (salting must be result-invisible)."""
    from decision_tree_stuff_spark.operators.skew import salted_agg

    li = _read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    )
    out = salted_agg(
        li, ["l_returnflag"], sums={"l_quantity": "sq"}, count_alias="n", salt=16
    )
    return out.select(
        "l_returnflag", F.round("sq", 2).alias("sq"), F.col("n")
    )


def q_rel_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary (group-by agg over lineitem)."""
    li = _read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_rel_disjunctive_join(spark, sf_dir):
    """TPC-H Q19-flavored disjunctive join-filter aggregate: revenue
    from lineitem×part rows matching any of three brand/size/quantity
    conjunctions. Exercises OR-of-ANDs predicate handling: Catalyst
    extracts the common join key, pushes the per-side conjuncts into
    the scans, and broadcasts the part side."""
    li = _read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    part = _read_parquet(spark, f"{sf_dir}/part.parquet")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30))
    )
    return j.where(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


def q_rel_rollup(spark, sf_dir):
    """ROLLUP aggregation: per-(returnflag, linestatus) revenue with
    subtotals and grand total — Catalyst expands the grouping sets in
    one pass (Expand + single shuffle)."""
    li = _read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                    ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_rel_top_customers(spark, sf_dir):
    """Revenue-per-customer 3-way join; dims broadcast explicitly."""
    orders = _read_parquet(spark, f"{sf_dir}/orders.parquet")
    customer = _read_parquet(spark, f"{sf_dir}/customer.parquet")
    nation = _read_parquet(spark, f"{sf_dir}/nation.parquet")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(10)
    )

ORACLE_SQL: Dict[str, str] = {
    "skew_salted_agg": """
SELECT l_returnflag,
       round(sum(l_quantity), 2) AS sq,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1
""",
    "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "rel_disjunctive_join": """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 5)
   OR (p_brand = 'Brand#3' AND p_size <= 30)
""",
    "rel_rollup": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "rel_top_customers": """
SELECT c_custkey, c_name, n_name,
       round(sum(o_totalprice), 2) AS total_spent,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2, 3
ORDER BY total_spent DESC, c_custkey ASC
LIMIT 10
""",
}
