"""Skew helpers must equal their unsalted equivalents exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.skew import salted_agg, salted_broadcast_join


def test_salted_agg_equals_direct(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_orderkey"
    )
    direct = {
        (r["l_returnflag"],): (r["sq"], r["n"])
        for r in ev.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["sq"], r["n"])
        for r in salted_agg(
            ev, ["l_returnflag"], sums={"l_quantity": "sq"}, count_alias="n", salt=8
        ).collect()
    }
    assert direct.keys() == salted.keys()
    for k in direct:
        assert abs(direct[k][0] - salted[k][0]) < 1e-6
        assert direct[k][1] == salted[k][1]


def test_salted_agg_two_shuffles(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    )
    out = salted_agg(ev, ["l_returnflag"], sums={"l_quantity": "sq"}, salt=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, "expected exactly two shuffles (partial+final)"


def test_salted_broadcast_join_equals_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    plain = sorted(
        map(
            str,
            orders.join(
                customer, orders.o_custkey == customer.c_custkey
            ).select("o_orderkey", "c_name").collect(),
        )
    )
    salted = sorted(
        map(
            str,
            salted_broadcast_join(
                orders.withColumnRenamed("o_custkey", "c_custkey"),
                customer,
                on=["c_custkey"],
                salt=4,
            ).select("o_orderkey", "c_name").collect(),
        )
    )
    assert plain == salted
