"""Same-session interleaved A/B for the r14 kmv_pairwise /
kmv_set_estimates bounded-persist (sketch.py): the "before" arm is
an inline copy of the pre-r14 plan (no persist — the sketch upstream
replays once per consumer); the "after" arm is the shipped operator.
Rows: e4_kmv_matrix (pairwise) and e4_kmv_overlap (set estimates)
bench shapes, min-of-2 warm into the noop sink, plus value-identity.

Usage: python scripts/kmv_persist_ab_r14.py [sf_dir] [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def kmv_pairwise_nopersist(sketches, group_col, k):
    """Pre-r14 kmv_pairwise body (no persist) — kept in-script as
    the A/B 'before' arm; expression-identical otherwise."""
    from decision_tree_stuff_spark.operators.sketch import KMV_SPACE

    g = F.col(group_col)
    th = sketches.groupBy(g.alias("grp")).agg(
        F.when(F.count(F.lit(1)) < k, F.lit(KMV_SPACE).cast("bigint"))
        .otherwise(F.max("h"))
        .alias("theta")
    )
    pairs = (
        th.select(F.col("grp").alias("group_a"), F.col("theta").alias("ta"))
        .join(
            th.select(
                F.col("grp").alias("group_b"), F.col("theta").alias("tb")
            ),
            F.col("group_a") < F.col("group_b"),
        )
        .select("group_a", "group_b", F.least("ta", "tb").alias("theta"))
    )
    a = sketches.select(g.alias("group_a"), F.col("h").alias("ha"))
    b = sketches.select(g.alias("group_b"), F.col("h").alias("hb"))
    na = (
        pairs.join(a, "group_a")
        .where(F.col("ha") < F.col("theta"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    nb = (
        pairs.join(b, "group_b")
        .where(F.col("hb") < F.col("theta"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    inter = (
        a.join(b, F.col("ha") == F.col("hb"))
        .where(F.col("group_a") < F.col("group_b"))
        .join(pairs, ["group_a", "group_b"])
        .where(F.col("ha") < F.col("theta"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    out = (
        pairs.join(na, ["group_a", "group_b"], "left")
        .join(nb, ["group_a", "group_b"], "left")
        .join(inter, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            "theta",
            F.coalesce("n_a", F.lit(0)).alias("__na"),
            F.coalesce("n_b", F.lit(0)).alias("__nb"),
            F.coalesce("n_i", F.lit(0)).cast("bigint").alias("n_inter"),
        )
    )
    scale = F.lit(float(KMV_SPACE)) / F.col("theta").cast("double")
    n_union = F.col("__na") + F.col("__nb") - F.col("n_inter")
    return out.select(
        "group_a",
        "group_b",
        "theta",
        "n_inter",
        F.round(F.col("n_inter").cast("double") * scale, 6).alias(
            "est_intersection"
        ),
        F.round(n_union.cast("double") * scale, 6).alias("est_union"),
        F.round(
            F.when(
                n_union > 0,
                F.col("n_inter").cast("double") / n_union.cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("jaccard"),
    )


def main() -> None:
    from decision_tree_stuff_spark.operators.sketch import (
        KMV_K,
        kmv_pairwise,
        kmv_sketch,
    )
    from decision_tree_stuff_spark.queries import ALL_QUERIES
    from decision_tree_stuff_spark.queries._shared import _docs
    from decision_tree_stuff_spark.functions.text import tokens

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("kmv-persist-ab-r14")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").write.format(
        "noop"
    ).mode("overwrite").save()

    t = tokens(F.col("text"))
    sh = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def shingled():
        return _docs(spark, SF_DIR).select(
            "lang", F.explode(sh).alias("shingle")
        )

    def drain() -> None:
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def timed(build):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    def before():
        return kmv_pairwise_nopersist(
            kmv_sketch(shingled(), "shingle", group_cols=["lang"]),
            "lang", KMV_K,
        )

    def after():
        return kmv_pairwise(
            kmv_sketch(shingled(), "shingle", group_cols=["lang"]),
            "lang",
        )

    # value identity first
    rb = sorted(map(tuple, before().collect()))
    ra = sorted(map(tuple, after().collect()))
    print("pairwise identity:", rb == ra, flush=True)
    if rb != ra:
        raise SystemExit("value mismatch")

    for rnd in range(ROUNDS):
        drain()
        tb = timed(before)
        drain()
        ta = timed(after)
        print(
            f"round {rnd}: pairwise before {tb:.2f}s  after {ta:.2f}s",
            flush=True,
        )
    # e4_kmv_overlap end-to-end (after-arm only vs its r14pre number
    # is cross-session; the pairwise A/B above is the claim carrier)
    drain()
    t0 = time.time()
    ALL_QUERIES["e4_kmv_overlap"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"e4_kmv_overlap (after, cold+warm pair): {time.time()-t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
