"""Same-session A/B for the e9c_ivf_decontam intercept (r10, r9
verdict task 5): the driver's BENCH_r09 recorded 2.4 -> 4.9 s at
sf0.1 after the r9 literal-centroid rewrite — attribute the delta.

Three timed variants, same session, min-of-2 warm noop sinks:
  A. r9 literal plan (the shipped q_e9c_ivf_decontam)
  B. r8-style window plan (broadcast centroid join + row_number
     window for BOTH sides' cell assignment — reconstructed here for
     the A/B only)
  C. the quantizer collect alone (the one build-time Spark job the
     literal plan added)

Usage: python scripts/e9c_ivf_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def window_variant(spark, sf_dir):
    """The r8 shape: cell assignment via broadcast centroid join +
    row_number window (shuffles the corpus), then the same cell
    equi-join + max-struct aggregate as the literal plan."""
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.functions.array_math import dot_product
    from decision_tree_stuff_spark.operators.similarity import (
        _assigned_cells,
        _quantizer_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.where("vec_id % 7 <> 0")
    bench = emb.where("vec_id % 7 = 0 AND vec_id < 10000000")
    threshold, n_centroids, nprobe = 0.8, 16, 2

    cent = _quantizer_centroids(corpus, n_centroids, "vec_id", "embedding", "first")
    ccells = (
        _assigned_cells(corpus, cent, "vec_id", "embedding")
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )
    bcells = (
        _assigned_cells(bench, cent, "vec_id", "embedding")
        .where(F.col("rn") <= nprobe)
        .select(
            F.col("vec_id").alias("__bid"),
            F.col("embedding").alias("__bvec"),
            "cid",
        )
    )

    def norm(v):
        return F.sqrt(dot_product(v, v))

    ccells = ccells.withColumn("__cn", norm(F.col("embedding")))
    bcells = bcells.withColumn("__bn", norm(F.col("__bvec")))
    denom = F.col("__cn") * F.col("__bn")
    cos = F.round(
        F.when(denom > 0.0, dot_product(F.col("embedding"), F.col("__bvec")) / denom),
        6,
    )
    best = (
        ccells.join(F.broadcast(bcells), "cid")
        .select(
            "vec_id",
            F.struct(cos.alias("c"), (-F.col("__bid")).alias("nb")).alias("__s"),
        )
        .groupBy("vec_id")
        .agg(F.max("__s").alias("__m"))
    )
    return (
        corpus.select("vec_id")
        .join(best, "vec_id", "left")
        .select(
            "vec_id",
            F.col("__m.c").alias("max_bench_cos"),
            (-F.col("__m.nb")).alias("bench_id"),
            F.coalesce(F.col("__m.c") >= F.lit(threshold), F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


def matrix_variant(spark, sf_dir):
    """Variant D: same shuffle-free argmax as the literal plan, but
    the centroid matrix rides as a 1-row BROADCAST cross join instead
    of per-centroid CreateArray literals — the vectors are real
    columns, materialized once per row."""
    import math

    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.functions.array_math import dot_product
    from decision_tree_stuff_spark.operators import spread_small
    from decision_tree_stuff_spark.operators.similarity import (
        _quantizer_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.where("vec_id % 7 <> 0")
    bench = emb.where("vec_id % 7 = 0 AND vec_id < 10000000")
    threshold, n_centroids, nprobe = 0.8, 16, 2

    crows = sorted(
        _quantizer_centroids(
            corpus, n_centroids, "vec_id", "embedding", "first"
        ).collect()
    )

    def pnorm(vals):
        acc = 0.0
        for v in vals:
            acc += float(v) * float(v)
        return math.sqrt(acc)

    cmat = spark.createDataFrame(
        [([ [float(x) for x in cvec] for _, cvec in crows],
          [pnorm(cvec) for _, cvec in crows],
          [int(cid) for cid, _ in crows])],
        "__cm array<array<double>>, __cns array<double>, __cids array<int>",
    )

    def norm(v):
        return F.sqrt(dot_product(v, v))

    def rank_structs(vec, vn):
        out = []
        for j in range(len(crows)):
            denom = vn * F.col("__cns")[j]
            cos = F.when(
                denom > 0.0, dot_product(vec, F.col("__cm")[j]) / denom
            )
            negc = F.coalesce(-F.round(cos, 6), F.lit(float("inf")))
            out.append(
                F.struct(negc.alias("negc"),
                         F.col("__cids")[j].alias("cid"))
            )
        return out

    ccells = (
        spread_small(corpus)
        .crossJoin(F.broadcast(cmat))
        .select("vec_id", "embedding", norm(F.col("embedding")).alias("__cn"),
                "__cm", "__cns", "__cids")
        .select(
            "vec_id", "embedding", "__cn",
            F.array_min(
                F.array(*rank_structs(F.col("embedding"), F.col("__cn")))
            )["cid"].alias("cid"),
        )
    )
    bcells = (
        bench.crossJoin(F.broadcast(cmat))
        .select(
            F.col("vec_id").alias("__bid"),
            F.col("embedding").alias("__bvec"),
            norm(F.col("embedding")).alias("__bn"),
            "__cm", "__cns", "__cids",
        )
        .select(
            "__bid", "__bvec", "__bn",
            F.explode(
                F.slice(
                    F.array_sort(
                        F.array(*rank_structs(F.col("__bvec"), F.col("__bn")))
                    ),
                    1, nprobe,
                )["cid"]
            ).alias("cid"),
        )
    )
    denom = F.col("__cn") * F.col("__bn")
    cos = F.round(
        F.when(denom > 0.0,
               dot_product(F.col("embedding"), F.col("__bvec")) / denom),
        6,
    )
    best = (
        ccells.join(F.broadcast(bcells), "cid")
        .select(
            "vec_id",
            F.struct(cos.alias("c"), (-F.col("__bid")).alias("nb")).alias("__s"),
        )
        .groupBy("vec_id")
        .agg(F.max("__s").alias("__m"))
    )
    return (
        corpus.select("vec_id")
        .join(best, "vec_id", "left")
        .select(
            "vec_id",
            F.col("__m.c").alias("max_bench_cos"),
            (-F.col("__m.nb")).alias("bench_id"),
            F.coalesce(F.col("__m.c") >= F.lit(threshold), F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from decision_tree_stuff_spark.queries import ALL_QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("e9c-ivf-ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label, thunk):
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            thunk()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({"variant": label, "sec": round(best, 2)}), flush=True)
        return best

    def run_literal():
        ALL_QUERIES["e9c_ivf_decontam"](spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_window():
        window_variant(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_quantizer_collect():
        from decision_tree_stuff_spark.operators.similarity import (
            _quantizer_centroids,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        _quantizer_centroids(
            emb.where("vec_id % 7 <> 0"), 16, "vec_id", "embedding", "first"
        ).collect()

    # value check first: the window variant must produce the literal
    # plan's exact frame, or the A/B compares different programs
    a = sorted(map(tuple, ALL_QUERIES["e9c_ivf_decontam"](spark, SF_DIR).collect()))
    b = sorted(map(tuple, window_variant(spark, SF_DIR).collect()))
    assert a == b, "window variant diverges from the literal plan"
    print(json.dumps({"variant": "value_check", "rows": len(a)}), flush=True)

    d = sorted(map(tuple, matrix_variant(spark, SF_DIR).collect()))
    assert a == d, "matrix variant diverges from the literal plan"

    def run_matrix():
        matrix_variant(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    timed("quantizer_collect_only", run_quantizer_collect)
    timed("literal_r9", run_literal)
    timed("window_r8", run_window)
    timed("matrix_bcast", run_matrix)
    timed("literal_r9_again", run_literal)
    spark.stop()


if __name__ == "__main__":
    main()
