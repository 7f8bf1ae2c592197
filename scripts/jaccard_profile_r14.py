"""Component profile of the blocked-Jaccard pair emitter (r14
optimization round) — the `ngram_jaccard_pairs` prefix plan feeds
e2_jaccard_pairs and, via `_pair_graph`, e7d/e7e/e7f; its ~4-4.7 s at
sf0.1 (vs a 0.46 s DuckDB twin) is the family's shared floor
(SCALING_r14.md §1: 64% of e7f).

Components timed same-session, min-of-2 warm, noop sink:
  A. tokenize + explode + tdf aggregate (the df table alone)
  B. + rarity join + docsets collect_list groupBy
  C. + prefix explode + self-join + distinct  (candidates)
  D. full row (verify joins included)        == e2_jaccard_pairs

Usage: python scripts/jaccard_profile_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from decision_tree_stuff_spark.functions.text import tokens
    from decision_tree_stuff_spark.operators import spread_small
    from decision_tree_stuff_spark.operators.dedup import (
        _jaccard_prefix_join,
        ngram_jaccard_pairs,
    )
    from decision_tree_stuff_spark.queries._shared import _docs

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("jaccard-profile-r14")
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

    docs = _docs(spark, SF_DIR).withColumn(
        "len_bucket", (F.col("n_chars") / 100).cast("bigint")
    )
    id_col, text_col, block_cols, threshold = "doc_id", "text", ["lang", "len_bucket"], 0.8

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def drain() -> None:
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def timed(label, build):
        drain()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            noop(build())
            best = min(best, time.time() - t0)
        print(f"{label:55s} {best:7.2f}s", flush=True)
        return best

    arr = F.array_distinct(
        F.filter(tokens(F.col(text_col)), lambda t: t != F.lit(""))
    )

    def exploded_df():
        return spread_small(docs).select(
            F.col(id_col), *block_cols, F.explode(arr).alias("token")
        )

    def tdf_df():
        return exploded_df().groupBy("token").agg(
            F.count(F.lit(1)).alias("tdf")
        )

    def ranked_df():
        return exploded_df().join(tdf_df(), "token")

    def docsets_df():
        return (
            ranked_df()
            .groupBy(id_col, *block_cols)
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("tdf", "token"))
                ).alias("st")
            )
            .select(
                F.col(id_col),
                *block_cols,
                F.col("st").getField("token").alias("toks"),
                F.size("st").alias("n"),
            )
        )

    def candidates_df():
        ds = docsets_df()
        plen = (
            F.col("n")
            - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)).cast("int")
            + 1
        )
        pref = ds.select(
            F.col(id_col),
            F.col("n"),
            *block_cols,
            F.posexplode(F.slice(F.col("toks"), F.lit(1), plen)).alias(
                "pos", "token"
            ),
        )
        a = pref.select(
            F.col(id_col).alias("id_a"),
            F.col("n").alias("pna"),
            F.col("pos").alias("pos_a"),
            F.col("token"),
            *[F.col(c).alias(f"a_{c}") for c in block_cols],
        )
        b = pref.select(
            F.col(id_col).alias("id_b"),
            F.col("n").alias("pnb"),
            F.col("pos").alias("pos_b"),
            F.col("token"),
            *[F.col(c).alias(f"b_{c}") for c in block_cols],
        )
        cond = [
            a["token"] == b["token"],
            a["id_a"] < b["id_b"],
            a["pna"] >= F.lit(threshold) * b["pnb"] - F.lit(1e-9),
            b["pnb"] >= F.lit(threshold) * a["pna"] - F.lit(1e-9),
            F.lit(1)
            + F.least(a["pna"] - a["pos_a"] - 1, b["pnb"] - b["pos_b"] - 1)
            >= F.ceil(
                F.lit(threshold / (1.0 + threshold)) * (a["pna"] + b["pnb"])
                - F.lit(1e-9)
            ),
        ]
        for c in block_cols:
            cond.append(F.col(f"a_{c}") == F.col(f"b_{c}"))
        return a.join(b, cond).select("id_a", "id_b").distinct()

    def full_df():
        return ngram_jaccard_pairs(
            docs, block_cols=block_cols, threshold=threshold
        )

    timed("A. tokenize+explode+tdf agg", tdf_df)
    timed("B. + rarity join + docsets groupBy", docsets_df)
    timed("C. + prefix explode + self-join + distinct", candidates_df)
    timed("D. full emitter (verify included)", full_df)
    # candidate count for context
    n_cand = candidates_df().count()
    n_pairs = full_df().count()
    print(f"candidates={n_cand}  final_pairs={n_pairs}")
    spark.stop()


if __name__ == "__main__":
    main()
