"""r15 verdict task 4: validate the r14 cache defaults at sf1 (the
100 TB arguments rested on sf0.1 A/Bs + reasoning).

Knobs under test, each interleaved same-session, min-of-2 warm into
the noop sink, row-count identity checked (full hashes prohibitive at
sf1; value identity of the knobs is pinned by the r14 differential
tests at small SF — the knobs are plan-level only):

  1. ngram_jaccard_pairs cache_docsets (shipped default True — the
     O(corpus) cache the verdict flags as unvalidated at scale),
     in the real e2_jaccard_pairs shape (lang x len_bucket blocks).
  2. bm25_topk cache_tf (shipped default False; the composed
     retrieval pipeline opts in).
  3. kmv_set_estimates cache_sketches (shipped default False), in
     the real e4_kmv_overlap 3-token-shingle shape.

Data: a perturbed sf1 (scripts/make_scaled_sf.py /tmp/sf1p 10
perturb) so the near-dup pair graph grows ~linearly — the realistic
corpus shape per the generator's doc.

Usage: python scripts/cache_defaults_sf1_r15.py [sf1_dir] [rounds]
"""

from __future__ import annotations

import gc
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1p"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("cache-defaults-sf1")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from decision_tree_stuff_spark.functions.text import tokens
    from decision_tree_stuff_spark.operators.dedup import ngram_jaccard_pairs
    from decision_tree_stuff_spark.operators.retrieval import bm25_topk
    from decision_tree_stuff_spark.operators.sketch import (
        kmv_set_estimates,
        kmv_sketch,
    )
    from decision_tree_stuff_spark.queries._shared import _docs

    docs = _docs(spark, SF_DIR)
    _noop(docs)  # warmup
    print(f"sf1 docs: {docs.count()}", flush=True)

    def drain():
        spark.catalog.clearCache()
        gc.collect()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def timed(mk):
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            _noop(mk())
            best = min(best, time.monotonic() - t0)
        return best

    # --- 1. jaccard docsets cache (real e2_jaccard_pairs shape) ---
    jdocs = docs.withColumn(
        "len_bucket", (F.col("n_chars") / 100).cast("bigint")
    )

    def jac(cached):
        return ngram_jaccard_pairs(
            jdocs,
            block_cols=["lang", "len_bucket"],
            threshold=0.8,
            cache_docsets=cached,
        )

    c0 = jac(False).count()
    c1 = jac(True).count()
    print(f"jaccard rows lazy={c0} cached={c1} match={c0 == c1}", flush=True)
    for rnd in range(ROUNDS):
        drain()
        a = timed(lambda: jac(False))
        drain()
        b = timed(lambda: jac(True))
        print(
            f"round {rnd} jaccard: lazy={a:.2f}s cache_docsets={b:.2f}s",
            flush=True,
        )

    # --- 2. bm25 cache_tf ---
    probe_ids = [r["doc_id"] for r in docs.limit(5).collect()]
    probes = docs.where(F.col("doc_id").isin(probe_ids)).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )

    def bm25(cached):
        return bm25_topk(docs, probes, k=10, cache_tf=cached)

    c0 = bm25(False).count()
    c1 = bm25(True).count()
    print(f"bm25 rows lazy={c0} cached={c1} match={c0 == c1}", flush=True)
    for rnd in range(ROUNDS):
        drain()
        a = timed(lambda: bm25(False))
        drain()
        b = timed(lambda: bm25(True))
        print(
            f"round {rnd} bm25: lazy={a:.2f}s cache_tf={b:.2f}s", flush=True
        )

    # --- 3. kmv cache_sketches (real e4_kmv_overlap shape) ---
    t = tokens(F.col("text"))
    sh = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    shingled = docs.select(
        (F.col("doc_id") % 2).alias("side"), F.explode(sh).alias("shingle")
    )

    def kmv(cached):
        sa = kmv_sketch(shingled.where("side = 0"), "shingle")
        sb = kmv_sketch(shingled.where("side = 1"), "shingle")
        return kmv_set_estimates(sa, sb, cache_sketches=cached)

    c0 = kmv(False).count()
    c1 = kmv(True).count()
    print(f"kmv rows lazy={c0} cached={c1} match={c0 == c1}", flush=True)
    for rnd in range(ROUNDS):
        drain()
        a = timed(lambda: kmv(False))
        drain()
        b = timed(lambda: kmv(True))
        print(
            f"round {rnd} kmv: lazy={a:.2f}s cache_sketches={b:.2f}s",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
