"""Same-session interleaved A/B for the r14 second-session replay
caches (guide §5): temperature_sample cache_counts, bm25_topk
cache_tf, the retrieval-pipeline fused persist, and the ingest
keepalive chain.

Per the box-noise protocol: before/after variants alternate inside
ONE session, min-of-2 warm into the noop sink, GC drain before each
pair; value identity (sorted-row hash) is verified per row BEFORE any
timing is trusted.

Usage: python scripts/replay_cache_ab_r14b.py [sf_dir] [rounds]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _row_hash(df) -> str:
    rows = df.collect()
    cols = sorted(df.columns)

    def norm(v):
        if isinstance(v, float):
            return round(v, 6)
        return v

    keyed = sorted(
        tuple(repr(norm(r[c])) for c in cols) for r in rows
    )
    h = hashlib.md5()
    for t in keyed:
        h.update("|".join(t).encode())
    return h.hexdigest()


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("replay-cache-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from decision_tree_stuff_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from decision_tree_stuff_spark.operators.similarity import cosine_topk
    from decision_tree_stuff_spark.operators.sampling import (
        temperature_sample,
    )
    from decision_tree_stuff_spark.operators.decontam import (
        ngram_contamination,
    )
    from decision_tree_stuff_spark.queries import ALL_QUERIES
    from decision_tree_stuff_spark.queries._shared import (
        BM25_B,
        BM25_K,
        BM25_K1,
        BM25_QUERIES,
        DECON_N,
        DECON_THRESHOLD,
        HYBRID_K,
        HYBRID_PROBES,
        _docs,
        _emb,
    )

    def docs():
        return _docs(spark, SF_DIR)

    def probes():
        return docs().where(F.col("doc_id").isin(HYBRID_PROBES)).select(
            F.col("doc_id").alias("query_id"),
            F.col("text").alias("query_text"),
        )

    # ---- before/after thunk pairs -------------------------------
    def temp_before():
        return temperature_sample(
            docs().select("doc_id", "lang"), "lang", total_n=100,
            alpha=0.5, key_cols=["doc_id"], seed="t7",
            cache_counts=False,
        )

    def temp_after():
        return ALL_QUERIES["e8_temperature_sample"](spark, SF_DIR)

    def bm25_before():
        q = spark.createDataFrame(
            BM25_QUERIES, "query_id int, query_text string"
        )
        return bm25_topk(
            docs(), q, k=BM25_K, k1=BM25_K1, b=BM25_B, cache_tf=False
        )

    def bm25_after():
        return ALL_QUERIES["e4_bm25_topk"](spark, SF_DIR)

    def _hybrid(cache_tf):
        lex0 = bm25_topk(
            docs(), probes(), k=HYBRID_K, k1=BM25_K1, b=BM25_B,
            cache_tf=cache_tf,
        )
        lex = lex0.select("query_id", "doc_id", "rank")
        dense = cosine_topk(
            _emb(spark, SF_DIR), HYBRID_PROBES, k=HYBRID_K
        ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
        out = rrf_fuse(lex, dense, k=HYBRID_K)
        out._keep = lex0
        return out

    def hybrid_before():
        return _hybrid(False)

    def hybrid_after():
        return ALL_QUERIES["e4_hybrid_rrf"](spark, SF_DIR)

    def retrieval_before():
        # the pre-change body: no fused persist, no tf cache
        d = docs()
        lex = bm25_topk(
            d, probes(), k=HYBRID_K, k1=BM25_K1, b=BM25_B, cache_tf=False
        ).select("query_id", "doc_id", "rank")
        dense = cosine_topk(
            _emb(spark, SF_DIR), HYBRID_PROBES, k=HYBRID_K
        ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
        fused = rrf_fuse(lex, dense, k=HYBRID_K)
        retrieved = d.join(fused.select("doc_id").distinct(), "doc_id")
        contaminated = (
            ngram_contamination(
                retrieved, d.where("doc_id % 7 = 0"),
                n=DECON_N, threshold=DECON_THRESHOLD,
            )
            .select(F.col("train_id").alias("doc_id"))
            .distinct()
        )
        return fused.join(contaminated, "doc_id", "left_anti").select(
            "query_id", "doc_id", "rrf_score", "rank"
        )

    def retrieval_after():
        return ALL_QUERIES["e4_retrieval_pipeline"](spark, SF_DIR)

    import decision_tree_stuff_spark.operators.sampling as _samp

    _orig_temp = _samp.temperature_sample

    def ingest_before():
        # pre-change behavior: quota counts uncached (flag off) and no
        # keepalive chain (the uncached flag already reproduces the
        # replayed plan, keepalive of an uncached frame is inert)
        def _uncached(*a, **kw):
            kw["cache_counts"] = False
            return _orig_temp(*a, **kw)

        _samp.temperature_sample = _uncached
        try:
            return ALL_QUERIES["e12_batch_ingest"](spark, SF_DIR)
        finally:
            _samp.temperature_sample = _orig_temp

    def ingest_after():
        return ALL_QUERIES["e12_batch_ingest"](spark, SF_DIR)

    cases = [
        ("e8_temperature_sample", temp_before, temp_after),
        ("e4_bm25_topk", bm25_before, bm25_after),
        ("e4_hybrid_rrf", hybrid_before, hybrid_after),
        ("e4_retrieval_pipeline", retrieval_before, retrieval_after),
        ("e12_batch_ingest", ingest_before, ingest_after),
    ]

    def drain():
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    # value identity first
    for name, before, after in cases:
        hb, ha = _row_hash(before()), _row_hash(after())
        print(f"{name}: identity {'OK' if hb == ha else 'MISMATCH'} "
              f"({hb[:12]})", flush=True)
        assert hb == ha, name
    drain()

    def timed(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _noop(fn())
            best = min(best, time.time() - t0)
        return best

    for name, before, after in cases:
        for rnd in range(ROUNDS):
            drain()
            tb = timed(before)
            drain()
            ta = timed(after)
            print(
                f"{name} round{rnd}: before {tb:.2f}s after {ta:.2f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
