"""Same-session A/B for the r12 distinct-word-types encode mode
(r11 verdict task 2): unigram_encode and bpe_encode, per-occurrence
vs distinct-types, at sf0.1 and the perturbed-replica sf10p fixture.
Driver protocol (GC drain, min-of-2 warm noop; single run past 60 s).
r11 reference walls: e4_unigram_encode 13.8 s (sf0.1 driver) / 159 s
(sf10p, SCALING_r11.md). Usage:
  python scripts/encode_ab_r12.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf10p"]


def main() -> None:
    from pyspark.sql import SparkSession

    from decision_tree_stuff_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        unigram_encode,
        unigram_lm_train,
    )
    from decision_tree_stuff_spark.queries._shared import BPE_MERGES

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("encode-ab-r12")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def drain():
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def timed(build):
        drain()
        t0 = time.time()
        noop(build())
        best = time.time() - t0
        if best < 60:
            t0 = time.time()
            noop(build())
            best = min(best, time.time() - t0)
        return round(best, 2)

    out = {}
    for sf_dir in SF_DIRS:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        pieces = unigram_lm_train(
            docs, vocab_size=40, seed_size=60, max_piece_len=3,
            max_word_len=8, em_iters=2,
        )
        merges = bpe_train(docs, n_merges=BPE_MERGES)
        for tag, build in [
            ("unigram_occurrence", lambda: unigram_encode(docs, pieces)),
            ("unigram_types",
             lambda: unigram_encode(docs, pieces, distinct_types=True)),
            ("bpe_occurrence", lambda: bpe_encode(docs, merges)),
            ("bpe_types",
             lambda: bpe_encode(docs, merges, distinct_types=True)),
        ]:
            sec = timed(build)
            out[f"{sf_dir}:{tag}"] = sec
            print(f"  {sf_dir} {tag}: {sec}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
