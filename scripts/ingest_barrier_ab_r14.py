"""Same-session interleaved A/B: does a materialization barrier after
the semantic_decontam stage (the r9 bloom-barrier precedent) beat the
shipped e12_batch_ingest, where pack_sequences' two input references
plus temperature_sample's ranked stream still execute the semantic
stage ~3x in one plan?

Identity (sorted-row hash) verified before timing; variants alternate
in one session; min-of-2 warm into the noop sink; GC drain per pair.

Usage: python scripts/ingest_barrier_ab_r14.py [sf_dir] [rounds]
"""

from __future__ import annotations

import gc
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
    keyed = sorted(tuple(repr(r[c]) for c in cols) for r in rows)
    h = hashlib.md5()
    for t in keyed:
        h.update("|".join(t).encode())
    return h.hexdigest()


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ingest-barrier-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from decision_tree_stuff_spark.queries.ingest import (
        ingest_stages,
        q_e12_batch_ingest,
    )
    from decision_tree_stuff_spark.queries._shared import _docs
    from decision_tree_stuff_spark.utils import (
        keepalive,
        release_local_checkpoint,
    )

    def build_shipped():
        return q_e12_batch_ingest(spark, SF_DIR)

    def build_barrier():
        docs = _docs(spark, SF_DIR)
        out = docs
        frames = []
        for name, fn in ingest_stages(spark, SF_DIR):
            out = fn(out)
            if name == "semantic_decontam":
                out = out.localCheckpoint(eager=True)
            frames.append(out)
        return keepalive(
            out.select(
                "doc_id", "lang", "n_tokens", "pack_id", "pack_offset"
            ),
            *frames,
        )

    h0 = _row_hash(build_shipped())
    h1 = _row_hash(build_barrier())
    print(f"identity: {h0 == h1}", flush=True)
    if h0 != h1:
        print("ABORT: identity mismatch", flush=True)
        return

    def timed(builder):
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            _noop(builder())
            best = min(best, time.monotonic() - t0)
        return best

    for rnd in range(ROUNDS):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        a = timed(build_shipped)
        b = timed(build_barrier)
        print(
            f"round {rnd}: shipped={a:.2f}s sem_barrier={b:.2f}s",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
