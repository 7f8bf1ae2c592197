"""Same-session sf10p A/B for the two r11 ingest levers (r10 verdict
tasks 5 + 9), one timed end-to-end run per variant (the pipeline
materializes its own barriers; the r9/r10 slope protocol also used
single runs at this scale):

  A. r11 shipped: survivor-only LM scoring + 'rows' barriers
  B. r10 shape:  FULL-corpus LM scoring (reconstructed here) +
                 'rows' barriers — isolates the task-5 delta
  C. ids barriers: survivor-only LM + barrier_mode='ids'
                 (checkpoint kept ids, re-derive rows from the scan)
                 — the task-9 lever

Usage: python scripts/ingest_ab_r11.py [sf_dir]   (default /tmp/sf10p)
48g driver / 128 shuffle partitions — the SCALING_r10 sf10p remedy.
Prints one JSON line with wall seconds + manifest row counts (the
counts must agree across variants or the A/B is void).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10p"


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from decision_tree_stuff_spark.queries._shared import _docs
    from decision_tree_stuff_spark.queries.ingest import (
        INGEST_LM_T,
        ingest_stages,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ingest-ab-r11")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(stages_fn):
        # time the WHOLE pipeline like scripts/scaling_bench.py does —
        # the barriers are EAGER checkpoints, so stage application
        # executes most of the work; timing only the final action
        # would miss it
        t0 = time.time()
        out = _docs(spark, SF_DIR)
        for _, fn in stages_fn():
            out = fn(out)
        n = out.select(
            "doc_id", "lang", "n_tokens", "pack_id", "pack_offset"
        ).count()
        return round(time.time() - t0, 2), n

    def old_lm_stages():
        """The r10 shape: score the FULL corpus under its own model,
        join survivors back (queries/ingest.py@r10 lm_gate)."""
        from decision_tree_stuff_spark.operators.textstats import (
            unigram_logprob,
        )

        stages = ingest_stages(spark, SF_DIR)

        def lm_gate_old(d):
            scored = unigram_logprob(_docs(spark, SF_DIR)).where(
                F.col("mean_logprob") >= INGEST_LM_T
            )
            return d.join(scored.select("doc_id"), "doc_id")

        return [
            (n, lm_gate_old if n == "lm_gate" else fn) for n, fn in stages
        ]

    out = {}
    for label, stages_fn in (
        ("A_survivor_lm_rows", lambda: ingest_stages(spark, SF_DIR)),
        ("B_fullcorpus_lm_rows", old_lm_stages),
        (
            "C_survivor_lm_ids",
            lambda: ingest_stages(spark, SF_DIR, barrier_mode="ids"),
        ),
    ):
        sec, n = run(stages_fn)
        out[label] = {"sec": sec, "manifest_rows": n}
        print(f"  {label}: {sec}s rows={n}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(1)

    print(json.dumps({"sf_dir": SF_DIR, "variants": out}))
    spark.stop()


if __name__ == "__main__":
    main()
