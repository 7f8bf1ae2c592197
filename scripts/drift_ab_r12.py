"""Same-session A/B for the r11 drift watch (r11 verdict task 1).

Two questions, one session, driver protocol (per-query GC drain,
min-of-2 warm noop sink, local[32], sf0.1):

1. **e6_pixel_decode 2.03 -> 4.25 s**: the one drifted row WITH a
   coincident code change — r11 put the PNG chunk/block-walk folds
   into decode_pixels' plan as signature-guarded staged columns, so
   every caller (including the BMP/PPM-only gate row) carries them.
   A/B the r10 decode body (extracted verbatim from the round-10
   snapshot commit 1b4deef into an importlib module — no PNG
   expressions anywhere) against the current one ON THE SAME
   BMP/PPM-only input. A persistent gap = the PNG expressions cost
   non-PNG callers (codegen growth / per-batch expression overhead)
   and the format-dispatch fix is warranted; parity = box noise.

2. **Five drifted rows with UNTOUCHED plans** (judge list):
   e3_rp_topk, e9_bloom_decontam, e4_lm_backoff, e4_bm25_topk,
   e2_edit_verified — same protocol as scripts/drift_ab_r11.py:
   which round's number does a fresh same-session timing reproduce?

Usage: python scripts/drift_ab_r12.py [sf_dir]   (default sf0.1)
Prints one JSON line; the table goes into SCALING_r12.md.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
R10_COMMIT = "1b4deef"

# name -> (r10 driver sec, r11 driver sec) from BENCH_DETAIL_r10/r11
DRIFTED = {
    "e3_rp_topk": (1.379, 2.856),
    "e9_bloom_decontam": (1.915, 3.78),
    "e4_lm_backoff": (1.984, 3.525),
    "e4_bm25_topk": (1.463, 2.593),
    "e2_edit_verified": (3.016, 5.552),
}


def _load_r10_multimodal():
    src = subprocess.run(
        ["git", "show",
         f"{R10_COMMIT}:decision_tree_stuff_spark/operators/multimodal.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = "/tmp/_mm_r10_ab.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("_mm_r10_ab", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from decision_tree_stuff_spark.operators import multimodal as mm_now
    from decision_tree_stuff_spark.queries import ALL_QUERIES
    from decision_tree_stuff_spark.queries.media import _hex_packed_pixels

    mm_r10 = _load_r10_multimodal()

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("drift-ab-r12")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))  # warmup

    def drain():
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def timed(build, n=2):
        drain()
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            noop(build())
            best = min(best, time.time() - t0)
        return round(best, 3)

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") % 7 == 0)
    )

    out = {}

    # --- part 1: the pixel-decode code A/B (same input, two bodies) ---
    def decode_with(mod):
        media = mod.synthesize_decodable_media(docs)
        return _hex_packed_pixels(mod.decode_pixels(media))

    pix = {}
    # interleave r10/r11 twice so a load transient cannot masquerade
    # as a code effect
    for tag, mod in (("r10_body", mm_r10), ("r11_body", mm_now),
                     ("r10_body", mm_r10), ("r11_body", mm_now)):
        t = timed(lambda: decode_with(mod))
        pix.setdefault(tag, []).append(t)
        print(f"  e6_pixel_decode[{tag}]: {t}", file=sys.stderr, flush=True)
    out["e6_pixel_decode_ab"] = {
        "driver_r10": 2.029, "driver_r11": 4.246,
        "r10_body": min(pix["r10_body"]),
        "r11_body": min(pix["r11_body"]),
        "all_runs": pix,
    }

    # --- part 2: untouched drifted rows ---
    for name, (r10, r11) in DRIFTED.items():
        now = timed(lambda: ALL_QUERIES[name](spark, SF_DIR))
        verdict = "r10" if abs(now - r10) <= abs(now - r11) else "r11"
        out[name] = {"r10": r10, "r11": r11, "now": now,
                     "closer_to": verdict}
        print(f"  {name}: r10={r10} r11={r11} now={now} -> {verdict}",
              file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
