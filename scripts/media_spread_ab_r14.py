"""Same-session interleaved A/B: does raising scan parallelism
(spread_small-style round-robin) speed the e6 media synthesize+decode
rows, which today run as ONE task over the sub-rowgroup documents
scan (plans/r14/e6_png_*_after.txt: zero Exchange)?

Protocol: value identity (sorted-row hash) verified BEFORE timing;
variants alternate inside one session; min-of-2 warm into the noop
sink; GC drain between pairs.

Usage: python scripts/media_spread_ab_r14.py [sf_dir] [rounds] [rows]
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
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None
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
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("media-spread-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from decision_tree_stuff_spark import queries as Q

    reg = Q.ALL_QUERIES
    rows = ONLY or [
        "e6_png_16bit_decode",
        "e6_png_dyn_decode",
        "e6_png_rgb_decode",
        "e6_gif_frames",
    ]

    import decision_tree_stuff_spark.operators.multimodal as MM

    orig_synth_dec = MM.synthesize_decodable_media
    orig_synth = MM.synthesize_media
    orig_synth_hdr = MM.synthesize_header_media

    def spread(docs):
        from decision_tree_stuff_spark.operators import spread_small

        return spread_small(docs)

    def patched_dec(docs, *a, **k):
        return orig_synth_dec(spread(docs), *a, **k)

    def patched_synth(docs, *a, **k):
        return orig_synth(spread(docs), *a, **k)

    def patched_hdr(docs, *a, **k):
        return orig_synth_hdr(spread(docs), *a, **k)

    def set_variant(on: bool):
        MM.synthesize_decodable_media = patched_dec if on else orig_synth_dec
        MM.synthesize_media = patched_synth if on else orig_synth
        MM.synthesize_header_media = patched_hdr if on else orig_synth_hdr

    # ---- identity first ----
    for name in rows:
        set_variant(False)
        h0 = _row_hash(reg[name](spark, SF_DIR))
        set_variant(True)
        h1 = _row_hash(reg[name](spark, SF_DIR))
        ok = h0 == h1
        print(f"identity {name}: {ok}", flush=True)
        if not ok:
            print("ABORT: identity mismatch", flush=True)
            return

    # ---- timing ----
    def timed(name, on):
        set_variant(on)
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            _noop(reg[name](spark, SF_DIR))
            best = min(best, time.monotonic() - t0)
        return best

    for rnd in range(ROUNDS):
        for name in rows:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            a = timed(name, False)
            b = timed(name, True)
            print(
                f"round {rnd} {name}: asis={a:.2f}s spread={b:.2f}s",
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
