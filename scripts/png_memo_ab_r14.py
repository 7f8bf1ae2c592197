"""Same-session A/B for the r14-optimization expression-program memo
(multimodal.py: ``_png_plan_exprs_cached`` + ``_decodable_payload_expr``).

Protocol (the box's documented rule: comparisons must be same-session,
interleaved, min-of-2 warm): for each PNG/GIF bench row
  1. clear both memo caches, run the query COLD (construct + analysis
     + codegen + exec) — absorbs codegen like bench run 1;
  2. run again with caches CLEARED first  -> "uncached warm" (what the
     pre-memo bench run 2 paid: construct + analysis + exec);
  3. run again with caches WARM           -> "memoized warm" (what the
     post-memo bench run 2 pays: analysis + exec);
  4. hash-verify the cached-built frame against a freshly-built one
     (cache_clear) so the memo provably changes nothing.

Usage: python scripts/png_memo_ab_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

ROWS = [
    "e6_png_decode",
    "e6_png_fixed_decode",
    "e6_png_dyn_decode",
    "e6_png_rgb_decode",
    "e6_png_filtered_decode",
    "e6_png_alpha_decode",
    "e6_png_palette_decode",
    "e6_png_16bit_decode",
    "e6_gif_decode",
    "e6_gif_frames",
    "e6_gif_lct",
]


def main() -> None:
    from decision_tree_stuff_spark.operators import multimodal as mm
    from decision_tree_stuff_spark.queries import ALL_QUERIES

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("png-memo-ab-r14")
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

    def clear_memo() -> None:
        mm._png_plan_exprs_cached.cache_clear()
        mm._decodable_payload_expr.cache_clear()
        mm._gif_plan_selects_cached.cache_clear()
        mm._gif_frames_plan_selects_cached.cache_clear()

    def drain() -> None:
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    def run(name: str) -> float:
        t0 = time.time()
        ALL_QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    def df_hash(df):
        cols = [F.col(c).cast("string") for c in df.columns]
        return df.select(
            F.sha2(F.concat_ws("\x1f", *cols), 256).alias("h")
        ).agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10))).first()[0]

    print(f"{'row':28s} {'cold':>7s} {'unc_warm':>9s} {'memo_warm':>10s}")
    for name in ROWS:
        drain()
        clear_memo()
        cold = run(name)
        clear_memo()
        unc = run(name)
        warm = run(name)
        # identity: cached-built vs fresh-built frame hashes
        hc = df_hash(ALL_QUERIES[name](spark, SF_DIR))
        clear_memo()
        hf = df_hash(ALL_QUERIES[name](spark, SF_DIR))
        ident = "OK" if hc == hf else f"MISMATCH {hc} != {hf}"
        print(
            f"{name:28s} {cold:7.2f} {unc:9.2f} {warm:10.2f}  identity={ident}",
            flush=True,
        )
        if hc != hf:
            raise SystemExit(f"identity mismatch on {name}")
    spark.stop()


if __name__ == "__main__":
    main()
