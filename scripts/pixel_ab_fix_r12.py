"""Confirmation A/B for the e6_pixel_decode fix (r11 verdict task 1,
part 2): three decode bodies, one session, driver protocol, on the
gate row's own BMP/PPM-only input —

  * r10  (commit 1b4deef): no PNG support at all,
  * r11  (commit d64681c, pre-fix): PNG walks as signature-guarded
    staged columns inside every caller's single projection,
  * r12  (working tree): format dispatch BEFORE the projection —
    signature filter splits PNG rows to their own plan; the non-PNG
    plan is the r10 body verbatim.

The r12 number should land on the r10 number, not the r11 one.
Interleaved 2x per body so a load transient cannot masquerade as a
code effect. Usage: python scripts/pixel_ab_fix_r12.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
BODIES = {"r10_body": "1b4deef", "r11_body": "d64681c"}


def _load(tag, commit):
    src = subprocess.run(
        ["git", "show",
         f"{commit}:decision_tree_stuff_spark/operators/multimodal.py"],
        capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout
    path = f"/tmp/_mm_{tag}.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(f"_mm_{tag}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from decision_tree_stuff_spark.operators import multimodal as mm_r12
    from decision_tree_stuff_spark.queries.media import _hex_packed_pixels

    mods = {t: _load(t, c) for t, c in BODIES.items()}
    mods["r12_body"] = mm_r12

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("pixel-ab-fix-r12")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))

    def drain():
        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") % 7 == 0)
    )

    def run(mod, formats=None):
        media = mod.synthesize_decodable_media(docs)
        if formats is not None:
            out = mod.decode_pixels(media, formats=formats)
        else:
            out = mod.decode_pixels(media)
        noop(_hex_packed_pixels(out))

    # sanity: the three bodies agree on the decoded output
    counts = {}
    for tag, mod in mods.items():
        media = mod.synthesize_decodable_media(docs.limit(50))
        out = _hex_packed_pixels(mod.decode_pixels(media))
        counts[tag] = sorted(
            tuple(r) for r in out.collect()
        )
    assert counts["r10_body"] == counts["r11_body"] == counts["r12_body"], \
        "bodies disagree on BMP/PPM decode output"
    counts_h = sorted(tuple(r) for r in _hex_packed_pixels(
        mm_r12.decode_pixels(mm_r12.synthesize_decodable_media(docs.limit(50)),
                             formats=("bmp", "ppm"))).collect())
    assert counts_h == counts["r12_body"], "hinted output differs"

    # r12_auto = full signature-dispatch union (unknown inventory);
    # r12_hinted = what the gate row now runs (formats contract)
    variants = {
        "r10_body": ("r10_body", None),
        "r11_body": ("r11_body", None),
        "r12_auto": ("r12_body", None),
        "r12_hinted": ("r12_body", ("bmp", "ppm")),
    }
    times = {t: [] for t in variants}
    order = list(variants) * 2
    for tag in order:
        mod_tag, formats = variants[tag]
        drain()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run(mods[mod_tag], formats)
            best = min(best, time.time() - t0)
        times[tag].append(round(best, 3))
        print(f"  {tag}: {best:.3f}", file=sys.stderr, flush=True)

    out = {t: {"min": min(v), "runs": v} for t, v in times.items()}
    out["driver"] = {"r10": 2.029, "r11": 4.246}
    print(json.dumps({"sf_dir": SF_DIR, "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
