"""r14 §6 probe: PNG decode expression program built via strexpr
(SQL-text backend) vs the original Column (py4j) build — parse
feasibility, result identity on real encoded payloads across every
envelope-flag combination, and rough build-time split.

Usage: python scripts/strexpr_probe_r14.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import decision_tree_stuff_spark.operators.multimodal as mm  # noqa: E402
from decision_tree_stuff_spark.operators import strexpr  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.driver.memory", "8g")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("strexpr-probe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.createDataFrame([(i,) for i in range(1, 25)], "doc_id bigint")

CASES = [
    # (formats pair, fh, dh, filt)
    (("png", "pngc"), False, False, False),
    (("pngf", "png"), True, False, False),
    (("pngd", "pngdc"), False, True, False),
    (("pngflt", "pngfltc"), False, False, True),
    (("pngdflt", "pngdfltc"), True, True, True),
    (("pngga", "pnga"), False, False, False),
    (("pngdflta", "pngflt"), True, True, True),
]


def run(backend):
    mm._PNG_EXPR_BACKEND = backend
    out = []
    t_build = 0.0
    for fmts, fh, dh, filt in CASES:
        media = mm.synthesize_decodable_media(docs, formats=fmts)
        t0 = time.perf_counter()
        df = mm.decode_pixels(
            media,
            formats=("png",),
            png_fixed_huffman=fh,
            png_dynamic_huffman=dh,
            png_filters=filt,
        )
        t_build += time.perf_counter() - t0
        rows = sorted(
            (
                r["media_id"],
                r["img_format"],
                r["width"],
                r["height"],
                None if r["pixels"] is None else tuple(r["pixels"]),
            )
            for r in df.collect()
        )
        out.append(rows)
    return out, t_build


t0 = time.perf_counter()
col_out, col_build = run("column")
col_total = time.perf_counter() - t0

t0 = time.perf_counter()
sql_out, sql_build = run("sql")
sql_total = time.perf_counter() - t0

ok = True
for i, (a, b) in enumerate(zip(col_out, sql_out)):
    if a != b:
        ok = False
        print(f"CASE {i} MISMATCH: {CASES[i]}")
        for ra, rb in zip(a, b):
            if ra != rb:
                print("  col:", ra[:4], "sql:", rb[:4])
                break
print(
    f"identity={'OK' if ok else 'MISMATCH'} "
    f"column: build={col_build:.2f}s total={col_total:.2f}s | "
    f"sql: build={sql_build:.2f}s total={sql_total:.2f}s"
)

# SQL size stats for the biggest program
with strexpr.string_backend(mm):
    staged, finals = mm._png_plan_exprs(
        "payload", fixed_huffman=True, dynamic_huffman=True, filters=True
    )
sizes = {n: len(strexpr.to_sql(e)) for n, e in staged}
sizes["finals"] = sum(len(strexpr.to_sql(e)) for e in finals)
print("sql sizes (bytes):", sizes)
sys.exit(0 if ok else 1)
