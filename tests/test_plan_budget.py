"""Analyzer/plan-build budget for the heavy media plans (r13, r12
verdict task 7): the e6_png_decode / e6_png_fixed_decode bench floor
(~10-12 s at sf0.1) is almost entirely ONE-TIME driver-side cost, not
per-row compute. Measured breakdown (SCALING_r13.md):

* ~5-6 s  Python-side expression construction (py4j round trips
          building the chunk/block/symbol-walk Column tree) — data-
          independent;
* ~1 s    JVM analysis + optimization + physical planning;
* ~2.4 s  execution at sf0.1 (codegen compile included in the first
          run only; re-executing the SAME DataFrame costs the same,
          so there is no cross-action analysis re-pay to reuse).

This test pins a generous regression budget on the one-time part so
an expression-tree blow-up (the pre-``_let`` fixed-Huffman walk OOMed
the analyzer outright — the failure mode this guards) is caught as a
slow/failed build, while ±50% box noise can't flake it."""

from __future__ import annotations

import time

# 6-10x headroom over the measured ~6.7 s combined one-time cost; a
# regression to quadratic tree copying blows through this immediately
# (the r12 pre-_let walk never finished analysis at all).
BUILD_PLUS_PLAN_BUDGET_SEC = 45.0


def test_png_plan_build_within_budget(spark, sf_dir):
    from decision_tree_stuff_spark.queries import ALL_QUERIES

    for name in (
        "e6_png_decode",
        "e6_png_fixed_decode",
        "e6_png_dyn_decode",  # r13: four staged DH columns — the row
        #   this budget most exists for
    ):
        t0 = time.time()
        df = ALL_QUERIES[name](spark, sf_dir)
        df._jdf.queryExecution().executedPlan()
        elapsed = time.time() - t0
        assert elapsed < BUILD_PLUS_PLAN_BUDGET_SEC, (name, elapsed)
