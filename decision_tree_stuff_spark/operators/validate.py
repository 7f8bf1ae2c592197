"""Declarative data-quality validation suite (E-13): Deequ-style
checks (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB'18) computed in ONE pass over the corpus — the
gate a production ingest pipeline runs before (and after) every
transformation stage.

A check suite is a list of dicts; ``validate`` compiles every metric
the suite needs into a SINGLE wide aggregate (all map-side
combinable: counts, conditional counts, min/max — plus distinct
counts for uniqueness checks), collects the one metrics row, and
emits one result row per check: ``(check_name, target_col, value,
passed)``.

Supported checks::

    {"check": "row_count_min",     "min": N}
    {"check": "completeness",      "column": c, "min": frac}  # non-null
    {"check": "uniqueness",        "column": c, "min": frac}  # distinct/total
    {"check": "min_value",         "column": c, "ge": x}
    {"check": "max_value",         "column": c, "le": x}
    {"check": "in_set_fraction",   "column": c, "values": [...], "min": frac}
    {"check": "in_range_fraction", "column": c, "lo": a, "hi": b, "min": frac}
    {"check": "pattern_fraction",  "column": c, "pattern": re, "min": frac}

Determinism: every metric is integer-derived (counts and integer
min/max), fractions are exact-int ratios rounded to 6dp, and the
pass/fail comparison runs on the rounded value — so the DuckDB twin
matches bit-for-bit, including the booleans.

Scale (100 TB): one scan; the only non-trivially-cheap metric is
``uniqueness``'s exact distinct count (Spark plans multi-distinct
via expand — still one pass, but the distinct aggregation shuffles
key-cardinality rows). ``approx_distinct=True`` swaps in HLL++
(``approx_count_distinct``) for the 100 TB profile at the cost of
exact-oracle comparability — the same exact/sketch split
``textstats.corpus_profile`` ships.

Fraction denominators are NON-NULL row counts? No — total rows
(``count(*)``): a null lang is a row that fails ``in_set_fraction``,
which is what a quality gate wants. An empty input yields
``value = NULL, passed = False`` for every fraction check (documented;
``row_count_min`` still reports 0).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame, functions as F

from decision_tree_stuff_spark.operators.classifier import _round_away

_RESULT_SCHEMA = (
    "check_name string, target_col string, value double, passed boolean"
)


def validate(
    df: DataFrame,
    checks: Sequence[Dict],
    approx_distinct: bool = False,
) -> DataFrame:
    """Run the check suite in one aggregate pass; returns a small
    result frame ``(check_name, target_col, value, passed)``, one row
    per check in suite order."""
    if not checks:
        raise ValueError("validate: empty check suite")

    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(checks):
        kind = c["check"]
        col = c.get("column")
        a = f"__m{i}"
        if kind == "row_count_min":
            continue  # __total serves it
        if kind == "completeness":
            aggs.append(F.count(F.col(col)).alias(a))
        elif kind == "uniqueness":
            aggs.append(
                (
                    F.approx_count_distinct(col)
                    if approx_distinct
                    else F.countDistinct(col)
                ).alias(a)
            )
        elif kind == "min_value":
            aggs.append(F.min(col).alias(a))
        elif kind == "max_value":
            aggs.append(F.max(col).alias(a))
        elif kind == "in_set_fraction":
            aggs.append(
                F.sum(
                    F.when(F.col(col).isin(list(c["values"])), 1).otherwise(0)
                ).alias(a)
            )
        elif kind == "in_range_fraction":
            aggs.append(
                F.sum(
                    F.when(
                        F.col(col).between(c["lo"], c["hi"]), 1
                    ).otherwise(0)
                ).alias(a)
            )
        elif kind == "pattern_fraction":
            aggs.append(
                F.sum(
                    F.when(F.col(col).rlike(c["pattern"]), 1).otherwise(0)
                ).alias(a)
            )
        else:
            raise ValueError(f"validate: unknown check kind {kind!r}")

    m = df.agg(*aggs).first().asDict()
    total = m["__total"]

    rows: List = []
    for i, c in enumerate(checks):
        kind = c["check"]
        col = c.get("column")
        a = f"__m{i}"
        if kind == "row_count_min":
            value = float(total)
            passed = value >= float(c["min"])
        elif kind in ("completeness", "uniqueness", "in_set_fraction",
                      "in_range_fraction", "pattern_fraction"):
            if total == 0:
                value, passed = None, False
            else:
                # half-away like F.round/DuckDB round (not Python's
                # half-even builtin)
                value = _round_away(float(m[a]) / float(total), 6)
                passed = value >= float(c["min"])
        elif kind == "min_value":
            value = None if m[a] is None else float(m[a])
            passed = value is not None and value >= float(c["ge"])
        elif kind == "max_value":
            value = None if m[a] is None else float(m[a])
            passed = value is not None and value <= float(c["le"])
        rows.append((kind, col, value, passed))

    return df.sparkSession.createDataFrame(rows, _RESULT_SCHEMA)
