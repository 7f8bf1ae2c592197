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
min/max), fractions are exact-int ratios rounded to 6dp half-away,
and the pass/fail comparison runs on the rounded value — so the
DuckDB twin matches bit-for-bit, including the booleans.

Scale (100 TB): one scan; the only non-trivially-cheap metric is
``uniqueness``'s exact distinct count (Spark plans multi-distinct
via expand — still one pass, but the distinct aggregation shuffles
key-cardinality rows). ``approx_distinct=True`` swaps in HLL++
(``approx_count_distinct``) for the 100 TB profile at the cost of
exact-oracle comparability — the same exact/sketch split
``textstats.corpus_profile`` ships.

Every metric except ``uniqueness`` is MERGEABLE (counts add, min/max
fold), so the suite also runs incrementally over a stream
(``streaming.stream_validate``): per micro-batch accumulator rows
folded into one state row, with the stream≡batch guarantee the other
mergeable folds carry. Uniqueness is the documented exclusion —
exact distinct over a stream needs key-sized state, which is a
different operator (``stream_exact_dedup`` keeps it).

Fraction denominators are total rows (``count(*)``): a null lang is
a row that fails ``in_set_fraction``, which is what a quality gate
wants. An empty input yields ``value = NULL, passed = False`` for
every fraction check (documented; ``row_count_min`` still reports 0).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

from decision_tree_stuff_spark.operators.classifier import _round_away

_RESULT_SCHEMA = (
    "check_name string, target_col string, value double, passed boolean"
)

#: merge kind per accumulator — how a per-batch metric row folds into
#: running state (streaming) or map-side partials fold (batch)
_MERGE = {"sum": F.sum, "min": F.min, "max": F.max}


def compile_checks(
    checks: Sequence[Dict],
    approx_distinct: bool = False,
    mergeable_only: bool = False,
) -> List[Tuple[str, Column, str]]:
    """Compile a suite into ``[(alias, agg_expr, merge_kind)]`` —
    one accumulator per metric, led by the shared ``__total``.
    ``mergeable_only`` rejects ``uniqueness`` (distinct counts do not
    fold; see module docstring)."""
    if not checks:
        raise ValueError("validate: empty check suite")
    specs: List[Tuple[str, Column, str]] = [
        ("__total", F.count(F.lit(1)), "sum")
    ]
    for i, c in enumerate(checks):
        kind = c["check"]
        col = c.get("column")
        a = f"__m{i}"
        if kind == "row_count_min":
            continue  # __total serves it
        if kind == "completeness":
            specs.append((a, F.count(F.col(col)), "sum"))
        elif kind == "uniqueness":
            if mergeable_only:
                raise ValueError(
                    "uniqueness is not a mergeable metric — exclude it "
                    "from streaming suites (stream_exact_dedup is the "
                    "keyed-state operator for stream distinctness)"
                )
            specs.append(
                (
                    a,
                    F.approx_count_distinct(col)
                    if approx_distinct
                    else F.countDistinct(col),
                    "sum",  # unused: uniqueness never reaches a fold
                )
            )
        elif kind == "min_value":
            specs.append((a, F.min(col), "min"))
        elif kind == "max_value":
            specs.append((a, F.max(col), "max"))
        elif kind == "in_set_fraction":
            specs.append(
                (
                    a,
                    F.sum(
                        F.when(
                            F.col(col).isin(list(c["values"])), 1
                        ).otherwise(0)
                    ),
                    "sum",
                )
            )
        elif kind == "in_range_fraction":
            specs.append(
                (
                    a,
                    F.sum(
                        F.when(
                            F.col(col).between(c["lo"], c["hi"]), 1
                        ).otherwise(0)
                    ),
                    "sum",
                )
            )
        elif kind == "pattern_fraction":
            specs.append(
                (
                    a,
                    F.sum(
                        F.when(F.col(col).rlike(c["pattern"]), 1).otherwise(0)
                    ),
                    "sum",
                )
            )
        else:
            raise ValueError(f"validate: unknown check kind {kind!r}")
    return specs


def assemble_results(checks: Sequence[Dict], m: Dict) -> List[tuple]:
    """Metrics row → one ``(check_name, target_col, value, passed)``
    tuple per check, in suite order. ``m`` maps accumulator aliases
    to collected values (``__total`` + ``__m{i}``)."""
    total = m["__total"]
    rows: List[tuple] = []
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
    return rows


def validate(
    df: DataFrame,
    checks: Sequence[Dict],
    approx_distinct: bool = False,
) -> DataFrame:
    """Run the check suite in one aggregate pass; returns a small
    result frame ``(check_name, target_col, value, passed)``, one row
    per check in suite order."""
    specs = compile_checks(checks, approx_distinct=approx_distinct)
    m = df.agg(*[expr.alias(a) for a, expr, _ in specs]).first().asDict()
    return df.sparkSession.createDataFrame(
        assemble_results(checks, m), _RESULT_SCHEMA
    )
