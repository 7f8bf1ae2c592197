"""Closed-form linear regression via one-pass normal equations
(E-12c): the "fit once on an aggregate, score corpus-wide as a
projection" calibration pattern — e.g. a token-count estimator
(tokens ≈ a + b·chars + c·vowels) that lets a 100 TB pipeline budget
tokens without tokenizing every document.

Shape: ONE map-side-combined aggregate produces every moment the
normal equations need — n, Σxᵢ, Σy, Σxᵢxⱼ, Σxᵢy, Σy² — a single
O(d²)-wide row to the driver (d ≤ 2 features here); the (d+1)×(d+1)
system is solved in closed form (Cramer) and inference folds to one
shuffle-free projection of literals. Contrast with the iterative
gradient-descent classifier (``classifier.py``): same one-wide-agg
scale shape, but ONE pass instead of one per iteration.

Determinism contract (what makes the fit oracle-able bit-for-bit):
with integer-valued feature/target columns (counts — the calibration
use case) every moment is an exact BIGINT sum, so the collected Gram
matrix is partial-sum-order independent: any partitioning, any
engine, the same integers. The Cramer solve then runs the same IEEE
double expression tree here (Python) and in the DuckDB twin (SQL),
so the coefficients — not just the 6dp-rounded predictions — agree
bit-for-bit. Non-integer inputs still fit correctly but carry the
usual last-ULP partial-sum caveat (see the tree-threshold note in
ROUND7_NOTES.md).

R² is reported via the standard computational identity
SSE = Σy² − wᵀ(Xᵀy) (exact at the solved w up to the solve's own
float error — documented as the *definition* of the reported r2).

Beyond the reference (its modeling story is the decision tree);
included per the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame, functions as F


def linreg_fit(
    df: DataFrame,
    target_col: str,
    feature_cols: Sequence[str],
    ridge: float = 0.0,
) -> Dict:
    """Fit ``target ≈ w0 + Σ wᵢ·featureᵢ`` by normal equations.

    One aggregate job; returns ``{"intercept", "coefs", "r2", "n"}``.
    ``ridge`` > 0 adds λ to the feature diagonal (intercept
    unpenalized — standard ridge). Raises for singular systems (e.g.
    a constant feature colliding with the intercept) and for d > 2:
    the closed-form solve is spelled out as explicit 2×2/3×3 Cramer
    expressions so the DuckDB twin can mirror the arithmetic
    term-for-term — wider models belong to the iterative family.
    """
    feats = list(feature_cols)
    d = len(feats)
    if d not in (1, 2):
        raise ValueError(
            "linreg_fit solves d=1 or d=2 features in closed form "
            f"(got {d}); use the gradient-descent classifier family "
            "for wider models"
        )
    y = F.col(target_col).cast("bigint")
    xs = [F.col(c).cast("bigint") for c in feats]

    # Every moment as an exact integer sum — one wide agg, one row.
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
    ]
    for i, xi in enumerate(xs):
        aggs.append(F.sum(xi).alias(f"sx{i}"))
        aggs.append(F.sum(xi * y).alias(f"sx{i}y"))
        for j in range(i, d):
            aggs.append(F.sum(xi * xs[j]).alias(f"s{i}{j}"))
    m = df.agg(*aggs).first().asDict()
    if m["n"] == 0:
        raise ValueError("linreg_fit: empty input")

    # Floats from exact integers (< 2^53 by the count-data contract).
    n = float(m["n"])
    sy = float(m["sy"])
    syy = float(m["syy"])
    lam = float(ridge)

    if d == 1:
        sx = float(m["sx0"])
        sxy = float(m["sx0y"])
        sxx = float(m["s00"]) + lam
        det = n * sxx - sx * sx
        if det == 0.0:
            raise ValueError("linreg_fit: singular normal equations")
        w0 = (sy * sxx - sx * sxy) / det
        w = [(n * sxy - sy * sx) / det]
        wtb = w0 * sy + w[0] * sxy
    else:
        sx1, sx2 = float(m["sx0"]), float(m["sx1"])
        s1y, s2y = float(m["sx0y"]), float(m["sx1y"])
        s11 = float(m["s00"]) + lam
        s12 = float(m["s01"])
        s22 = float(m["s11"]) + lam
        # Cramer on A = [[n,sx1,sx2],[sx1,s11,s12],[sx2,s12,s22]],
        # b = [sy,s1y,s2y]; expression shape mirrored verbatim in the
        # DuckDB twin (queries.py "linreg_fit_transform") — do not
        # reassociate.
        det = (
            n * (s11 * s22 - s12 * s12)
            - sx1 * (sx1 * s22 - s12 * sx2)
            + sx2 * (sx1 * s12 - s11 * sx2)
        )
        if det == 0.0:
            raise ValueError("linreg_fit: singular normal equations")
        w0 = (
            sy * (s11 * s22 - s12 * s12)
            - sx1 * (s1y * s22 - s12 * s2y)
            + sx2 * (s1y * s12 - s11 * s2y)
        ) / det
        w1 = (
            n * (s1y * s22 - s12 * s2y)
            - sy * (sx1 * s22 - s12 * sx2)
            + sx2 * (sx1 * s2y - s1y * sx2)
        ) / det
        w2 = (
            n * (s11 * s2y - s1y * s12)
            - sx1 * (sx1 * s2y - s1y * sx2)
            + sy * (sx1 * s12 - s11 * sx2)
        ) / det
        w = [w1, w2]
        wtb = w0 * sy + w1 * s1y + w2 * s2y

    sse = syy - wtb
    tss = syy - sy * sy / n
    r2 = 1.0 - sse / tss if tss != 0.0 else float("nan")
    return {"intercept": w0, "coefs": w, "r2": r2, "n": int(m["n"])}


def linreg_transform(
    df: DataFrame,
    model: Dict,
    feature_cols: Sequence[str],
    output_col: str = "prediction",
) -> DataFrame:
    """Score with a fitted model: ONE shuffle-free projection of
    literal coefficients (left-associated sum, 6dp-rounded output —
    the engine-portable contract shared by the whole ML family)."""
    feats: List[str] = list(feature_cols)
    if len(feats) != len(model["coefs"]):
        raise ValueError(
            f"model has {len(model['coefs'])} coefficients but "
            f"{len(feats)} feature columns were given"
        )
    pred = F.lit(float(model["intercept"]))
    for c, w in zip(feats, model["coefs"]):
        pred = pred + F.lit(float(w)) * F.col(c).cast("double")
    return df.withColumn(output_col, F.round(pred, 6))
