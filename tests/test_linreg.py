"""Closed-form linear regression (E-12c): exact recovery, numpy
differential, partitioning bit-invariance, ridge, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.linreg import (
    linreg_fit,
    linreg_transform,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def lindf(spark):
    # y = 7 + 3*x1 - 2*x2 exactly, integer-valued throughout
    rows = [
        (i, (i * 13) % 29, 7 + 3 * i - 2 * ((i * 13) % 29))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "x1 long, x2 long, y long")


def test_exact_recovery_d1(spark):
    df = spark.createDataFrame(
        [(i, 3 + 2 * i) for i in range(50)], "x long, y long"
    )
    m = linreg_fit(df, "y", ["x"])
    assert m["intercept"] == pytest.approx(3.0, abs=1e-9)
    assert m["coefs"][0] == pytest.approx(2.0, abs=1e-12)
    assert m["r2"] == pytest.approx(1.0, abs=1e-12)
    out = linreg_transform(df, m, ["x"])
    assert all(r["prediction"] == float(r["y"]) for r in out.collect())


def test_exact_recovery_d2(lindf):
    m = linreg_fit(lindf, "y", ["x1", "x2"])
    assert m["intercept"] == pytest.approx(7.0, abs=1e-8)
    assert m["coefs"][0] == pytest.approx(3.0, abs=1e-10)
    assert m["coefs"][1] == pytest.approx(-2.0, abs=1e-10)
    assert m["r2"] == pytest.approx(1.0, abs=1e-12)


def test_numpy_differential_noisy(spark):
    # Non-degenerate noisy data: closed-form Cramer must agree with
    # numpy's least-squares to float precision.
    rng = [(i, (i * 7) % 23, (i * 11) % 19 + 5 * i - 3 * ((i * 7) % 23))
           for i in range(300)]
    df = spark.createDataFrame(rng, "x1 long, x2 long, y long")
    m = linreg_fit(df, "y", ["x1", "x2"])
    X = np.array([[1.0, r[0], r[1]] for r in rng])
    yv = np.array([float(r[2]) for r in rng])
    w_np, *_ = np.linalg.lstsq(X, yv, rcond=None)
    got = np.array([m["intercept"], *m["coefs"]])
    assert np.allclose(got, w_np, atol=1e-8)
    # r2 against numpy's residuals
    sse = float(((X @ w_np - yv) ** 2).sum())
    tss = float(((yv - yv.mean()) ** 2).sum())
    assert m["r2"] == pytest.approx(1.0 - sse / tss, abs=1e-9)


def test_partitioning_bit_invariance(lindf):
    """Integer-exact moments ⇒ the fit (coefficients included, not
    just rounded predictions) is identical under any partitioning."""
    m1 = linreg_fit(lindf.repartition(1), "y", ["x1", "x2"])
    m7 = linreg_fit(lindf.repartition(7, "x2"), "y", ["x1", "x2"])
    assert m1 == m7  # bit-exact dict equality


def test_ridge_shrinks(lindf):
    m0 = linreg_fit(lindf, "y", ["x1", "x2"])
    mr = linreg_fit(lindf, "y", ["x1", "x2"], ridge=1000.0)
    n0 = sum(c * c for c in m0["coefs"])
    nr = sum(c * c for c in mr["coefs"])
    assert nr < n0


def test_singular_raises(spark):
    df = spark.createDataFrame(
        [(1, i) for i in range(10)], "x long, y long"
    )
    with pytest.raises(ValueError, match="singular"):
        linreg_fit(df, "y", ["x"])  # constant feature vs intercept


def test_too_wide_raises(lindf):
    with pytest.raises(ValueError, match="closed form"):
        linreg_fit(lindf, "y", ["x1", "x2", "y"])


def test_transform_plan_shuffle_free(lindf):
    m = linreg_fit(lindf, "y", ["x1", "x2"])
    plan = _plan(linreg_transform(lindf, m, ["x1", "x2"]))
    assert "Exchange" not in plan
    assert "Join" not in plan
