"""Vector math over ``array<float>`` columns as built-in expressions.

``F.zip_with`` + ``F.aggregate`` keep the dot product JVM-side
(SURVEY.md §2.5 E-3): no Python UDF, no Arrow transfer, and Catalyst
treats the whole thing as one projection — at 100 TB the cost is the
scan, not the math. All arithmetic is forced to DOUBLE so results are
bit-comparable with the DuckDB oracle's
``list_sum(list_transform(list_zip(a, b), x -> CAST(x[1] AS DOUBLE) *
CAST(x[2] AS DOUBLE)))`` form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return arr.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine in double precision; NULL if either vector is all-zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0.0, dot_product(a, b) / denom)
