"""Scalar/array Column-expression helpers shared by the operators.

Everything here is a pure ``pyspark.sql.functions`` composition — JVM
expressions inside whole-stage codegen, zero Python UDFs — so each
helper has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from decision_tree_stuff_spark.functions.array_math import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from decision_tree_stuff_spark.functions.text import (
    fingerprint,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "fingerprint",
    "normalize_text",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "tokens",
]
