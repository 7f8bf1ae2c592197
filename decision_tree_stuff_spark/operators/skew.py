"""Skew-handling primitives for hot-key aggregations and joins.

At 100 TB a handful of hot keys (one language, one event type, an
empty-string token) can pin a single reducer while 999 executors
idle. Two standard remedies, expressed declaratively so Catalyst
still optimizes around them:

* **Salted two-phase aggregation**: spray each hot key across
  ``salt`` partial groups, aggregate, then combine partials. Works
  for any algebraic aggregate (sum/count/min/max; avg = sum+count
  combined at the end).
* **Salted broadcast join**: replicate the small side per salt value
  so the big side's hot key spreads over ``salt`` tasks. (When the
  small side fits in memory, plain ``F.broadcast`` already avoids
  the shuffle entirely — salting matters for the aggregation that
  usually follows.)

AQE (``spark.sql.adaptive.skewJoin.enabled``) already splits skewed
SHUFFLE-join partitions automatically; these helpers cover the
aggregation case AQE does not re-balance (a single hot group is one
key, not one partition).
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame, functions as F

# Deterministic salt: hash of the full row spread mod n. Using a
# column hash (not rand()) keeps reruns byte-identical — required by
# this repo's oracle discipline.


def _salt_col(df: DataFrame, salt: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))


def salted_agg(
    df: DataFrame,
    keys: List[str],
    sums: Dict[str, str] | None = None,
    count_alias: str | None = "n",
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: per (keys, salt) partials,
    then combine per keys. ``sums`` maps input column → output alias;
    ``count_alias`` adds a row count. Result equals the direct
    ``groupBy(keys)`` aggregation exactly (sums of the same doubles,
    reassociated — integer/exact inputs are bit-identical; float sums
    agree to reassociation, same caveat any parallel agg has).
    """
    sums = sums or {}
    phase1_aggs = [F.sum(F.col(c)).alias(f"__s_{a}") for c, a in sums.items()]
    if count_alias:
        phase1_aggs.append(F.count(F.lit(1)).alias("__cnt"))
    partials = (
        df.withColumn("__salt", _salt_col(df, salt))
        .groupBy(*keys, "__salt")
        .agg(*phase1_aggs)
    )
    phase2_aggs = [F.sum(F.col(f"__s_{a}")).alias(a) for a in sums.values()]
    if count_alias:
        phase2_aggs.append(F.sum("__cnt").alias(count_alias))
    return partials.groupBy(*keys).agg(*phase2_aggs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: List[str],
    salt: int = 16,
) -> DataFrame:
    """Join a skewed big side against a small side with the small side
    replicated per salt value — the big side's hot key fans out over
    ``salt`` tasks instead of one. Equivalent rows to ``big.join(small,
    on)`` (inner)."""
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    big_salted = big.withColumn("__salt", _salt_col(big, salt))
    return big_salted.join(
        F.broadcast(small_salted), on + ["__salt"]
    ).drop("__salt")
