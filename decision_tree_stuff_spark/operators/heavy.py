"""Exact distributed heavy hitters (E-4hh): per-partition
Misra–Gries candidate generation + exact recount — frequent items
over a corpus whose full key cardinality is too large to shuffle.

The two-pass shape (Misra & Gries '82; the "frequent"/"lossy
counting" family survey in Cormode & Hadjieleftheriou, VLDB'08):

1. **Candidate pass** — every partition runs Misra–Gries with ``k``
   counters over its rows and emits at most ``k`` candidate keys.
   Pigeonhole guarantee: an item absent from EVERY partition summary
   has per-partition frequency ≤ n_p/(k+1), hence global frequency
   ≤ n/(k+1) — so the union of summaries contains every item with
   global share > 1/(k+1). NO false negatives, whatever the
   partitioning.
2. **Exact recount** — the (≤ partitions × k) candidates broadcast
   back as a semi-join; one bounded groupBy counts them exactly; the
   integer filter ``cnt · (k+1) > n`` keeps precisely the true heavy
   hitters. False positives from pass 1 die here, so the OUTPUT is
   partitioning-invariant and exactly SQL-oracle-able even though
   the intermediate candidate set is not.

Why this exists next to ``top_tokens`` (exact full groupBy) and the
count-min sketch (approximate): at 100 TB the full groupBy shuffles
the entire key space (every distinct URL/shingle/n-gram), and CMS
answers point queries but cannot ENUMERATE the frequent keys without
a candidate stream. This operator's shuffle is bounded by
partitions × k rows (pass 1 output) + candidates × partitions
(recount partials) regardless of key cardinality — the published
answer for "which keys exceed φ of an unbounded key space".

The candidate pass is the repo's second legitimate ``mapInPandas``
(after multimodal feature extraction): genuinely sequential
per-partition state (the MG counter dict survives across Arrow
batches of one partition) that no built-in expression expresses,
with k-bounded output per partition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 99,
) -> DataFrame:
    """Exact keys with global share > 1/(k+1), with their counts.

    Returns ``(key_col, cnt)`` — all items whose frequency exceeds
    n/(k+1) (strict), counted exactly. Nulls are ignored (a null key
    is not an item). Lazy end-to-end: the total-row 1-row aggregate
    joins in as a broadcast, so the operator composes without a
    driver action.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    items = df.select(F.col(key_col).alias("__key")).where(
        F.col("__key").isNotNull()
    )

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Misra–Gries with k counters, state carried ACROSS the Arrow
        # batches of one partition (mapInPandas iterates a partition's
        # batches through one generator call).
        counters: dict = {}
        for pdf in batches:
            for key in pdf["__key"]:
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k:
                    counters[key] = 1
                else:
                    # decrement-all; drop zeros (the classic step,
                    # amortized O(1) via dict rebuild)
                    counters = {
                        c: v - 1 for c, v in counters.items() if v > 1
                    }
        yield pd.DataFrame({"__key": list(counters.keys())})

    key_type = items.schema["__key"].dataType.simpleString()
    cands = items.mapInPandas(_mg, f"__key {key_type}").distinct()
    total = items.agg(F.count(F.lit(1)).alias("__n"))
    counted = (
        items.join(F.broadcast(cands), "__key", "semi")
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(k + 1) > F.col("__n"))
        .select(F.col("__key").alias(key_col), "cnt")
    )
