"""Sorted-neighborhood dedup blocking (E-2sn): Hernández & Stolfo
1995's classic candidate generator — sort the corpus by a compact
blocking key, slide a width-``w`` window down the sorted order, emit
every pair that co-occurs in a window. The multi-pass variant (Kolb,
Thor & Rahm 2012 showed the MapReduce distribution of exactly this
operator) runs several cheap keys and unions the candidates, because
one sort order misses duplicates whose difference is in the key
prefix.

Complements the existing candidate generators (MinHash/LSH bands,
SimHash, winnowing, PPJoin prefixes): SNM is the only one whose
candidate count is a HARD LINEAR bound — exactly (w-1)·n pairs per
pass, independent of token/fingerprint skew. No hot-key cap needed;
there is no key.

Scale design (100 TB):

* The global sort order is materialized as a RANK column via the
  two-phase range-partition trick — ``repartitionByRange`` on (key,
  id) gives contiguous non-overlapping ranges, a row_number window
  PER RANGE PARTITION (32-way+ parallel; never a single-task global
  window) gives local ranks, and a driver-sized per-partition count
  table broadcast back adds each range's exclusive prefix base.
  Identical ranks to a global ``row_number() OVER (ORDER BY key,
  id)`` at any parallelism — the property the DuckDB twin checks.
* Window pairs come from an EQUI-join: each row explodes its w-1
  successor ranks (``sequence``) and joins rank=rank — a hash
  shuffle on a dense bigint, no range/theta join, no skew (ranks are
  unique by construction).
* AQE note: coalescing only merges ADJACENT shuffle partitions, so
  the rank-order = key-order invariant survives AQE; pinned by the
  parity tests running under default AQE.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from decision_tree_stuff_spark.functions.text import normalize_text


def snm_key(text: Column, length: int = 12) -> Column:
    """The classic SNM blocking key: a short prefix of the normalized
    text. DuckDB: ``substr(trim(regexp_replace(lower(text), '\\s+',
    ' ', 'g')), 1, length)``."""
    return F.substring(normalize_text(text), 1, length)


def global_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """Append ``_rank`` = 0-based global rank under (key_col, id_col)
    total order, without a single-task window.

    Range-partition on the full (key, id) tie-broken order so equal
    keys cannot straddle a boundary ambiguously; rank locally per
    range partition; add broadcast per-partition exclusive prefix
    counts. The count table has one row per partition — driver-sized
    by construction.
    """
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, F.col(key_col), F.col(id_col))
    local = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lr",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(key_col, id_col)
        ),
    )
    bases = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "_pid",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_base"),
        )
    )
    return (
        local.join(F.broadcast(bases), "_pid")
        .withColumn("_rank", (F.col("_base") + F.col("_lr") - 1).cast("bigint"))
        .drop("_pid", "_lr", "_base")
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    window: int = 4,
    key_length: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
    keys: Optional[List[Column]] = None,
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """Candidate pairs from one or more sorted-neighborhood passes.

    ``keys=None`` runs the single classic pass on
    ``snm_key(text, key_length)``. Passing a list of key expressions
    runs one pass per key (multi-pass SNM) and unions the pair sets
    distinct. Returns (doc_id_a, doc_id_b) with a < b — orientation
    is by id so multi-pass union dedups correctly regardless of each
    pass's sort order.

    Cost per pass: one range shuffle + one rank join shuffle +
    (w-1)·n join rows. Null text sorts via the empty key ('' — nulls
    normalized to empty) and still participates: SNM is a blocking
    method, not a filter; downstream verification decides.
    """
    assert window >= 2, "window must cover at least one neighbor"
    key_exprs = (
        keys if keys is not None else [snm_key(F.col(text_col), key_length)]
    )
    out = None
    for key in key_exprs:
        keyed = docs.select(
            F.col(id_col),
            F.coalesce(key, F.lit("")).alias("_snkey"),
        )
        ranked = global_rank(keyed, "_snkey", id_col, n_partitions)
        left = ranked.select(
            F.col(id_col).alias("_lid"),
            F.explode(
                F.sequence(
                    F.col("_rank") + 1,
                    F.col("_rank") + F.lit(int(window) - 1),
                )
            ).alias("_nb"),
        )
        right = ranked.select(
            F.col(id_col).alias("_rid"), F.col("_rank").alias("_nb")
        )
        pairs = left.join(right, "_nb").select(
            F.least("_lid", "_rid").alias("doc_id_a"),
            F.greatest("_lid", "_rid").alias("doc_id_b"),
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct()
