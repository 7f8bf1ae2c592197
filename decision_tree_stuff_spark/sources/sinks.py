"""Parquet sinks with layout control.

The reference has no data sinks at all (only a JSON model file,
SURVEY.md §2.3); these exist for the pipeline use case: materializing
operator outputs at 100 TB requires controlling file layout up front.

* ``write_partitioned``: hive-style directory partitioning — readers
  filtering on the partition column scan only matching directories
  (partition pruning; pinned by tests/test_sinks.py).
* ``write_sorted_within_partitions``: per-file ordering for better
  min/max row-group statistics → parquet predicate pushdown can skip
  whole row groups on range predicates.

Partition-count discipline: ``coalesce`` (not ``repartition``) before
writing when reducing file counts — it avoids a shuffle; use
``repartition(cols)`` only when co-locating by key is the goal.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: List[str],
    mode: str = "overwrite",
    max_files_per_partition: Optional[int] = None,
) -> None:
    out = df
    if max_files_per_partition is not None:
        out = out.repartition(max_files_per_partition, *partition_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_sorted_within_partitions(
    df: DataFrame,
    path: str,
    sort_cols: List[str],
    mode: str = "overwrite",
) -> None:
    df.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: List[str],
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows are hash-partitioned into
    ``n_buckets`` files by ``bucket_cols`` AT WRITE TIME, so a later
    join or aggregation on those columns needs NO shuffle — both
    sides' bucket files align one-to-one. This is the pre-shuffle
    trade: pay the partitioning once when the table is written, reuse
    it in every downstream join (the biggest single lever for a
    repeatedly-joined 100 TB fact table). Requires ``saveAsTable``
    (bucket metadata lives in the catalog, not the parquet files);
    tests/test_sinks.py pins the no-Exchange join plan.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def write_sized(
    df: DataFrame,
    path: str,
    target_mb: int = 512,
    mode: str = "overwrite",
    compression_factor: float = 1.0,
    max_files: int = 100_000,
) -> int:
    """Size-targeted parquet output: choose the file count from
    Catalyst's plan-statistics size estimate so output files land
    near ``target_mb`` each. Returns the file count used.

    The small-files problem is the canonical operational failure of a
    large pipeline sink — a 10k-task job writes 10k fragments per
    run, and listing/opening them dominates every downstream read;
    one giant file serializes reads instead. ``sizeInBytes`` comes
    from the optimized plan: exact (on-disk, compressed) for file
    scans, selectivity-scaled estimates after filters/joins — scale
    expectations with ``compression_factor`` (ratio of the estimate
    to the expected parquet output size; leave at 1.0 when reading
    from parquet and writing parquet of similar shape).

    ``coalesce`` (no shuffle) when reducing the partition count,
    ``repartition`` (full shuffle, but even output sizes) when
    growing it. If the plan has no usable estimate (some exotic
    sources report a sentinel of 2^63-ish), the frame's current
    partitioning is kept unchanged.
    """
    import math

    est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    current = df.rdd.getNumPartitions()
    if est <= 0 or est >= (1 << 60):  # unknown/sentinel estimate
        df.write.mode(mode).parquet(path)
        return current
    n = max(1, math.ceil(est / compression_factor / (target_mb * 1024 * 1024)))
    n = min(n, max_files)
    if n < current:
        out = df.coalesce(n)  # no shuffle
    elif n > current:
        out = df.repartition(n)  # full shuffle, even sizes
    else:
        out = df  # already at the target count — a repartition here
        # would pay a full shuffle for a no-op
    out.write.mode(mode).parquet(path)
    return n
