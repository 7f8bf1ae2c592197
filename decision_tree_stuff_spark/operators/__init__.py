"""Large-scale data-pipeline operators (SURVEY.md §2.5, E-1..E-10).

Each operator is a function ``DataFrame -> DataFrame`` built from
declarative Spark primitives, with the scale rationale documented at
the definition. None of these exist in the reference (it has no joins,
no streaming, no text ops — SURVEY.md §2.3); they are the extension
scope a 100 TB training-data pipeline needs.
"""

from pyspark.sql import DataFrame, functions as F


def pushdown_fence(df: DataFrame) -> DataFrame:
    """Stop Catalyst from pushing later filters below this point.

    A deterministic filter over expensive projected columns gets its
    expressions INLINED and pushed through every Project and Exchange
    down to the scan — which both re-evaluates the heavy expressions a
    second time in the filter and, after ``spread_small``, runs them
    in the pre-spread single-task stage (measured 10 s vs 1 s on the
    Bloom probe at sf0.1). ``spark_partition_id() >= 0`` is always
    true, but the expression is flagged nondeterministic, which pins
    filter order: Catalyst may neither push a later deterministic
    filter past it (CombineFilters requires a deterministic inner
    filter) nor fold it away (no range analysis on partition ids —
    unlike ``rand() >= -1``, which Spark 4 proves always-true from
    rand's [0,1) bounds and deletes). Zero effect on results or row
    order, and cheaper than rand: no RNG state per row."""
    return df.where(F.spark_partition_id() >= 0)


def spread_small(df: DataFrame) -> DataFrame:
    """Raise the parallelism of a SMALL input ahead of a compute-heavy
    per-row projection (tokenization, fingerprint hashing, vector
    math).

    A parquet file smaller than one row group is ONE scan split no
    matter what ``spark.sql.files.maxPartitionBytes`` says, so on a
    32-core executor the projection crawls on a single core while 31
    idle — measured 3-10x on the text operators at bench scale. The
    guard makes this a no-op exactly when it should be one: a real
    100 TB table scans as tens of thousands of splits, comfortably
    above ``defaultParallelism``, and blindly repartitioning THAT
    would be a catastrophic full shuffle. Only inputs already known
    to be small (fewer splits than cores) pay the one tiny
    round-robin exchange.

    Call it inside operators whose scan-side work dominates; skip it
    where the first real operator is an aggregation (map-side partial
    aggregation on the raw split is already the cheaper plan).
    """
    if df.isStreaming:
        # streaming frames have no .rdd and their parallelism is the
        # source's concern (maxFilesPerTrigger etc.) — no-op
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
