"""Table sources for the driver's synthetic test data.

The reference has no data-file sources at all (in-memory frames plus a
JSON model file — SURVEY.md §2.3); scans here target the driver's
parquet tables (/root/repo/TESTDATA.md). ``spark.read.parquet`` gives
predicate pushdown, column pruning and partition-sized splits for
free — at 100 TB these scans parallelize per file/row-group with
``spark.sql.files.maxPartitionBytes`` controlling task granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    assert name in TABLES, f"unknown table {name!r}"
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's reader
        # rejects; read nanos as long, convert to µs timestamps (same
        # convention as queries._events and the DuckDB oracle)
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return raw.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle's
    pre-registered views) so queries can be written in pure SQL."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
