"""Table sources for the driver's synthetic test data.

The reference has no data-file sources at all (in-memory frames plus a
JSON model file — SURVEY.md §2.3); scans here target the driver's
parquet tables (/root/repo/TESTDATA.md). ``spark.read.parquet`` gives
predicate pushdown, column pruning and partition-sized splits for
free — at 100 TB these scans parallelize per file/row-group with
``spark.sql.files.maxPartitionBytes`` controlling task granularity.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# events.parquet fallback schema for data generations that store `ts`
# as TIMESTAMP(NANOS): the raw-INT64 read sidesteps Spark's nanos-type
# rejection without mutating any session conf (readers stay
# side-effect-free on shared sessions). Only used when the parquet
# footer actually declares nanosecond precision — see
# events_ts_unit(); the current driver data is TIMESTAMP(MICROS) and
# takes the plain-read path.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _events_default_schema() -> StructType:
    """EVENTS_RAW_SCHEMA with `ts` as TIMESTAMP (LTZ) — the schema the
    MICROS read path produces. Used by ``read_events_stream`` when the
    watch directory has no part files yet (the normal file-source
    streaming setup starts against an empty directory), where footer
    sniffing has nothing to read."""
    from pyspark.sql.types import TimestampType

    return StructType(
        [
            StructField(
                f.name,
                TimestampType() if f.name == "ts" else f.dataType,
                f.nullable,
            )
            for f in EVENTS_RAW_SCHEMA
        ]
    )

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


# Memoized per session × (dir, table): repeat loads (bench min-of-N,
# the driver's 38-query gate) reuse the analyzed scan instead of
# re-listing files / re-reading footers. DataFrames are immutable —
# sharing is safe; cluster equivalent is a catalog table definition.
# WeakKeyDictionary on the session: entries die with the session, so
# a long-lived driver process cycling sessions cannot pin stale
# DataFrames for process lifetime. Assumes the parquet files at a
# path are immutable for the session's life (rewriting them under a
# live session returns the stale file listing — drop the session or
# call ``_LOAD_CACHE.clear()``).
import weakref

_LOAD_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    assert name in TABLES, f"unknown table {name!r}"
    per_session = _LOAD_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    if key in per_session:
        return per_session[key]
    per_session[key] = df = _load_table_uncached(spark, sf_dir, name)
    return df


def events_ts_unit(path: str) -> str:
    """Time unit ('ns'|'us'|'ms'|'s') of the `ts` column, read from the
    parquet footer.

    The driver regenerates events.parquet between rounds and has
    already switched precision once (NANOS -> MICROS in round 3, which
    silently broke a unit-assuming reader). Sniffing the footer is a
    single-file metadata read on the driver — O(KB), never a data scan
    — so the reader tracks whatever the current generation stores.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet part files under {path}")
        path = parts[0]
    return pq.read_schema(path).field("ts").type.unit


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, f"{sf_dir}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """events reader that honors the footer's actual timestamp unit.

    MICROS (current data): Spark's plain read maps the
    isAdjustedToUTC=false column to TIMESTAMP_NTZ, which (a)
    watermarks reject and (b) makes `unix_timestamp` session-tz
    dependent. Reading under an explicit schema with TimestampType
    (LTZ) instead takes the stored micros as UTC instants — same
    integer values, no tz-dependent reinterpretation (a `cast` from
    NTZ would shift by the session offset; the schema override does
    not) — matching the DuckDB oracle's `epoch(ts)`. NANOS: Spark
    rejects the type, so the explicit schema reads the column as raw
    INT64 nanos, converted to µs with exact integer division.
    `ts DIV 1000`, NOT `/1000` + cast: double division has >1000 ns
    of ulp for epoch-ns >= ~1.75e18 (mid-2025), silently shifting
    events across window/session boundaries.
    """
    if events_ts_unit(path) == "ns":
        raw = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.schema(events_ltz_schema(spark, path)).parquet(path)


def events_ltz_schema(spark: SparkSession, path: str) -> StructType:
    """Footer-derived schema with every TIMESTAMP_NTZ field swapped to
    TIMESTAMP (LTZ) — column set tracks the data, only the timestamp
    semantics are pinned."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    plain = spark.read.parquet(path).schema
    return StructType(
        [
            StructField(
                f.name,
                TimestampType()
                if isinstance(f.dataType, TimestampNTZType)
                else f.dataType,
                f.nullable,
            )
            for f in plain
        ]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV source with a MANDATORY explicit schema.

    Schema inference on CSV is a full extra pass over the data before
    the real scan even starts — at 100 TB that is a second 100 TB read
    — and inferred types drift between loads (an all-null partition
    infers string). ``mode=FAILFAST`` surfaces malformed rows at scan
    time instead of silently nulling columns (PERMISSIVE, the default,
    turns data corruption into wrong query results downstream).
    """
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON-lines source, explicit schema, FAILFAST — same rationale
    as ``read_csv``: no inference pass, no silent nulls. Nested struct
    fields project with pushdown (``ReadSchema`` prunes subfields)."""
    return (
        spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    )


def read_orc(
    spark: SparkSession, path: str, schema: Optional[StructType] = None
) -> DataFrame:
    """ORC source. Self-describing like parquet, so the schema is
    optional — pass one to pin column types against drift across file
    batches (mixed producers). Spark's native vectorized ORC reader
    gives the same pushdown/pruning guarantees as parquet
    (``PushedFilters`` / ``ReadSchema`` in explain), so every operator
    here runs unchanged on ORC lakes."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Optional[list] = None,
    compression: str = "zstd",
) -> None:
    """ORC sink, zstd by default (better ratio than the zlib default
    at comparable speed on modern cores); optional hive partitioning
    for downstream partition pruning."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle's
    pre-registered views) so queries can be written in pure SQL."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
