"""Z-order (Morton) layout clustering (E-14): multi-column data
skipping for the lakehouse write path — the ``OPTIMIZE ZORDER BY``
of Delta/Iceberg, expressed in plain Spark primitives.

Why it matters at 100 TB: parquet readers prune row groups / files
by min-max statistics, but sorting by ONE column only clusters that
column — a filter on the second key still scans everything. Bit
interleaving (Morton '66) maps k columns onto one integer whose
total order is a space-filling curve: range-partition + sort by the
Z-value and EVERY interleaved column gets tight per-file min-max
ranges, so point/range filters on any of them skip most files.

The Z-value is pure JVM bit arithmetic (shiftleft/AND — one
projection, no UDF), exact and engine-portable: the DuckDB twin
computes the identical integer with an unrolled bit-term sum.
Inputs must be NON-NEGATIVE integers below 2^bits — the caller
buckets/offsets raw values first (same contract Delta's ZORDER
applies after its range-partition id transform). k·bits ≤ 63 keeps
the value in a signed 64-bit long.

``write_zordered`` is the write path. Default (deterministic=True):
one exact min/max pass over the Z-value (the same "analyze" pass
Delta's OPTIMIZE runs), equi-width buckets over the occupied Z-range
— sound because the caller contract already bucketizes the raw keys,
so the Morton domain is bounded and densely occupied — then an
INJECTIVE bucket→partition mapping so every output file covers
exactly one compact Z-range. Injectivity is achieved by routing each
bucket through a hash-preimage value v with pmod(hash(v), n) == b,
computed by a tiny n-row Spark job against the very same Murmur3
``HashPartitioning`` expression ``repartition(n, col)`` uses.
Deterministic layout = retry-idempotent writes (a task retry or a
re-run produces byte-identical file boundaries), unlike
``repartitionByRange`` whose *sampled* bounds shift with ambient
partitioning. The sampled path remains available
(deterministic=False) for heavily skewed Z-occupancy where
equi-depth balance matters more than reproducibility.

The pruning win is MEASURED in tests/test_zorder.py: per-file
min-max spans of both keys shrink enough that in-domain point probes
skip most files on EITHER key, vs ~zero skips for an unclustered
layout on real lineitem data.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def zorder_value(cols: Sequence, bits: int = 16) -> Column:
    """Morton interleave of ``cols`` (Columns or names): bit ``i`` of
    column ``j`` lands at position ``i·k + j``. Returns a LONG."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs >= 2 columns (sort for 1)")
    if k * bits > 63:
        raise ValueError(
            f"{k} cols x {bits} bits = {k * bits} exceeds a signed long"
        )
    terms: List[Column] = []
    for j, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical interleave as a DuckDB SQL expression (unrolled
    bit-term sum) — twin generator for the oracle."""
    k = len(cols)
    terms = [
        f"(({c} >> {i}) & 1) * {1 << (i * k + j)}"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def _hash_preimages(spark, n: int) -> List[int]:
    """For each partition id p in [0, n), the smallest non-negative
    INT v with pmod(hash(v), n) == p — computed with the exact
    Murmur3 expression ``repartition(n, col)`` partitions by, so the
    mapping can never drift from the engine's. One tiny job over
    64·n candidate ints (n is a file count, not data-sized)."""
    rows = (
        spark.range(0, 64 * n)
        .select(F.col("id").cast("int").alias("v"))
        .withColumn("p", F.pmod(F.hash("v"), F.lit(n)))
        .groupBy("p")
        .agg(F.min("v").alias("v"))
        .collect()
    )
    pre = {r["p"]: r["v"] for r in rows}
    if len(pre) != n:  # pragma: no cover — 64n candidates always cover
        raise RuntimeError(f"hash preimage search incomplete: {len(pre)}/{n}")
    return [pre[i] for i in range(n)]


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: Sequence[str],
    bits: int = 16,
    num_files: int = 8,
    deterministic: bool = True,
) -> None:
    """Cluster ``df`` on the Z-curve of ``zcols`` and write parquet.
    Each output file covers a compact Z-range, i.e. a compact
    hyper-rectangle-ish region of ALL zcols — the min-max stats
    readers prune on.

    deterministic=True (default): exact min/max pass → equi-width
    buckets over the occupied Z-range → injective bucket→partition
    routing via hash preimages → sort within partitions. Re-running
    (or a task retry) yields identical file boundaries.

    deterministic=False: single-pass ``repartitionByRange`` (sampled
    bounds) — equi-depth balance under skewed Z-occupancy, at the
    cost of layout reproducibility."""
    zv = zorder_value(list(zcols), bits)
    staged = df.withColumn("__z", zv)
    if deterministic:
        zmin, zmax = staged.agg(F.min("__z"), F.max("__z")).first()
        n = num_files
        if zmin is None or zmax == zmin:
            bucket = F.lit(0)
        else:
            bucket = F.floor(
                (F.col("__z") - F.lit(zmin)) * n / F.lit(zmax - zmin + 1)
            ).cast("int")
        pre = _hash_preimages(df.sparkSession, n)
        routed = staged.withColumn(
            "__route", F.element_at(F.lit(pre), bucket + 1)
        )
        out = routed.repartition(n, "__route").sortWithinPartitions("__z")
        out = out.drop("__z", "__route")
    else:
        out = staged.repartitionByRange(num_files, "__z")
        out = out.sortWithinPartitions("__z").drop("__z")
    out.write.mode("overwrite").parquet(path)
