"""Count-min sketch (Cormode & Muthukrishnan 2005): fixed-size
frequency summary of an unbounded key stream.

Why it earns a place next to the exact ``top_tokens`` groupBy: the
sketch's shuffle volume is bounded by ``d x w x n_partitions`` CELLS,
not by corpus size or vocabulary size — Spark's map-side partial
aggregation collapses each partition's exploded (row, col) updates
onto the tiny grid before anything crosses the wire, so a 100 TB
token stream with a billion-key vocabulary shuffles kilobytes. The
exact groupBy shuffles the vocabulary. The price is the one-sided
overestimate (``est >= true``, ``est <= true + eps*N`` w.h.p. with
``eps = e/w``).

Hashing is the md5 Kirsch-Mitzenmacher scheme shared with
``dedup.minhash_lsh_pairs`` / ``decontam.bloom_bitset`` — row i's
column is ``(h1 + i*h2) mod w`` over the two 60-bit md5 halves — so a
DuckDB oracle reproduces every cell and every estimate exactly.

The cell table is mergeable by construction (union + re-sum), which
makes the streaming fold trivially equal to the batch sketch —
pinned in tests/test_sketch.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

CMS_D, CMS_W = 4, 2048


def _km_halves(key):
    d = F.md5(key)
    return (
        F.conv(F.substring(d, 1, 15), 16, 10).cast("bigint"),
        F.conv(F.substring(d, 17, 15), 16, 10).cast("bigint"),
    )


def cms_cells(
    keyed: DataFrame,
    key_col: str = "token",
    d: int = CMS_D,
    w: int = CMS_W,
    weight_col: str | None = None,
) -> DataFrame:
    """The sketch itself: ``(row, col, cnt)`` over one input row per
    key OCCURRENCE (pre-aggregate upstream if you want weighted
    updates via ``weight_col``). Cells never touched stay absent
    (zero) — consumers must ``coalesce(cnt, 0)``.

    Plan: project (h1, h2) once per occurrence, explode the length-d
    row index array, groupBy (row, col). The aggregation key space is
    d*w, so the exchange is constant-size however large the input.
    """
    h1, h2 = _km_halves(F.col(key_col))
    wcol = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    rows = keyed.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("row"),
                    ((h1 + i * h2) % F.lit(w)).alias("col"),
                ),
            )
        ).alias("cell"),
        wcol.alias("_w"),
    )
    return (
        rows.groupBy(
            F.col("cell.row").alias("row"), F.col("cell.col").alias("col")
        )
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union + re-sum: CMS cells are counters, so merging sketches of
    disjoint (or overlapping — it's additive) inputs is exact. This is
    what makes the streaming fold == the batch sketch."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cells: DataFrame,
    keys: Sequence[str],
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point estimates ``(key, est)`` for a bounded key list:
    ``est = min_i cells[i, h_i(key)]`` with absent cells read as 0.

    The probe grid is |keys| x d rows and the cell table is <= d*w
    rows — both tiny, so the join broadcasts the CELLS and the probe
    side never shuffles (estimates of a hot-key watchlist over a
    100 TB sketch are a constant-time lookup)."""
    sess = cells.sparkSession
    kdf = sess.createDataFrame([(k,) for k in keys], "key string")
    h1, h2 = _km_halves(F.col("key"))
    grid = kdf.select(
        "key",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("row"),
                    ((h1 + i * h2) % F.lit(w)).alias("col"),
                ),
            )
        ).alias("cell"),
    ).select("key", "cell.row", "cell.col")
    return (
        grid.join(F.broadcast(cells), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_sql_cells(source_sql: str, d: int = CMS_D, w: int = CMS_W) -> str:
    """DuckDB twin of ``cms_cells`` over ``source_sql`` (a relation
    with one ``key`` row per occurrence) — kept next to the operator
    so the hashing stays single-sourced."""
    return f"""
SELECT i.i AS "row",
       (('0x' || substr(md5(key), 1, 15))::BIGINT
        + i.i * ('0x' || substr(md5(key), 17, 15))::BIGINT) % {w} AS col,
       CAST(count(*) AS BIGINT) AS cnt
FROM ({source_sql}) src,
     (SELECT unnest(range(0, {d})) AS i) i
GROUP BY 1, 2
"""
