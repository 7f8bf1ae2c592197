"""Z-order layout clustering (E-14): exact Morton values vs a pure
Python reference, bijectivity, and a MEASURED file-skipping win on
real lineitem data."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.zorder import (
    write_zordered,
    zorder_sql,
    zorder_value,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _ref_z(vals, bits):
    z = 0
    k = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            z += ((v >> i) & 1) << (i * k + j)
    return z


def test_zorder_value_matches_reference(spark):
    rows = [(a * 37 % 256, a * 91 % 256, a % 8) for a in range(300)]
    df = spark.createDataFrame(rows, "x long, y long, w long")
    got = [
        tuple(r)
        for r in df.select(
            "x", "y", "w",
            zorder_value(["x", "y"], bits=8).alias("z2"),
            zorder_value(["x", "y", "w"], bits=3).alias("z3"),
        ).collect()
    ]
    for x, y, w, z2, z3 in got:
        assert z2 == _ref_z((x, y), 8)
        assert z3 == _ref_z((x, y, w), 3)


def test_zorder_sql_twin_matches_spark(spark):
    import duckdb

    rows = [(a * 13 % 128, a * 29 % 128) for a in range(200)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    s = sorted(
        tuple(r)
        for r in df.select(
            "x", "y", zorder_value(["x", "y"], 7).alias("z")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    d = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT x, y, {zorder_sql(['x', 'y'], 7)} AS z FROM t"
        ).fetchall()
    )
    assert s == d


def test_zorder_is_bijective_on_grid(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )
    zs = df.select(zorder_value(["x", "y"], 5).alias("z"))
    assert zs.distinct().count() == 1024
    mm = zs.agg(F.min("z"), F.max("z")).first()
    assert (mm[0], mm[1]) == (0, 1023)


def test_validation_errors():
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_value(["x"])
    with pytest.raises(ValueError, match="exceeds a signed long"):
        zorder_value(["x", "y"], bits=32)


def _file_spans(spark, path, cols):
    """Per output file: (min, max) of each col; returns the summed
    normalized span and a prune counter closure."""
    spans = []
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        row = (
            spark.read.parquet(f)
            .agg(*[m(c) for c in cols for m in (F.min, F.max)])
            .first()
        )
        spans.append([(row[2 * i], row[2 * i + 1]) for i in range(len(cols))])
    return spans


def test_measured_pruning_win_on_lineitem(spark, tmp_path):
    """The point of the operator: after Z-ordering on two bucketized
    keys, per-file min-max ranges shrink enough that a point filter
    on EITHER key prunes most files; an unclustered layout prunes
    none. Measured, not asserted from theory."""
    # dense bucket domains (sf0.001 has ~200 parts / 10 suppliers —
    # a %256 bucket would leave the domain sparse and every probe
    # trivially out of range for ANY layout)
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            (F.col("l_partkey") % 16).alias("pk"),
            (F.col("l_suppkey") % 8).alias("sk"),
            "l_quantity",
        )
    )
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "random")
    write_zordered(li, zpath, ["pk", "sk"], bits=4, num_files=8)
    li.repartition(8).write.mode("overwrite").parquet(rpath)

    def prunable(spans, col_idx, probes):
        """fraction of (file, probe) pairs a min-max check skips"""
        total = skipped = 0
        for p in probes:
            for s in spans:
                lo, hi = s[col_idx]
                total += 1
                skipped += not (lo <= p <= hi)
        return skipped / total

    zs = _file_spans(spark, zpath, ["pk", "sk"])
    rs = _file_spans(spark, rpath, ["pk", "sk"])
    assert len(zs) == 8 and len(rs) == 8
    probes = {0: [1, 5, 9, 13], 1: [1, 3, 5, 7]}  # in-domain points
    for ci in (0, 1):
        z_skip = prunable(zs, ci, probes[ci])
        r_skip = prunable(rs, ci, probes[ci])
        # random layout: every file spans ~the whole domain -> ~0
        # skipped; z-order must skip a solid share on BOTH keys
        # simultaneously (one-column sort can only do one)
        assert z_skip >= 0.4, (ci, z_skip, zs)
        assert z_skip > r_skip + 0.25, (ci, z_skip, r_skip)


# ---------------------------------------------------------------------------
# E-14b: Hilbert curve
# ---------------------------------------------------------------------------

from decision_tree_stuff_spark.operators.zorder import (  # noqa: E402
    hilbert_value,
    write_hilbert,
)


def _ref_hilbert(x, y, bits):
    """Pure-Python xy→d reference (the classic public-domain walk)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_value_matches_reference(spark):
    """Both column paths — the LUT dispatch (bits <= lut_max_bits)
    and the aggregate-fold walk (forced with lut_max_bits=0) — must
    equal the pure-Python reference."""
    rows = [(a * 37 % 64, a * 91 % 64) for a in range(300)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x",
        "y",
        hilbert_value("x", "y", bits=6).alias("h_lut"),
        hilbert_value("x", "y", bits=6, lut_max_bits=0).alias("h_fold"),
    ).collect()
    for r in got:
        want = _ref_hilbert(r["x"], r["y"], 6)
        assert r["h_lut"] == want, (r["x"], r["y"])
        assert r["h_fold"] == want, (r["x"], r["y"])


def test_hilbert_is_bijective_and_unit_steps(spark):
    """The two properties that make Hilbert the better layout key:
    bijectivity onto [0, 4^bits), and UNIT curve steps — consecutive
    d values are grid-adjacent cells (Manhattan distance exactly 1),
    which Morton violates at every quadrant seam."""
    bits = 4
    side = 1 << bits
    df = spark.createDataFrame(
        [(x, y) for x in range(side) for y in range(side)],
        "x long, y long",
    )
    rows = df.select(
        "x", "y", hilbert_value("x", "y", bits=bits).alias("h")
    ).collect()
    assert len({r["h"] for r in rows}) == side * side
    assert min(r["h"] for r in rows) == 0
    assert max(r["h"] for r in rows) == side * side - 1
    byd = {r["h"]: (r["x"], r["y"]) for r in rows}
    for d in range(side * side - 1):
        (x1, y1), (x2, y2) = byd[d], byd[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d
    # Morton, for contrast, takes a non-unit jump at every 2x2 seam
    zd = {
        _ref_z((x, y), bits): (x, y)
        for x in range(side)
        for y in range(side)
    }
    jumps = sum(
        abs(zd[d][0] - zd[d + 1][0]) + abs(zd[d][1] - zd[d + 1][1]) > 1
        for d in range(side * side - 1)
    )
    assert jumps > 0


def test_hilbert_sql_twin_matches_spark(spark):
    import duckdb

    from decision_tree_stuff_spark.operators.zorder import hilbert_sql

    rows = [(a * 13 % 32, a * 29 % 32) for a in range(200)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    s = sorted(
        tuple(r)
        for r in df.select(
            "x", "y", hilbert_value("x", "y", 5).alias("h")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    inner = "(SELECT x AS ox, y AS oy, x, y FROM t)"
    d = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT ox, oy, hval FROM {hilbert_sql(inner, 5, ['ox', 'oy'])} q"
        ).fetchall()
    )
    assert s == d


def test_hilbert_layout_prunes_both_keys(spark, tmp_path):
    """write_hilbert's measured pruning win, same protocol as the
    Morton test: after clustering on the Hilbert key both bucketized
    columns get tight per-file ranges."""
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            (F.col("l_partkey") % 16).alias("pk"),
            (F.col("l_suppkey") % 16).alias("sk"),
            "l_quantity",
        )
    )
    hpath = str(tmp_path / "hilbert")
    write_hilbert(li, hpath, "pk", "sk", bits=4, num_files=8)
    spans = _file_spans(spark, hpath, ["pk", "sk"])
    assert len(spans) == 8

    def prunable(spans, ci, probes):
        total = skipped = 0
        for p in probes:
            for s in spans:
                lo, hi = s[ci]
                total += 1
                skipped += not (lo <= p <= hi)
        return skipped / total

    for ci, probes in ((0, [1, 5, 9, 13]), (1, [1, 5, 9, 13])):
        skip = prunable(spans, ci, probes)
        assert skip >= 0.4, (ci, skip, spans)
