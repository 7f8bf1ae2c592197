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
