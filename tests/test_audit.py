"""Funnel audit: per-stage counts must match independently computed
stage counts while executing only ONE action over the composed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.audit import (
    audit_counts,
    run_with_audit,
)


def test_audit_matches_per_stage_counts(spark, sf_dir):
    from decision_tree_stuff_spark.functions.text import fingerprint
    from decision_tree_stuff_spark.operators.dedup import exact_dedup
    from decision_tree_stuff_spark.operators.textstats import quality_filter

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )

    def dedup_stage(d):
        keep = exact_dedup(
            d.select(fingerprint(F.col("text")).alias("fp"), "doc_id"),
            ["fp"],
            "doc_id",
        ).select("doc_id")
        return d.join(keep, "doc_id", "semi")

    stages = [
        ("quality", lambda d: quality_filter(d).join(docs, "doc_id").select(
            "doc_id", "text")),
        ("exact_dedup", dedup_stage),
        ("cap", lambda d: d.where(F.col("doc_id") % 3 != 0)),
    ]
    out, obs = run_with_audit(docs, stages)
    out.write.format("noop").mode("overwrite").save()  # the ONE action
    audit = audit_counts(obs)

    # independent per-stage recomputation (the O(stages^2) way)
    cur = docs
    want = [("input", cur.count())]
    for name, fn in stages:
        cur = fn(cur)
        want.append((name, cur.count()))

    assert [(a["stage"], a["rows"]) for a in audit] == want
    for prev_row, a in zip(audit, audit[1:]):
        assert a["dropped"] == prev_row["rows"] - a["rows"]
        assert a["kept_frac"] == round(a["rows"] / prev_row["rows"], 6)
    assert audit[0]["dropped"] == 0 and audit[0]["kept_frac"] is None
    # the funnel actually funnels on this data
    assert audit[-1]["rows"] < audit[0]["rows"]


def test_audit_rejects_bad_stage_names(spark):
    df = spark.range(5)
    with pytest.raises(ValueError, match="unique"):
        run_with_audit(df, [("a", lambda d: d), ("a", lambda d: d)])
    with pytest.raises(ValueError, match="unique"):
        run_with_audit(df, [("input", lambda d: d)])
