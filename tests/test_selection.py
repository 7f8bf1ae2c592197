"""DSIR data selection (operators/selection.py): semantic direction
(target-like docs up-weighted), Gumbel top-k sampling distribution,
featurizer shape, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.selection import (
    dsir_log_weights,
    dsir_model,
    gumbel_topk_sample,
    hashed_ngram_features,
)


def test_hashed_ngram_features_counts(spark):
    """3 tokens -> 3 unigrams + 2 bigrams = 5 gram occurrences; bucket
    ids live in [0, B); empty docs emit nothing."""
    df = spark.createDataFrame(
        [(0, "a b c"), (1, " ")], "doc_id bigint, text string"
    )
    feats = hashed_ngram_features(df, n_buckets=64)
    rows = feats.collect()
    assert {r["doc_id"] for r in rows} == {0}
    assert sum(r["c"] for r in rows) == 5
    assert all(0 <= r["bucket"] < 64 for r in rows)


def test_dsir_upweights_target_like_docs(spark):
    """Docs sharing the target corpus's vocabulary must score higher
    log-weights than docs from the raw-only vocabulary — the selection
    direction of the paper, on a corpus where the answer is known."""
    target_rows = [(i, "law court ruling appeal clause") for i in range(10)]
    other_rows = [
        (100 + i, "oven salt recipe dish pan") for i in range(30)
    ]
    hist = spark.createDataFrame(
        target_rows + other_rows, "doc_id bigint, text string"
    )
    target = dsir_model(
        hist.where(F.col("doc_id") < 100), n_buckets=1024
    )
    raw = dsir_model(hist, n_buckets=1024)
    batch = spark.createDataFrame(
        [
            (200, "court ruling on the appeal clause"),  # law-like
            (201, "salt the dish in the oven"),          # cooking-like
        ],
        "doc_id bigint, text string",
    )
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(batch, target, raw, n_buckets=1024).collect()
    }
    assert w[200] > 0 > w[201], w


def test_gumbel_topk_matches_softmax_for_n1(spark):
    """P(argmax_i log_w_i + Gumbel_i) = softmax(log_w)_i — the Gumbel
    trick's defining identity, checked by frequency over independent
    trials (trial id inside the hash key)."""
    import math

    trials = 400
    lw = {"a": 0.0, "b": math.log(2.0), "c": math.log(7.0)}
    rows = [(t, i, w) for t in range(trials) for i, w in lw.items()]
    df = spark.createDataFrame(
        rows, "trial int, item string, log_weight double"
    )
    out = gumbel_topk_sample(
        df, 1, "log_weight", ["trial", "item"], seed="g", group_cols=["trial"]
    )
    got = [r["item"] for r in out.collect()]
    assert len(got) == trials
    for item, p in (("a", 0.1), ("b", 0.2), ("c", 0.7)):
        assert abs(got.count(item) / trials - p) < 0.08, (item, got.count(item))
    again = [
        r["item"]
        for r in gumbel_topk_sample(
            df, 1, "log_weight", ["trial", "item"], seed="g",
            group_cols=["trial"],
        ).collect()
    ]
    assert sorted(got) == sorted(again)


def test_gumbel_topk_plans_are_prelimited(spark):
    """Global sample compiles to TakeOrderedAndProject (distributed
    top-k: map-side top-n per partition, bounded merge — no full
    sort, no single-task window); grouped sample gets the
    WindowGroupLimit pre-prune like the other per-group samplers."""
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i % 5)) for i in range(100)],
        "doc_id bigint, grp string, log_weight double",
    )
    g_plan = (
        gumbel_topk_sample(df, 10, "log_weight", ["doc_id"], "s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in g_plan, g_plan[:1200]
    p_plan = (
        gumbel_topk_sample(
            df, 10, "log_weight", ["doc_id"], "s", group_cols=["grp"]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in p_plan, p_plan[:1200]
