"""Parameter-path coverage for operators whose defaults the gate
queries exercise but whose knobs they don't."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.dedup import exact_dedup
from decision_tree_stuff_spark.operators.multimodal import sample_frames, synthesize_media
from decision_tree_stuff_spark.operators.sessionize import sessionize
from decision_tree_stuff_spark.operators.similarity import cosine_topk
from decision_tree_stuff_spark.operators.textstats import tf_idf


def test_exact_dedup_multi_key(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = exact_dedup(docs, ["lang", "source"], "doc_id")
    assert out.count() == docs.select("lang", "source").distinct().count()
    total = out.agg(F.sum("dup_count")).first()[0]
    assert total == docs.count()


def test_cosine_topk_unknown_query_ids_empty(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert cosine_topk(emb, [10**9], k=3).count() == 0


def test_tf_idf_min_df_filters(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    all_terms = tf_idf(docs, min_df=1)
    common_only = tf_idf(docs, min_df=100)
    assert common_only.count() < all_terms.count()
    assert common_only.agg(F.min("df")).first()[0] >= 100


def test_sessionize_gap_monotonicity(spark, sf_dir):
    from decision_tree_stuff_spark.queries import _events

    ev = _events(spark, sf_dir)
    wide = sessionize(ev, gap="4 hours").count()
    narrow = sessionize(ev, gap="5 minutes").count()
    assert wide < narrow, "wider gap must merge into fewer sessions"


def test_sample_frames_every_frame(spark, sf_dir):
    media = synthesize_media(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    every = sample_frames(media, every_n=1)
    total_frames = (
        media.where(F.col("kind") == "video")
        .agg(F.sum("meta.n_frames"))
        .first()[0]
    )
    assert every.count() == total_frames


def test_repetition_stats_handcrafted(spark):
    from decision_tree_stuff_spark.operators.textstats import repetition_stats

    rows = [
        # "a a a b": n=4, top=3/4, dup=3/4; bigrams [a a, a a, a b]:
        # "a a" twice of 3 -> 2/3
        (0, "a a a b"),
        # all distinct: zero repetition
        (1, "x y z"),
        # single token: no bigrams -> 0.0, top=1
        (2, "solo"),
        # exact doubled text: "p q p q" bigrams [p q, q p, p q] -> 2/3
        (3, "p q p q"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[0]["n_tokens"] == 4
    assert got[0]["top_token_frac"] == 0.75
    assert got[0]["dup_token_frac"] == 0.75
    assert got[0]["dup_bigram_frac"] == round(2 / 3, 6)
    assert got[1]["dup_token_frac"] == 0.0
    assert got[1]["dup_bigram_frac"] == 0.0
    assert got[2]["n_tokens"] == 1
    assert got[2]["top_token_frac"] == 1.0
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["dup_token_frac"] == 1.0
    assert got[3]["dup_bigram_frac"] == round(2 / 3, 6)


def test_span_dedup_invalid_params_rejected(spark):
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    df = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="key must be"):
        span_dedup(df, key="md5")
    with pytest.raises(ValueError, match="keep must be"):
        span_dedup(df, keep="last")


def test_cap_per_group_invalid_n_rejected(spark):
    from decision_tree_stuff_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([(0, "g")], "doc_id bigint, grp string")
    with pytest.raises(ValueError, match="n must be"):
        cap_per_group(df, ["grp"], 0, ["doc_id"])


def test_semdedup_unknown_centroid_mode_rejected(spark):
    from decision_tree_stuff_spark.operators.similarity import semdedup

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(AssertionError, match="centroid_mode"):
        semdedup(df, centroid_mode="random")
