"""Null/empty-input behavior: a real corpus has null text, empty
docs, and empty tables. Operators must have a DEFINED, non-crashing
behavior on each — pinned here so refactors keep it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from decision_tree_stuff_spark.operators.sampling import (
    deterministic_sample,
    global_shuffle,
)
from decision_tree_stuff_spark.operators.textstats import (
    corpus_profile,
    document_stats,
)


@pytest.fixture()
def dirty(spark):
    rows = [
        (0, "normal document with several words", "en"),
        (1, None, "en"),          # null text
        (2, "", "en"),            # empty text
        (3, "   ", "de"),         # whitespace only
        (4, "normal document with several words", "en"),  # dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_document_stats_null_and_empty_text(dirty):
    out = {r.doc_id: r for r in document_stats(dirty).collect()}
    assert set(out) == {0, 1, 2, 3, 4}       # no row silently dropped
    assert out[0].n_tokens > 0
    # Documented tokenizer quirk, shared bit-for-bit with the DuckDB
    # twin: empty/whitespace text normalizes to '' whose split is ['']
    # -> n_tokens reports 1 (the ratios are guarded; quality stays
    # well-defined and low). Null text propagates null stats —
    # distinguishable from empty, never a crash.
    for i in (2, 3):
        assert out[i].n_tokens == 1
        assert out[i].quality is not None
    assert out[1].n_tokens is None


def test_dedup_handles_null_and_empty(dirty):
    groups = exact_dedup(dirty, ["text"], "doc_id").collect()
    # 0 and 4 collapse; null text is its own group (SQL groupBy
    # treats nulls equal); total groups = 4
    assert len(groups) == 4
    kept = {r.doc_id for r in groups}
    assert 0 in kept and 4 not in kept

    # pair emitters: docs without tokens simply emit no pairs
    pairs = ngram_jaccard_pairs(dirty, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(0, 4)}
    mh = minhash_lsh_pairs(dirty, threshold=0.5)
    assert {(r.id_a, r.id_b) for r in mh.collect()} == {(0, 4)}


def test_corpus_profile_with_empty_docs(dirty):
    prof = {r.lang: r for r in corpus_profile(dirty).collect()}
    # every group appears and n_docs counts ALL its docs — a dataset
    # card must not silently exclude empty/null-text documents; token
    # stats default to 0 for all-empty groups
    assert set(prof) == {"en", "de"}
    assert prof["en"].n_docs == 4 and prof["de"].n_docs == 1
    assert prof["en"].n_tokens > 0
    assert prof["de"].n_tokens == 0 and prof["de"].n_distinct_tokens == 0


def test_sampling_on_empty_frame(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert deterministic_sample(empty, 0.5, ["doc_id"]).count() == 0
    assert global_shuffle(empty, ["doc_id"]).count() == 0


def test_pair_ops_on_empty_frame(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert minhash_lsh_pairs(empty, threshold=0.5).count() == 0
    assert ngram_jaccard_pairs(empty, threshold=0.5).count() == 0


def test_span_dedup_null_and_empty_text(dirty):
    """Null/empty/whitespace text produce zero chunks and come back
    with text='' (defined, matches the DuckDB twin); no row is ever
    dropped. Exact-duplicate docs span-dedup each other completely
    under the default drop-every-occurrence mode."""
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    out = {r.doc_id: r for r in span_dedup(dirty, n=3, min_docs=2).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    for i in (1, 2, 3):
        assert (out[i].text, out[i].n_chunks, out[i].n_kept) == ("", 0, 0)
    # docs 0 and 4 are exact copies: every chunk is frequent
    for i in (0, 4):
        assert out[i].text == "" and out[i].n_kept == 0


def test_scrub_documents_null_propagates(dirty):
    from decision_tree_stuff_spark.operators.textstats import (
        scrub_documents,
    )

    out = {r.doc_id: r for r in scrub_documents(dirty).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[1].text is None and out[1].n_email is None
    assert out[2].text == "" and out[2].n_email == 0


def test_cap_and_semdedup_on_empty_frames(spark):
    from decision_tree_stuff_spark.operators.sampling import cap_per_group
    from decision_tree_stuff_spark.operators.similarity import semdedup

    empty_docs = spark.createDataFrame([], "doc_id bigint, grp string")
    assert cap_per_group(empty_docs, ["grp"], 5, ["doc_id"]).count() == 0
    empty_emb = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    assert semdedup(empty_emb).count() == 0


def test_winnow_and_lm_ops_null_and_empty_text(dirty):
    """Round-6 text operators on dirty input: winnowing emits no rows
    for null/empty/whitespace docs (and no crash); the LM scorers keep
    EVERY doc with n_tokens/n_bigrams=0 and a null score for the
    unscorable ones; edit verification handles null text through the
    normalization (null -> no pair output rather than a crash)."""
    from decision_tree_stuff_spark.operators.dedup import (
        edit_similarity_pairs,
        winnow_fingerprints,
        winnow_pairs,
    )
    from decision_tree_stuff_spark.operators.textstats import (
        bigram_logprob,
        unigram_logprob,
    )

    fps = winnow_fingerprints(dirty, k=8, w=4)
    fp_docs = {r.doc_id for r in fps.select("doc_id").distinct().collect()}
    assert fp_docs == {0, 4}                   # only real text fingerprints
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_pairs(dirty, k=8, w=4, min_shared=1).collect()
    }
    assert pairs == {(0, 4)}                   # the planted dup
    # uncapped path too (self-join formulation)
    pairs2 = {
        (r.id_a, r.id_b)
        for r in winnow_pairs(
            dirty, k=8, w=4, min_shared=1, max_df=None
        ).collect()
    }
    assert pairs2 == pairs

    uni = {r.doc_id: (r.n_tokens, r.mean_logprob)
           for r in unigram_logprob(dirty).collect()}
    assert set(uni) == {0, 1, 2, 3, 4}         # every doc represented
    assert uni[1] == (0, None) and uni[2] == (0, None) and uni[3] == (0, None)
    assert uni[0][0] > 0 and uni[0][1] is not None

    bg = {r.doc_id: (r.n_bigrams, r.mean_logprob)
          for r in bigram_logprob(dirty).collect()}
    assert set(bg) == {0, 1, 2, 3, 4}
    assert bg[1] == (0, None) and bg[0][0] > 0

    cand = dirty.sparkSession.createDataFrame(
        [(0, 1), (0, 4)], "id_a bigint, id_b bigint"
    )
    ev = {(r.id_a, r.id_b): r.rel_dist
          for r in edit_similarity_pairs(dirty, cand, max_rel_dist=1.0).collect()}
    assert ev.get((0, 4)) == 0.0               # identical docs
    assert (0, 1) not in ev                    # null side joins away, no crash


def test_r7_lm_and_classifier_ops_handle_null_and_empty(dirty, spark):
    """Round-7 scorers/classifiers on dirty input: every doc
    represented (or deterministically excluded), no crashes."""
    from decision_tree_stuff_spark.operators.textstats import (
        nb_classify,
        nb_model,
        stupid_backoff_logprob,
    )

    # Stupid Backoff self-model: tokenless docs -> n_trigrams=0, null
    # score; null text never crashes the gram builder
    sb = {r["doc_id"]: (r["n_trigrams"], r["mean_logprob"])
          for r in stupid_backoff_logprob(dirty).collect()}
    assert set(sb) == {0, 1, 2, 3, 4}
    for i in (1, 2, 3):
        assert sb[i] == (0, None)
    assert sb[0][0] > 0 and sb[0][1] is not None

    # NB: model trains through null/empty rows; tokenless docs
    # classify by prior alone (still present in the output)
    tp, lp = nb_model(dirty, "lang")
    out = {r["doc_id"]: r["label"] for r in nb_classify(dirty, tp, lp).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(v in ("en", "de") for v in out.values())


def test_r7_selection_ops_handle_null_and_empty(dirty, spark):
    """DSIR weights and the samplers on dirty input: empty/null docs
    weight 0 (never NaN/-inf), weighted sampling drops only
    non-positive weights, temperature allocation survives groups made
    entirely of empty docs."""
    from decision_tree_stuff_spark.operators.sampling import (
        temperature_sample,
        weighted_sample_per_group,
    )
    from decision_tree_stuff_spark.operators.selection import (
        dsir_log_weights,
        dsir_model,
        gumbel_topk_sample,
    )

    target = dsir_model(dirty.where(F.col("doc_id") == 0), n_buckets=256)
    raw = dsir_model(dirty, n_buckets=256)
    w = {r["doc_id"]: (r["n_grams"], r["log_weight"])
         for r in dsir_log_weights(dirty, target, raw, n_buckets=256).collect()}
    assert set(w) == {0, 1, 2, 3, 4}
    for i in (1, 2, 3):
        assert w[i] == (0, 0.0)
    import math
    assert all(not math.isnan(v[1]) and not math.isinf(v[1]) for v in w.values())

    # gumbel over those weights: total order, no crash, n rows out
    scored = dsir_log_weights(dirty, target, raw, n_buckets=256)
    assert gumbel_topk_sample(scored, 3, "log_weight", ["doc_id"]).count() == 3

    # weighted sampling: null weight rows silently excluded (pinned)
    wdf = dirty.withColumn(
        "wt", F.when(F.col("doc_id") < 3, F.col("doc_id").cast("double"))
    )  # weights: 0->0.0 (dropped), 1->1.0, 2->2.0, 3/4 -> null (dropped)
    kept = {r["doc_id"] for r in weighted_sample_per_group(
        wdf, ["lang"], 10, "wt", ["doc_id"]).collect()}
    assert kept == {1, 2}

    # temperature allocation over dirty groups: exact budget when
    # feasible, never over-allocates
    out = temperature_sample(dirty, "lang", 3, 0.5, ["doc_id"], seed="n")
    assert out.count() == 3


def test_unigram_encode_oracle_parity_on_null_text(dirty):
    """r12 advice regression: the DuckDB twin used to coalesce null
    text to (0, '') while Spark returns (NULL, NULL) — latent only
    because documents.parquet has no null texts. Pin full-row parity
    on a table WITH one."""
    import duckdb

    from decision_tree_stuff_spark.operators.bpe import (
        unigram_encode,
        unigram_lm_train,
    )
    from decision_tree_stuff_spark.queries._shared import (
        _unigram_encode_sql,
    )

    pieces = unigram_lm_train(
        dirty,
        vocab_size=40,
        seed_size=60,
        max_piece_len=3,
        max_word_len=8,
        em_iters=2,
    )
    got = {
        r["doc_id"]: (r["n_pieces"], r["encoded"])
        for r in unigram_encode(dirty, pieces).collect()
    }

    con = duckdb.connect()
    pdf = dirty.toPandas()
    con.register("documents", pdf)
    want = {
        int(d): (None if n is None else int(n), e)
        for d, n, e in con.execute(_unigram_encode_sql()).fetchall()
    }
    assert got == want
    assert got[1] == (None, None)          # the null-text row
