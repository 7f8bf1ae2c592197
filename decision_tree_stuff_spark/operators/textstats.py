"""Text-analysis operators over ``documents`` (E-4): per-document
stats, language ID, quality scoring, fingerprinting, and TF-IDF.

Everything is built-in expressions + two groupBys (TF-IDF); the
per-document stats are a single narrow projection — at 100 TB they
cost exactly one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from decision_tree_stuff_spark.functions.text import (
    BPE_ISH_PATTERN,
    LANG_STOPWORDS,
    LANGS,
    QUALITY_STOPWORDS,
    normalize_text,
    punct_ratio,
    shingle_fingerprint_from_norm,
    stop_hits,
    tokens,
    tokens_from_norm,
)


def document_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-pass per-document text statistics (all ratios rounded to
    6dp for oracle-stable doubles).

    The normalized text is projected ONCE and every downstream
    expression references that column — Catalyst does not eliminate
    common subexpressions across lambda boundaries, so the naive
    inlined form re-ran the normalization regex per consumer and per
    shingle (measured 6× slower at sf0.1)."""
    t = F.col(text_col)
    pre = docs.select(
        F.col(id_col), t.alias("__text"), normalize_text(t).alias("__norm")
    )
    toks = tokens_from_norm(F.col("__norm"))
    n_toks = F.greatest(F.size(toks), F.lit(1)).cast("double")
    sr = stop_hits(toks, QUALITY_STOPWORDS) / n_toks
    pr = punct_ratio(F.col("__text"))
    quality = (
        0.4 * sr
        + 0.3 * F.least(F.lit(1.0), F.size(toks) / F.lit(100.0))
        + 0.3 * (1.0 - pr)
    )
    scores = {lang: stop_hits(toks, stops) for lang, stops in LANG_STOPWORDS.items()}
    m = F.greatest(*[scores[lang] for lang in LANGS])
    lang_guess = F.when(m == 0, F.lit("und"))
    for lang in LANGS:
        lang_guess = lang_guess.when(scores[lang] == m, F.lit(lang))
    return pre.select(
        F.col(id_col),
        F.length(F.col("__text")).alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.col("__norm"), F.lit(BPE_ISH_PATTERN), 0)
        ).alias("n_tokens_bpe"),
        F.round(sr, 6).alias("stopword_ratio"),
        F.round(pr, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality"),
        lang_guess.alias("lang_guess"),
        F.md5(F.col("__norm")).alias("fingerprint"),
        shingle_fingerprint_from_norm(F.col("__norm")).alias("shingle_fp"),
    )


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Token TF-IDF: tf = occurrences in doc, idf = ln(N / df).

    Two groupBys (term counts; document frequency) + the corpus size
    as a broadcast 1-row aggregate cross-joined INTO the plan — not a
    separate ``.count()`` action, which would cost one extra driver
    job per invocation. The df frame is tiny (vocab-sized) → its join
    back to term counts broadcasts. Returns (id, token, tf, df,
    tfidf)."""
    occ = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    tf = occ.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        occ.select(id_col, "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    n_docs = docs.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("__n_docs")
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("token"),
            F.col("tf"),
            F.col("df"),
            F.round(
                F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
