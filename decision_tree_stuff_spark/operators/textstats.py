"""Text-analysis operators over ``documents`` (E-4): per-document
stats, language ID, quality scoring, fingerprinting, and TF-IDF.

Everything is built-in expressions + two groupBys (TF-IDF); the
per-document stats are a single narrow projection — at 100 TB they
cost exactly one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from decision_tree_stuff_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    shingle_fingerprint,
    stopword_ratio,
    token_count,
    tokens,
)


def document_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-pass per-document text statistics (all ratios rounded to
    6dp for oracle-stable doubles)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars_actual"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_tokens_bpe"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fingerprint"),
        shingle_fingerprint(t).alias("shingle_fp"),
    )


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Token TF-IDF: tf = occurrences in doc, idf = ln(N / df).

    Two groupBys (term counts; document frequency) + one broadcastable
    scalar (corpus size). The df frame is tiny (vocab-sized) → its
    join back to term counts broadcasts. Returns
    (id, token, tf, df, tfidf)."""
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
    n_docs = docs.select(id_col).distinct().count()
    return tf.join(F.broadcast(dfreq), "token").select(
        F.col(id_col),
        F.col("token"),
        F.col("tf"),
        F.col("df"),
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
