"""Benchmark decontamination: flag training documents that contain a
benchmark document's n-grams (the GPT-3-appendix-style overlap check —
training data that leaks an eval set inflates its scores).

Shape: token n-gram *sets* per side → equi-join on the gram →
per-(train, bench) match count → containment = matched / |bench
grams|. Containment (not Jaccard) is the right asymmetric measure: a
10-line benchmark item buried in a 10-page training doc is 100%
leaked even though Jaccard is tiny.

Scale: the join fans out per shared gram. For n ≥ 3 over a natural
vocabulary, gram document-frequency decays fast (the hot-key risk of
unigram joins mostly vanishes), and the benchmark side is small by
nature (it's an eval set) — broadcast it. ``max_df`` is still
available for adversarial corpora (boilerplate n-grams), same
mechanics as ``ngram_jaccard_pairs``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from decision_tree_stuff_spark.functions.text import tokens


def token_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Distinct (id, gram) with gram = n consecutive whitespace tokens
    joined by ' '. Empty tokens are dropped before gram formation.

    DuckDB twin: ``list_transform(range(1, len(toks)-n+2),
    i -> array_to_string(toks[i:i+n-1], ' '))`` over
    ``list_filter(<TOKS>, t -> t <> '')``.
    """
    # project the token array ONCE: Catalyst does not eliminate common
    # subexpressions across lambda boundaries, so inlining tokens()
    # into the transform re-runs the normalization regex per array
    # element (measured 10× on this operator; same pitfall as
    # functions.text.tokens_from_norm)
    from decision_tree_stuff_spark.operators import spread_small

    # gram construction (regex tokenize + n concat_ws per position)
    # dominates; spread a single-split input first (guarded no-op on
    # real multi-split tables)
    tokd = spread_small(df).select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("_toks"),
    )
    t = F.col("_toks")
    # sequence(1, 0) yields a DESCENDING [1, 0] (not empty) and the
    # slice at index 0 throws — docs shorter than n tokens need the
    # explicit empty-array branch
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # per-doc array_distinct makes (id, gram) globally unique at
    # explode time — the set semantics come for free inside the
    # projection, with NO global distinct shuffle
    return tokd.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    train_id: str = "doc_id",
    bench_id: str = "doc_id",
    text_col: str = "text",
    max_df: Optional[int] = None,
) -> DataFrame:
    """Contaminated (train, bench) pairs with containment ≥ threshold.

    Returns (train_id, bench_id, matched, bench_n, containment) —
    containment rounded to 6dp for cross-engine float stability.
    ``bench_n`` counts the benchmark doc's distinct n-grams; documents
    shorter than n tokens have none and can never match.

    ``max_df`` (document frequency measured on the TRAIN side) drops
    hot boilerplate grams from BOTH sides, including the ``bench_n``
    denominator — capping only the train side would deflate
    containment (a fully-leaked bench doc carrying one hot gram could
    never reach 1.0) and under-flag contamination.
    """
    from pyspark.sql import Window

    tg = token_ngrams(train, train_id, text_col, n).withColumnRenamed(
        train_id, "train_id"
    )
    bg = token_ngrams(bench, bench_id, text_col, n).withColumnRenamed(
        bench_id, "bench_id"
    )
    if max_df is not None:
        hot = (
            tg.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("gram")
        )
        tg = tg.join(F.broadcast(hot), "gram", "left_anti")
        bg = bg.join(F.broadcast(hot), "gram", "left_anti")
    # bench_n rides along on the gram rows via a window over the SMALL
    # (broadcast) side instead of a separate groupBy + second join —
    # the bench corpus is tokenized ONCE (the old sizes/matched pair
    # of plans re-ran token_ngrams(bench) twice) and the train side
    # sees exactly one broadcast hash join, one shuffled aggregation
    bgn = bg.select(
        "bench_id",
        "gram",
        F.count(F.lit(1))
        .over(Window.partitionBy("bench_id"))
        .alias("bench_n"),
    )
    return (
        tg.join(F.broadcast(bgn), "gram")
        .groupBy("train_id", "bench_id")
        .agg(
            F.count(F.lit(1)).alias("matched"),
            F.first("bench_n").alias("bench_n"),
        )
        .withColumn(
            "containment",
            F.round(F.col("matched") / F.col("bench_n").cast("double"), 6),
        )
        .where(F.col("containment") >= threshold)
        .select("train_id", "bench_id", "matched", "bench_n", "containment")
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    train_id: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """The cleaned corpus: training docs whose containment against
    EVERY benchmark doc stays below threshold (anti-semi-join on the
    contaminated id set)."""
    bad = ngram_contamination(
        train, bench, n, threshold, train_id=train_id, **kwargs
    ).select(F.col("train_id").alias(train_id)).distinct()
    return train.join(bad, train_id, "anti")
