"""Data selection for LM training corpora (E-8d): DSIR —
Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
re-expressed as three composable declarative operators.

DSIR picks raw-corpus documents that look like a target corpus by
importance weights under two hashed-n-gram bag models:

    log w(x) = Σ_buckets c_b(x) · (log p_target(b) − log p_raw(b))

then resamples ∝ w(x) without replacement (Gumbel top-k). Everything
is counts, joins, and one window — no training loop, no UDFs — which
is exactly why the paper's recipe scales to pretraining corpora.

Scale notes: the featurizer is a per-doc projection + one explode
(bucket ids are bounded, default 10 000, so every model table is tiny
and broadcasts); weight scoring is one equi-join on the bucket id +
one per-doc sum; the Gumbel sampler is the WindowGroupLimit-pruned
top-k the other samplers use. Hash = md5-derived (portable to the
DuckDB oracle bit-for-bit; xxhash64 would be cheaper but unverifiable
cross-engine — the featurizer cost is one digest per token either
way).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from decision_tree_stuff_spark.functions.text import tokens

#: 16^15 — first-15-hex-digit range, shared by every md5-derived
#: uniform/bucket in this package
_HEX15 = float(16**15)


def _bucket(col: F.Column, n_buckets: int) -> F.Column:
    """md5-derived hash bucket in [0, n_buckets) — engine-portable
    (DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT % B)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
        % F.lit(n_buckets)
    )


def hashed_ngram_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    carry: Sequence[str] = (),
) -> DataFrame:
    """DSIR's featurizer: unigram + bigram occurrences hashed into
    ``n_buckets`` buckets — (id, *carry, bucket, c) with c the in-doc
    count. The array of grams is built doc-locally (one projection),
    then one explode + one grouped count; bigrams use the
    '\\x01'-joined pair as the hash input so 'ab c' and 'a bc' cannot
    collide by concatenation.

    ``carry`` names doc-level columns (functionally dependent on the
    id, e.g. a language or split tag) to ride through the grouped
    count, so ONE featurize pass can be sliced downstream into
    model-building subsets instead of featurizing each subset
    separately — the md5-per-gram digest is the dominant cost and
    this is how consumers share it."""
    carry = list(carry)
    from decision_tree_stuff_spark.operators import spread_small

    # the md5-per-gram digest below is the dominant cost and runs
    # scan-side — spread a single-split input across the executor
    # first (guarded no-op on real multi-split tables); measured
    # r10: lr_fit featurize 2x faster at bench scale
    toks_f = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    prep = spread_small(docs).select(
        F.col(id_col), *carry, toks_f.alias("__toks")
    )
    bigrams = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - 1),
            lambda i: F.concat_ws(
                "\x01",
                F.element_at(F.col("__toks"), i),
                F.element_at(F.col("__toks"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = prep.select(
        F.col(id_col),
        *carry,
        F.explode(F.concat(F.col("__toks"), bigrams)).alias("gram"),
    )
    return grams.select(
        F.col(id_col),
        *carry,
        _bucket(F.col("gram"), n_buckets).alias("bucket"),
    ).groupBy(id_col, *carry, "bucket").agg(F.count(F.lit(1)).alias("c"))


def dsir_model(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Bucket distribution of a corpus under the DSIR featurizer, with
    add-one smoothing so every bucket has mass in BOTH models (the
    weight is a difference of logs — an empty bucket would be −inf):
    (bucket, logprob) with logprob = ln((c_b + 1) / (N + B)). Train
    once per corpus (target AND raw), persist — model tables are at
    most ``n_buckets`` rows and always broadcast."""
    return dsir_model_from_features(
        hashed_ngram_features(corpus, id_col, text_col, n_buckets),
        n_buckets,
    )


def dsir_model_from_features(
    feats: DataFrame, n_buckets: int = 10_000
) -> DataFrame:
    """``dsir_model`` over an ALREADY-featurized (…, bucket, c) frame
    — the sharing entry point: featurize the whole corpus once (with
    ``carry`` tags), slice it per model, and Spark's exchange reuse
    computes the md5-per-gram pass a single time for every model and
    the scorer (vs one full featurize pass per consumer)."""
    counts = feats.groupBy("bucket").agg(F.sum("c").alias("cb"))
    total = feats.agg(
        (F.sum("c") + F.lit(float(n_buckets))).alias("__denom")
    )
    # missing buckets get the smoothed floor at scoring time; the
    # model table carries only observed buckets + the floor as a
    # 1-row frame cross-joined in by the scorer
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.log((F.col("cb") + 1.0) / F.col("__denom")).alias("logprob"),
    ).unionByName(
        total.select(
            F.lit(-1).cast("bigint").alias("bucket"),
            F.log(1.0 / F.col("__denom")).alias("logprob"),
        )
    )


def dsir_log_weights(
    docs: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-document DSIR importance log-weight: Σ c_b · (lp_target −
    lp_raw), buckets absent from a model scoring its smoothed floor
    (the bucket=-1 row each model carries). One featurize pass, two
    broadcast joins, one per-doc sum. Docs with no grams weight 0
    (target and raw floors cancel only per-bucket — an empty doc has
    no buckets at all). Returns (id, n_grams, log_weight)."""
    return dsir_log_weights_from_features(
        hashed_ngram_features(docs, id_col, text_col, n_buckets),
        docs.select(id_col),
        target_model,
        raw_model,
        id_col,
    )


def dsir_log_weights_from_features(
    feats: DataFrame,
    doc_ids: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """``dsir_log_weights`` over an already-featurized frame plus the
    id universe (``doc_ids`` — needed because gram-less docs have no
    feature rows but must still appear with weight 0). The sharing
    entry point for the one-featurize-pass DSIR pipeline."""

    def side(model: DataFrame, out: str):
        floor = model.where(F.col("bucket") == -1).select(
            F.col("logprob").alias(f"__floor_{out}")
        )
        probs = model.where(F.col("bucket") >= 0).select(
            "bucket", F.col("logprob").alias(f"__lp_{out}")
        )
        return probs, floor

    t_probs, t_floor = side(target_model, "t")
    r_probs, r_floor = side(raw_model, "r")
    scored = (
        feats.join(F.broadcast(t_probs), "bucket", "left")
        .join(F.broadcast(r_probs), "bucket", "left")
        .crossJoin(F.broadcast(t_floor))
        .crossJoin(F.broadcast(r_floor))
        .select(
            F.col(id_col),
            F.col("c"),
            (
                F.col("c")
                * (
                    F.coalesce(F.col("__lp_t"), F.col("__floor_t"))
                    - F.coalesce(F.col("__lp_r"), F.col("__floor_r"))
                )
            ).alias("__contrib"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.round(F.sum("__contrib"), 6).alias("log_weight"),
        )
    )
    return (
        doc_ids.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias(
                "n_grams"
            ),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def gumbel_topk_sample(
    df: DataFrame,
    n: int,
    log_weight_col: str,
    key_cols: List[str],
    seed: str = "gumbel",
    group_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Sample ``n`` rows (per group, if ``group_cols``) with
    probability ∝ exp(log_weight), without replacement, in the LOG
    domain — the Gumbel top-k trick (Vieira 2014; equivalent to
    Efraimidis-Spirakis but safe for weights spanning hundreds of
    nats, exactly what DSIR log-weights do): rank by
    log_w − ln(−ln u) DESC with u an md5-derived uniform in (0, 1).
    Deterministic under retries and across engines; same
    WindowGroupLimit plan as the other per-group samplers."""
    from decision_tree_stuff_spark.operators.sampling import hash_key

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    u = (
        F.conv(F.substring(hash_key(key_cols, seed), 1, 15), 16, 10).cast(
            "double"
        )
        + F.lit(1.0)
    ) / F.lit(_HEX15)
    gumbel_key = F.col(log_weight_col) - F.log(-F.log(u))
    w = Window.partitionBy(*(group_cols or [])).orderBy(
        gumbel_key.desc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= n)
        .drop("_rank")
    )
