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

    Tokenizer quirk (shared bit-for-bit with the DuckDB twin, pinned
    in tests/test_null_robustness.py): empty/whitespace text
    normalizes to '' whose whitespace split is [''] — ``n_tokens``
    reports 1 for such docs. Ratios are guarded (greatest(n, 1)) so
    quality stays defined; null text propagates null stats,
    distinguishable from empty.

    The normalized text is projected ONCE and every downstream
    expression references that column — Catalyst does not eliminate
    common subexpressions across lambda boundaries, so the naive
    inlined form re-ran the normalization regex per consumer and per
    shingle (measured 6× slower at sf0.1)."""
    from decision_tree_stuff_spark.operators import spread_small

    t = F.col(text_col)
    # per-row regex/shingle work dominates this plan — make sure a
    # sub-rowgroup bench file doesn't serialize it on one core
    # (spread_small is a guarded no-op on real multi-split tables)
    pre = spread_small(docs).select(
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


def unigram_model(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The materialization target for LM-based quality scoring: the
    corpus's unigram model as a (token, logprob) table — ln of the
    token's share of all token occurrences. Train once over the
    historical corpus, persist, and score new batches with
    ``unigram_logprob(batch, model=...)`` — the same
    learn-offline/apply-on-ingest split the span-strip and
    incremental-dedup operators use.

    Plan: one exploded groupBy for counts; the corpus total enters as
    a broadcast 1-row aggregate cross-joined into the plan (no
    separate count() action) — the tf_idf idiom."""
    occ = docs.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    counts = occ.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = occ.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "token",
        F.log(F.col("c") / F.col("__total")).alias("logprob"),
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame = None,
    oov_logprob: float = -20.0,
) -> DataFrame:
    """CCNet-style language-model quality signal (Wenzek et al. 2020
    filter corpora by LM perplexity; the unigram model is its
    SQL-oracle-checkable core): each document's mean per-token natural
    log-probability. Low scores flag gibberish/rare-token soup, high
    scores flag natural running text — threshold downstream with
    ``filter_by_quantile``.

    ``model=None`` scores the corpus under its OWN unigram model
    (every token is then in-vocabulary). Passing a persisted
    ``unigram_model`` table instead is the ingest shape; tokens absent
    from the model score ``oov_logprob`` (a floor standing in for
    smoothing mass — exact discounting needs the model's total count,
    which a portable (token, logprob) table doesn't carry).

    Plan: explode → one equi-join against the vocab-sized model table
    (AQE broadcasts it when small; at a 100 TB vocabulary it stays a
    plain shuffle join — both sides hash on the token) → one per-doc
    aggregate. Docs with no tokens return n_tokens=0 and a null score.
    Returns (id_col, n_tokens, mean_logprob) with every input doc
    represented.
    """
    occ = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    m = (model if model is not None else unigram_model(docs, id_col, text_col))
    m = m.select("token", F.col("logprob").alias("__lp"))
    scored = (
        occ.join(m, "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                F.avg(F.coalesce(F.col("__lp"), F.lit(float(oov_logprob)))), 6
            ).alias("mean_logprob"),
        )
    )
    return (
        docs.select(id_col).distinct()
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias(
                "n_tokens"
            ),
            F.col("mean_logprob"),
        )
    )


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per adjacent token pair (w1, w2) per document, empty
    tokens dropped before pairing. The pair array is built doc-locally
    (transform over a bounded sequence); docs with < 2 tokens emit no
    rows. sequence() counts DOWN when stop < start, so the 1-token
    case is guarded explicitly rather than fed a reversed range."""
    toks_f = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    prep = docs.select(F.col(id_col), toks_f.alias("__toks"))
    pairs = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - 1),
            lambda i: F.struct(
                F.element_at(F.col("__toks"), i).alias("w1"),
                F.element_at(F.col("__toks"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    return prep.select(
        F.col(id_col), F.explode(pairs).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_model(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Conditional bigram model as a (w1, w2, logprob) table:
    ln( c(w1 w2) / Σ_x c(w1 x) ) — MLE of P(w2 | w1), self-normalized
    over observed continuations. One step up the KenLM ladder from
    ``unigram_model``; same train-offline/score-on-ingest split.

    Plan: one exploded groupBy for pair counts, one groupBy for
    per-context totals (vocab-sized — its join back broadcasts under
    AQE when small, hash-joins otherwise)."""
    bg = _doc_bigrams(docs, id_col, text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("double").alias("c1"))
    return c2.join(c1, "w1").select(
        "w1", "w2", F.log(F.col("c2") / F.col("c1")).alias("logprob")
    )


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame = None,
    oov_logprob: float = -20.0,
) -> DataFrame:
    """Mean adjacent-pair conditional ln-probability per document —
    the bigram refinement of ``unigram_logprob`` (CCNet-style LM
    filtering; repetitive boilerplate scores HIGH, rare-token soup
    scores LOW, and unseen transitions hit the ``oov_logprob`` floor
    when scoring against a persisted external ``bigram_model``).

    Same plan shape as the unigram scorer: explode pairs → one
    equi-join on (w1, w2) → per-doc aggregate. Docs with fewer than 2
    tokens return n_bigrams=0 and a null score. Returns (id_col,
    n_bigrams, mean_logprob) with every input doc represented.
    """
    bg = _doc_bigrams(docs, id_col, text_col)
    m = model if model is not None else bigram_model(docs, id_col, text_col)
    m = m.select("w1", "w2", F.col("logprob").alias("__lp"))
    scored = (
        bg.join(m, ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.avg(F.coalesce(F.col("__lp"), F.lit(float(oov_logprob)))), 6
            ).alias("mean_logprob"),
        )
    )
    return (
        docs.select(id_col).distinct()
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            F.col("mean_logprob"),
        )
    )


def _doc_trigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per adjacent token triple (w1, w2, w3) per document —
    the trigram twin of ``_doc_bigrams`` (same doc-local construction,
    same <3-token guard)."""
    toks_f = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    prep = docs.select(F.col(id_col), toks_f.alias("__toks"))
    tris = F.when(
        F.size("__toks") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - 2),
            lambda i: F.struct(
                F.element_at(F.col("__toks"), i).alias("w1"),
                F.element_at(F.col("__toks"), i + 1).alias("w2"),
                F.element_at(F.col("__toks"), i + 2).alias("w3"),
            ),
        ),
    ).otherwise(F.array())
    return prep.select(F.col(id_col), F.explode(tris).alias("tg")).select(
        id_col,
        F.col("tg.w1").alias("w1"),
        F.col("tg.w2").alias("w2"),
        F.col("tg.w3").alias("w3"),
    )


def stupid_backoff_model(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stupid Backoff trigram model (Brants et al., EMNLP'07 — the
    published large-scale choice: relative frequencies with a fixed
    backoff factor, NO normalization, designed for exactly this
    distributed map-reduce setting) as ONE portable table:

    (order, w1, w2, w3, logprob) with
      order 3: ln( c(w1 w2 w3) / c(w1 w2) )   — trigram rel. freq.
      order 2: ln( c(w2 w3)   / c(w2)   )     — w1 NULL
      order 1: ln( c(w3)      / N      )      — w1, w2 NULL

    Denominators are RAW corpus counts (the paper's f(...)), not
    context-position counts — c(w1 w2) is the bigram occurrence
    count, c(w2) the unigram count, N total tokens. The union keeps
    the persist-once/score-on-ingest contract of the unigram and
    bigram models: one parquet table, three filtered views at scoring
    time.

    Plan: one trigram explode + groupBy, the bigram/unigram count
    tables the lower orders already use, each score one join against
    its denominator table (vocab-sized — AQE broadcasts when small).
    """
    tg = _doc_trigrams(docs, id_col, text_col)
    bg = _doc_bigrams(docs, id_col, text_col)
    occ = docs.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")

    c3 = tg.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = occ.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    total = occ.agg(F.count(F.lit(1)).cast("double").alias("__total"))

    tri = c3.join(c2, ["w1", "w2"]).select(
        F.lit(3).alias("order"),
        "w1",
        "w2",
        "w3",
        F.log(F.col("c3") / F.col("c2")).alias("logprob"),
    )
    bi = c2.join(
        c1.select(F.col("token").alias("w1"), "c1"), "w1"
    ).select(
        F.lit(2).alias("order"),
        F.lit(None).cast("string").alias("w1"),
        F.col("w1").alias("w2"),
        F.col("w2").alias("w3"),
        F.log(F.col("c2") / F.col("c1")).alias("logprob"),
    )
    uni = c1.crossJoin(F.broadcast(total)).select(
        F.lit(1).alias("order"),
        F.lit(None).cast("string").alias("w1"),
        F.lit(None).cast("string").alias("w2"),
        F.col("token").alias("w3"),
        F.log(F.col("c1") / F.col("__total")).alias("logprob"),
    )
    return tri.unionByName(bi).unionByName(uni)


def stupid_backoff_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame = None,
    alpha: float = 0.4,
    oov_logprob: float = -20.0,
) -> DataFrame:
    """Per-document mean Stupid Backoff score — the trigram rung of
    the CCNet-style LM-quality ladder (above ``unigram_logprob`` and
    ``bigram_logprob``):

      S(w3 | w1 w2) = rel.freq(w1 w2 w3)          if c(w1 w2 w3) > 0
                    = alpha   * rel.freq(w2 w3)   elif c(w2 w3) > 0
                    = alpha^2 * rel.freq(w3)      elif c(w3) > 0
                    = exp(oov_logprob)            otherwise

    (alpha = 0.4 per Brants et al.; scores are NOT probabilities — no
    normalization, by design.) ``model=None`` scores against the
    corpus's own model (every trigram is then order-3). The ingest
    shape passes a persisted ``stupid_backoff_model`` table; unseen
    trigrams fall through the backoff chain in one coalesce.

    Plan: trigram explode, THREE left equi-joins against the model's
    order slices (each vocab-sized; AQE broadcasts small slices, hash
    joins otherwise — both sides key on tokens, no skewed windows),
    one per-doc aggregate. Docs with <3 tokens return n_trigrams=0
    and a null score; every input doc is represented.
    """
    import math

    tg = _doc_trigrams(docs, id_col, text_col)
    m = (
        model
        if model is not None
        else stupid_backoff_model(docs, id_col, text_col)
    )
    tri = m.where(F.col("order") == 3).select(
        "w1", "w2", "w3", F.col("logprob").alias("__lp3")
    )
    bi = m.where(F.col("order") == 2).select(
        F.col("w2"), F.col("w3"), F.col("logprob").alias("__lp2")
    )
    uni = m.where(F.col("order") == 1).select(
        F.col("w3"), F.col("logprob").alias("__lp1")
    )
    ln_a = math.log(alpha)
    score = F.coalesce(
        F.col("__lp3"),
        F.col("__lp2") + F.lit(ln_a),
        F.col("__lp1") + F.lit(2.0 * ln_a),
        F.lit(float(oov_logprob)),
    )
    scored = (
        tg.join(tri, ["w1", "w2", "w3"], "left")
        .join(bi, ["w2", "w3"], "left")
        .join(uni, ["w3"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.round(F.avg(score), 6).alias("mean_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_trigrams"), F.lit(0)).cast("bigint").alias(
                "n_trigrams"
            ),
            F.col("mean_logprob"),
        )
    )


def kneser_ney_model(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram model (Kneser & Ney '95; the
    Chen & Goodman '99 interpolated form KenLM defaults to) — the
    smoothing rung above Stupid Backoff on the LM-quality ladder:
    backoff mass goes to a CONTINUATION distribution (how many
    distinct contexts a word follows) rather than raw frequency, so
    frequent-but-context-bound words ("francisco") stop soaking up
    unseen-bigram probability.

    One portable (kind, w1, w2, value) table, three slices:

      kind 'big'  (w1, w2): max(c(w1 w2) − D, 0) / c(w1 ·)
      kind 'ctx'  (w1):     λ(w1) = D · N1+(w1 ·) / c(w1 ·)
      kind 'cont' (w2):     P_cont(w2) = N1+(· w2) / N1+(· ·)

    where N1+(w1 ·) counts distinct continuations of w1, N1+(· w2)
    distinct left contexts of w2, and N1+(· ·) the total number of
    bigram TYPES. P(w2|w1) = big + λ(w1)·P_cont(w2) sums to exactly 1
    over the continuation vocabulary for every seen context (pinned in
    tests/test_textstats_profile.py::test_kneser_ney_normalizes).

    Plan: ONE bigram-type aggregate (`c2`) feeds all three slices —
    context totals and N1+(w1 ·) come from one groupBy over it,
    continuation counts from another; the scalar type-count enters as
    a broadcast 1-row frame (the tf_idf idiom, no separate action).
    Same persist-once/score-on-ingest contract as the other models.
    """
    D = float(discount)
    bg = _doc_bigrams(docs, id_col, text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # one pass over the type table yields both the denominator c(w1 ·)
    # and the distinct-continuation count N1+(w1 ·) — rows of c2 ARE
    # the distinct (w1, w2) types, so count(*) per w1 is N1+.
    ctx = c2.groupBy("w1").agg(
        F.sum("c2").cast("double").alias("__ctot"),
        F.count(F.lit(1)).cast("double").alias("__nfwd"),
    )
    cont = c2.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("__nrev")
    )
    types_total = c2.agg(F.count(F.lit(1)).cast("double").alias("__types"))
    big = c2.join(ctx, "w1").select(
        F.lit("big").alias("kind"),
        "w1",
        "w2",
        (
            F.greatest(F.col("c2") - F.lit(D), F.lit(0.0)) / F.col("__ctot")
        ).alias("value"),
    )
    lam = ctx.select(
        F.lit("ctx").alias("kind"),
        "w1",
        F.lit(None).cast("string").alias("w2"),
        (F.lit(D) * F.col("__nfwd") / F.col("__ctot")).alias("value"),
    )
    pcont = cont.crossJoin(F.broadcast(types_total)).select(
        F.lit("cont").alias("kind"),
        F.lit(None).cast("string").alias("w1"),
        F.col("w2"),
        (F.col("__nrev") / F.col("__types")).alias("value"),
    )
    return big.unionByName(lam).unionByName(pcont)


def kneser_ney_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame = None,
    discount: float = 0.75,
    oov_logprob: float = -20.0,
) -> DataFrame:
    """Per-document mean interpolated Kneser–Ney bigram
    ln-probability:

      P(w2|w1) = max(c−D,0)/c(w1·) + λ(w1)·P_cont(w2)   (both terms
                 present even for seen bigrams — interpolated, not
                 backoff-only)
      unseen bigram, known w1 and w2:  λ(w1)·P_cont(w2)
      unknown context OR w2 never seen as a continuation: the
      ``oov_logprob`` floor (a genuine OOV — KN assigns it no mass).

    ``model=None`` scores against the corpus's own model; the ingest
    shape passes a persisted ``kneser_ney_model`` table. Same plan
    shape as the other scorers: bigram explode, three left equi-joins
    against the model's slices (vocab-sized; AQE broadcasts small
    slices, hash-joins otherwise), one per-doc aggregate. Docs with
    <2 tokens return n_bigrams=0 and a null score.
    """
    bg = _doc_bigrams(docs, id_col, text_col)
    m = (
        model
        if model is not None
        else kneser_ney_model(docs, id_col, text_col, discount)
    )
    big = m.where(F.col("kind") == "big").select(
        "w1", "w2", F.col("value").alias("__disc")
    )
    lam = m.where(F.col("kind") == "ctx").select(
        "w1", F.col("value").alias("__lam")
    )
    cont = m.where(F.col("kind") == "cont").select(
        "w2", F.col("value").alias("__pcont")
    )
    score = F.when(
        F.col("__lam").isNotNull() & F.col("__pcont").isNotNull(),
        F.log(
            F.coalesce(F.col("__disc"), F.lit(0.0))
            + F.col("__lam") * F.col("__pcont")
        ),
    ).otherwise(F.lit(float(oov_logprob)))
    scored = (
        bg.join(big, ["w1", "w2"], "left")
        .join(lam, ["w1"], "left")
        .join(cont, ["w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(score), 6).alias("mean_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            F.col("mean_logprob"),
        )
    )


def nb_model(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
):
    """Multinomial Naive Bayes model over token occurrences — the
    classic cheap text classifier (the shape behind fastText-style
    quality/language classifiers in data-curation pipelines, minus
    the embedding: pure counts, fully SQL-expressible).

    Returns (token_probs, label_probs):

    * token_probs (label, token, logprob): ln P(token | label) with
      Laplace smoothing — (c(t,l) + a) / (N_l + a·V), V = global
      vocabulary size, N_l = token occurrences in label l.
    * label_probs (label, prior_logprob, oov_logprob): ln P(label)
      and the smoothed unseen-token mass ln(a / (N_l + a·V)) — the
      per-label OOV floor a portable model table needs at scoring
      time.

    Train offline over the labeled corpus, persist both tables, score
    batches with ``nb_classify`` — the same split every model-shaped
    operator here uses. Plan: one occurrence explode, two grouped
    counts, V and the doc total as broadcast 1-row aggregates — no
    driver-side actions.
    """
    occ = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).where(F.col("token") != "")
    c_tl = occ.groupBy("label", "token").agg(F.count(F.lit(1)).alias("c"))
    n_l = c_tl.groupBy("label").agg(F.sum("c").cast("double").alias("n_l"))
    vocab = c_tl.select("token").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__v")
    )
    a = float(smoothing)
    token_probs = (
        c_tl.join(n_l, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "token",
            F.log(
                (F.col("c") + F.lit(a))
                / (F.col("n_l") + F.lit(a) * F.col("__v"))
            ).alias("logprob"),
        )
    )
    doc_counts = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = docs.agg(F.count(F.lit(1)).cast("double").alias("__t"))
    label_probs = (
        doc_counts.join(n_l, "label")
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.log(F.col("n_docs") / F.col("__t")).alias("prior_logprob"),
            F.log(
                F.lit(a) / (F.col("n_l") + F.lit(a) * F.col("__v"))
            ).alias("oov_logprob"),
        )
    )
    return token_probs, label_probs


def nb_classify(
    docs: DataFrame,
    token_probs: DataFrame,
    label_probs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under every label and keep the argmax —
    multinomial NB inference: score(d, l) = prior_l + Σ_tokens
    ln P(t | l), unseen tokens at the label's smoothed OOV floor.

    Plan: occurrence explode × |labels| (labels ride a broadcast),
    one LEFT join against the vocab-sized token_probs table (AQE
    broadcasts it when small, hash-joins otherwise), one grouped sum,
    one per-doc argmax via row_number (ties broken by label ASC for
    cross-engine determinism). Tokenless docs classify by prior
    alone; every input doc is represented. Returns (id_col, label,
    score) with score rounded to 6dp.
    """
    labels = label_probs.select("label", "prior_logprob", "oov_logprob")
    occ = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    contrib = (
        occ.crossJoin(F.broadcast(labels.select("label", "oov_logprob")))
        .join(token_probs, ["label", "token"], "left")
        .groupBy(id_col, "label")
        .agg(
            F.sum(
                F.coalesce(F.col("logprob"), F.col("oov_logprob"))
            ).alias("s")
        )
    )
    base = docs.select(id_col).distinct().crossJoin(F.broadcast(labels))
    scored = base.join(contrib, [id_col, "label"], "left").select(
        F.col(id_col),
        "label",
        (F.col("prior_logprob") + F.coalesce(F.col("s"), F.lit(0.0))).alias(
            "score"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col(id_col), "label", F.round("score", 6).alias("score"))
    )


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.45,
    max_top_token_frac: float = 0.12,
    max_dup_bigram_frac: float = 0.1,
) -> DataFrame:
    """The composed C4/Gopher-style keep decision: a document survives
    iff its heuristic quality score clears ``min_quality`` AND neither
    repetition signal flags it as boilerplate. This is the form the
    rules ship in real corpus pipelines — individual stats are
    diagnostics, the conjunction is the filter.

    Plan: ``document_stats`` is one narrow projection,
    ``repetition_stats`` two agg trees; both sides end hash-partitioned
    by ``id_col`` so the join adds no extra exchange beyond theirs.
    Returns the kept (id, quality, lang_guess, top_token_frac,
    dup_bigram_frac) — join back to ``docs`` for the payload.
    """
    from decision_tree_stuff_spark.operators import pushdown_fence

    # fence the projection side: without it the quality conjunct
    # inlines through document_stats' projection and below its spread
    # exchange, re-running tokenization serially in the single-split
    # scan task (see operators.pushdown_fence). The repetition
    # conjuncts are agg-bounded and still prune the join side.
    ds = pushdown_fence(
        document_stats(docs, id_col, text_col).select(
            id_col, "quality", "lang_guess"
        )
    )
    rs = repetition_stats(docs, id_col, text_col).select(
        id_col, "top_token_frac", "dup_bigram_frac"
    )
    return (
        ds.join(rs, id_col)
        .where(
            (F.col("quality") >= min_quality)
            & (F.col("top_token_frac") <= max_top_token_frac)
            & (F.col("dup_bigram_frac") <= max_dup_bigram_frac)
        )
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021
    §A1.1 use line/ngram repetition to drop boilerplate docs; our
    corpus has no line structure, so the granularity is tokens and
    token bigrams).

    Per document:
      * n_tokens
      * top_token_frac   — occurrences of the most frequent token / n
      * dup_token_frac   — fraction of tokens whose token-type occurs
                           more than once
      * dup_bigram_frac  — same over adjacent-token bigrams (0.0 for
                           single-token docs)

    Plan: one narrow projection (normalize once), bigrams built with an
    index lambda over the token array (shuffle-free, no self-join, no
    per-doc window sort), then two map-side-combinable groupBy trees —
    (doc, gram) → doc — joined on doc id. Shuffle keys are (doc_id,
    gram): high-cardinality, unskewed, linear in corpus size. All
    fractions rounded to 6dp for oracle-stable doubles.
    """
    toks_arr = tokens_from_norm(normalize_text(F.col(text_col)))
    base = docs.select(
        F.col(id_col),
        F.filter(toks_arr, lambda x: x != "").alias("__toks"),
    )
    bigrams = F.expr(
        "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
        " (x, i) -> concat(x, ' ', element_at(__toks, i + 2)))"
    )

    def _dup_stats(grams: DataFrame, n_name: str, top_name: str, dup_name: str):
        counts = grams.groupBy(id_col, "gram").agg(
            F.count(F.lit(1)).alias("c")
        )
        return counts.groupBy(id_col).agg(
            F.sum("c").alias(n_name),
            F.max("c").alias(top_name),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).alias(dup_name),
        )

    tok_stats = _dup_stats(
        base.select(F.col(id_col), F.explode("__toks").alias("gram")),
        "__n", "__top", "__dup",
    )
    bg_stats = _dup_stats(
        base.select(F.col(id_col), F.explode(bigrams).alias("gram")),
        "__bn", "__btop", "__bdup",
    )
    return (
        tok_stats.join(bg_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__n").alias("n_tokens"),
            F.round(F.col("__top") / F.col("__n"), 6).alias("top_token_frac"),
            F.round(F.col("__dup") / F.col("__n"), 6).alias("dup_token_frac"),
            F.round(
                F.coalesce(F.col("__bdup") / F.col("__bn"), F.lit(0.0)), 6
            ).alias("dup_bigram_frac"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    score_col: str = "mean_logprob",
    low_q: float = 1 / 3,
    high_q: float = 2 / 3,
    mode: str = "exact",
) -> DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020):
    rank documents by LM score and cut at the ``low_q``/``high_q``
    quantiles — ``head`` = the best-scoring slice (lowest perplexity /
    highest mean log-prob), the slice CCNet trains on first.

    Input is any scored frame (compose with ``unigram_logprob`` /
    ``bigram_logprob`` / ``stupid_backoff_logprob``). Thresholds are a
    1-row aggregate broadcast back into the plan (no action, no driver
    collect); ``mode='exact'`` is the interpolated percentile both
    engines share, ``mode='approx'`` the GK-sketch 100 TB path (the
    same split as ``filter_by_quantile``). Scores and thresholds are
    rounded to 6 dp before comparison; null scores (token-less docs)
    get a null bucket.
    """
    if mode == "exact":
        pct = F.percentile
    elif mode == "approx":
        def pct(c, q):
            return F.percentile_approx(c, q, F.lit(10000))
    else:
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    thr = scored.agg(
        F.round(pct(F.col(score_col), F.lit(low_q)), 6).alias("__t_low"),
        F.round(pct(F.col(score_col), F.lit(high_q)), 6).alias("__t_high"),
    )
    r = F.round(F.col(score_col), 6)
    bucket = (
        F.when(r.isNull(), F.lit(None).cast("string"))
        .when(r >= F.col("__t_high"), F.lit("head"))
        .when(r >= F.col("__t_low"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        *scored.columns, bucket.alias("bucket")
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """C4-style blocklist gating (Raffel et al. 2020 drop any page
    containing a "List of Dirty, Naughty …" word; RefinedWeb applies
    the same shape via URL word lists): per-document occurrence count
    of blocklisted tokens and the keep decision (``n_flagged <=
    max_hits``; C4's policy is the default 0 — one hit drops the
    doc).

    ONE shuffle-free projection: tokens are filtered against the
    blocklist with a chained ``isin`` (scalar literals — deliberately
    NOT ``array_contains(F.lit(list), ...)``, whose CreateArray the
    interpreted HOF path re-evaluates per element; see the Bloom-probe
    lesson, decontam.py). At 100 TB the cost is the scan. Blocklists
    big enough to stop being literals (UT1 is ~4M URLs) should switch
    to the broadcast-anti-join shape of ``decontamination`` instead —
    this operator is the published small-list projection.

    Returns (id, n_tokens, n_flagged, keep) with null text yielding
    null counts and keep=false.
    """
    assert blocklist, "empty blocklist"
    bl = sorted({w.lower() for w in blocklist})
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    flagged = F.filter(toks, lambda t: t.isin(*bl))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(flagged).alias("n_flagged"),
        F.coalesce(
            F.size(flagged) <= F.lit(int(max_hits)), F.lit(False)
        ).alias("keep"),
    ).select(
        id_col,
        F.when(F.col("n_tokens") >= 0, F.col("n_tokens"))
        .cast("int")
        .alias("n_tokens"),
        F.when(F.col("n_flagged") >= 0, F.col("n_flagged"))
        .cast("int")
        .alias("n_flagged"),
        "keep",
    )


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    max_ellipsis_line_frac: float = 0.3,
    max_bullet_line_frac: float = 0.9,
) -> DataFrame:
    """The full Gopher rule battery (Rae et al. 2021, §A1.1) as ONE
    narrow projection — per-document rule booleans plus the composed
    ``keep`` conjunction, so a pipeline can either filter on ``keep``
    or diagnose which rule fired.

    Rules (defaults are the paper's, except min_words relaxed for the
    short synthetic corpus):
      * word count in [min_words, max_words]
      * mean word length in [min_mean_word_len, max_mean_word_len]
      * '#'-or-'...' symbol-to-word ratio <= max_symbol_word_ratio
      * fraction of words containing a letter >= min_alpha_word_frac
      * >= min_stop_hits stopword occurrences
      * fraction of lines ending in '...' <= max_ellipsis_line_frac,
        lines starting with a bullet ('-'/'*') <= max_bullet_line_frac

    All counters are built-in string/array expressions over ONE
    projected normalization — at 100 TB this costs exactly one scan,
    no shuffle, no UDF. Occurrence counts use the
    length-minus-replaced-length identity (exact, codegen-friendly).
    Null text yields null stats and keep=false (distinguishable from
    empty, which fails min_words). Ratios rounded to 6 dp for
    oracle-stable doubles.
    """
    raw = F.col("__raw")
    base = docs.select(
        F.col(id_col),
        F.col(text_col).alias("__raw"),
        F.filter(
            tokens_from_norm(normalize_text(F.col(text_col))),
            lambda t: t != "",
        ).alias("__toks"),
    )
    n_words = F.size("__toks")
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.length(F.array_join("__toks", "")) / nw
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(raw) - F.length(F.replace(raw, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis) / nw
    alpha_frac = (
        F.size(F.filter(F.col("__toks"), lambda t: t.rlike("[a-z]"))) / nw
    )
    stops = stop_hits(F.col("__toks"), QUALITY_STOPWORDS)
    lines = F.filter(
        F.transform(F.split(raw, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.endswith("..."))
    ) / nl
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("-") | l.startswith("*"),
        )
    ) / nl
    stats = base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stops.alias("stop_hits"),
        F.round(ellipsis_lines, 6).alias("ellipsis_line_frac"),
        F.round(bullet_lines, 6).alias("bullet_line_frac"),
    )
    r_words = F.col("n_words").between(min_words, max_words)
    r_mean = F.col("mean_word_len").between(
        min_mean_word_len, max_mean_word_len
    )
    r_symbol = F.col("symbol_word_ratio") <= max_symbol_word_ratio
    r_alpha = F.col("alpha_word_frac") >= min_alpha_word_frac
    r_stops = F.col("stop_hits") >= min_stop_hits
    r_lines = (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac) & (
        F.col("bullet_line_frac") <= max_bullet_line_frac
    )
    return stats.select(
        "*",
        r_words.alias("r_word_count"),
        r_mean.alias("r_mean_word_len"),
        r_symbol.alias("r_symbol_ratio"),
        r_alpha.alias("r_alpha_words"),
        r_stops.alias("r_stopwords"),
        r_lines.alias("r_line_shape"),
        F.coalesce(
            r_words & r_mean & r_symbol & r_alpha & r_stops & r_lines,
            F.lit(False),
        ).alias("keep"),
    )


def top_tokens(
    docs: DataFrame,
    k: int = 20,
    group_col: str = "lang",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Vocabulary builder: the k most frequent tokens per group with
    counts and corpus share — the seed of a tokenizer vocab or a
    stopword list.

    Plan: one exploded count aggregate (map-side combined — shuffle
    carries distinct (group, token) pairs, not token instances), then
    a rank window whose ``row_number() <= k`` Spark rewrites to
    WindowGroupLimit — each group keeps only k rows through the
    window exchange instead of sorting whole groups. Deterministic
    ties: (count desc, token asc). Returns (group, token, n, share,
    rank)."""
    toks = docs.select(
        F.col(group_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    counts = toks.groupBy(group_col, "token").agg(
        F.count(F.lit(1)).alias("n")
    ).where(F.col("n") >= min_count)
    totals = toks.groupBy(group_col).agg(F.count(F.lit(1)).alias("_total"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .join(F.broadcast(totals), group_col)
        .select(
            group_col,
            "token",
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("share"),
            "rank",
        )
    )


def chi2_features(
    docs: DataFrame,
    label_col: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """χ² feature selection (Yang & Pedersen 1997 — the classic
    companion to the NB/LR text-gate family: pick the k tokens most
    associated with each label before training): per observed
    (label, token) pair the document-presence contingency table

        A = docs of label containing token   B = other docs containing
        C = docs of label without token      D = the rest

    scored ``χ² = N(AD-BC)² / ((A+B)(C+D)(A+C)(B+D))``, top-k per
    label on (χ² desc, token asc).

    Every contingency cell derives from integer aggregates small
    enough that the double arithmetic is EXACT (products < 2^53 at
    any per-label corpus below ~2M docs; beyond that both engines
    round identically because the expression shape is shared) — no
    6dp tolerance needed in the twin, only a display round.

    Plan: one distinct (doc, label, token) explode (presence, not
    occurrences) → one (label, token) count aggregate; token and
    label marginals come from that same table plus one corpus-sized
    label count; N rides as a broadcast 1-row frame. The rank window
    rewrites to WindowGroupLimit (k rows per label cross the
    exchange). Returns (label, token, chi2, rank).
    """
    pres = docs.select(
        F.col(label_col).alias("label"),
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    ).where(F.col("token") != "")
    a = pres.groupBy("label", "token").agg(
        F.count(F.lit(1)).cast("double").alias("A")
    )
    tok_tot = a.groupBy("token").agg(F.sum("A").alias("T"))
    lab_tot = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("double").alias("L")
    )
    n_total = docs.agg(F.count(F.lit(1)).cast("double").alias("N"))
    cells = (
        a.join(tok_tot, "token")
        .join(F.broadcast(lab_tot), "label")
        .crossJoin(F.broadcast(n_total))
        .select(
            "label",
            "token",
            "A",
            (F.col("T") - F.col("A")).alias("B"),
            (F.col("L") - F.col("A")).alias("C"),
            (F.col("N") - F.col("T") - F.col("L") + F.col("A")).alias("D"),
            "N",
        )
        # a token present in EVERY doc (T=N) or a label covering the
        # whole corpus (L=N) zeroes a marginal — division by zero and
        # zero information; excluded, matching standard CHI practice
        .where((F.col("A") + F.col("B") < F.col("N")) &
               (F.col("A") + F.col("C") < F.col("N")))
    )
    chi2 = (
        F.col("N")
        * F.pow(F.col("A") * F.col("D") - F.col("B") * F.col("C"), 2)
        / (
            (F.col("A") + F.col("B"))
            * (F.col("C") + F.col("D"))
            * (F.col("A") + F.col("C"))
            * (F.col("B") + F.col("D"))
        )
    )
    w = Window.partitionBy("label").orderBy(
        chi2.desc(), F.col("token").asc()
    )
    return (
        cells.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "label",
            "token",
            F.round(chi2, 6).alias("chi2"),
            "rank",
        )
    )


#: approx-mode quartile grid (corpus_profile): doc lengths in chars,
#: one 8-char cell of value error, 514 bucket rows per group max
PROFILE_HIST_LO, PROFILE_HIST_HI, PROFILE_HIST_N = 0.0, 4096.0, 512


def corpus_profile(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    approximate: bool = False,
    rsd: float = 0.02,
    hist_lo: float = PROFILE_HIST_LO,
    hist_hi: float = PROFILE_HIST_HI,
    hist_n: int = PROFILE_HIST_N,
    hist_auto: bool = False,
) -> DataFrame:
    """Per-group corpus profile: doc count, token volume, vocabulary
    size, and length quartiles — the dataset card a pipeline publishes
    after each processing stage.

    Two modes with identical schema:

    * ``approximate=False`` (default; the DuckDB-oracled gate):
      exact ``count_distinct`` over (group, token) and exact
      ``percentile`` quartiles. Exact distinct-token counting shuffles
      every distinct (group, token) pair and exact percentiles
      materialize each group's lengths in one task's memory — fine at
      bench scale, the wrong plan at 100 TB.
    * ``approximate=True`` (the 100 TB path): the engine's own
      HyperLogLog (``sketch.hll_registers`` + ``hll_estimate``, r11 —
      previously the engine-internal ``approx_count_distinct``) —
      register shuffle bounded at 2^b rows per group REGARDLESS of
      corpus size, map-side max-merged, NO distinct shuffle — and,
      since late r11, the engine's own fixed-grid histogram quantiles
      (``sketch.hist_buckets`` + ``hist_quantiles``, grid
      [hist_lo, hist_hi) with hist_n cells — defaults [0, 4096)/512,
      width 8 — previously the engine-internal GK
      ``approx_percentile``): ≤ hist_n + 2 bucket rows per group
      cross the wire and the value error is bounded by one grid cell
      FOR IN-RANGE LENGTHS ONLY. Lengths beyond the grid land in the
      overflow bucket, whose quantile estimate CLAMPS to ``hist_hi``
      (underflow clamps to ``hist_lo``) — a corpus whose docs exceed
      ``hist_hi`` chars gets p25/p50/p75 pinned at the grid edge with
      unbounded error, so either widen the grid via
      ``hist_lo/hist_hi/hist_n`` or pass ``hist_auto=True`` (r12):
      one exact global min/max pre-aggregate sets the grid
      (``sketch.hist_buckets_auto``), restoring the one-cell bound
      for ALL data at the cost of one extra cheap pass. ``rsd``
      maps to the register count via the standard 1.04/√m error
      model (rsd=0.02 → b=12). EVERY approx-mode column is
      VALUE-oracle-able (bit-reproducible integer/double arithmetic —
      the ``e4_corpus_profile_approx`` EXTRA row checks the distinct
      estimate AND the interpolated quartiles exactly against
      DuckDB), with accuracy additionally bound-tested against the
      exact mode in tests/test_textstats_profile.py.

    Output: (group_col, n_docs, n_tokens, n_distinct_tokens,
    len_p25/p50/p75) — bigints + doubles, deterministic in exact mode.
    """
    toks = docs.select(
        F.col(group_col), F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    if approximate:
        import math

        from decision_tree_stuff_spark.operators.sketch import (
            hll_estimate,
            hll_registers,
        )

        b = max(4, min(16, math.ceil(math.log2((1.04 / rsd) ** 2))))
        dist = hll_estimate(
            hll_registers(toks, key_col="token", group_cols=[group_col], b=b),
            group_cols=[group_col],
            b=b,
        ).select(
            group_col,
            F.round(F.col("est")).cast("bigint").alias(
                "n_distinct_tokens"
            ),
        )
        tok_stats = (
            toks.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"))
            .join(dist, group_col, "left")
        )
    else:
        tok_stats = toks.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct(F.col("token")).alias("n_distinct_tokens"),
        )
    # n_docs counts EVERY doc in the group (a dataset card must not
    # silently exclude empty/null-text docs); token stats left-join in
    # with zero defaults for all-empty groups
    per_group = (
        docs.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(tok_stats, group_col, "left")
        .select(
            group_col,
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_distinct_tokens", F.lit(0)).alias(
                "n_distinct_tokens"
            ),
        )
    )
    lengths = docs.select(
        F.col(group_col), F.length(text_col).cast("double").alias("len")
    )
    if approximate:
        from decision_tree_stuff_spark.operators.sketch import (
            hist_buckets,
            hist_buckets_auto,
            hist_quantiles,
            hist_quantiles_auto,
        )

        if hist_auto:
            hq = hist_quantiles_auto(
                hist_buckets_auto(
                    lengths, "len", [group_col], n_buckets=hist_n
                ),
                (0.25, 0.5, 0.75),
                [group_col],
                n_buckets=hist_n,
            )
        else:
            hq = hist_quantiles(
                hist_buckets(
                    lengths,
                    "len",
                    [group_col],
                    lo=hist_lo,
                    hi=hist_hi,
                    n_buckets=hist_n,
                ),
                (0.25, 0.5, 0.75),
                [group_col],
                lo=hist_lo,
                hi=hist_hi,
                n_buckets=hist_n,
            )
        quart = hq.groupBy(group_col).agg(
            F.max(F.when(F.col("q") == 0.25, F.col("est"))).alias(
                "len_p25"
            ),
            F.max(F.when(F.col("q") == 0.5, F.col("est"))).alias(
                "len_p50"
            ),
            F.max(F.when(F.col("q") == 0.75, F.col("est"))).alias(
                "len_p75"
            ),
        )
    else:
        q = lengths.groupBy(group_col).agg(
            F.percentile("len", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("q")
        )
        quart = q.select(
            group_col,
            F.col("q").getItem(0).alias("len_p25"),
            F.col("q").getItem(1).alias("len_p50"),
            F.col("q").getItem(2).alias("len_p75"),
        )
    return per_group.join(quart, group_col).select(
        group_col,
        "n_docs",
        "n_tokens",
        "n_distinct_tokens",
        "len_p25",
        "len_p50",
        "len_p75",
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    stride: int = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split every document into token-window chunks of
    ``chunk_tokens`` with step ``stride`` (default = chunk_tokens →
    non-overlapping; stride < chunk_tokens → sliding overlap) — the
    context-window prep op dual to ``sampling.pack_sequences`` (that
    CONCATENATES short docs into fixed windows; this SPLITS long ones).

    Chunks start at token 1, 1+stride, … while the start lies within
    the document, so every non-empty doc yields ≥1 chunk and the last
    chunk may be short; token-less docs yield none. Pure projection +
    explode — shuffle-free, one scan at any SF; the token array is
    bound once (no per-chunk re-tokenization).

    Returns (id_col, chunk_id 0-based, n_tokens, chunk_text).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    tokd = docs.select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("_ctoks"),
    )
    t = F.col("_ctoks")
    starts = F.when(
        F.size(t) > 0, F.sequence(F.lit(1), F.size(t), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    pieces = F.transform(starts, lambda s: F.slice(t, s, chunk_tokens))
    return tokd.select(
        F.col(id_col), F.posexplode(pieces).alias("chunk_id", "_piece")
    ).select(
        F.col(id_col),
        "chunk_id",
        F.size("_piece").alias("n_tokens"),
        F.concat_ws(" ", "_piece").alias("chunk_text"),
    )


def scrub_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns=None,
) -> DataFrame:
    """PII scrubbing pass: replace email/IPv4/SSN-shaped spans with
    typed placeholders and count what was found per category — the
    pre-release redaction stage of a published-corpus pipeline.

    One narrow projection (regexp chain + per-pattern counts), no
    shuffle, no UDF — at 100 TB this costs exactly one scan, and the
    counts aggregate map-side into a release-audit summary.

    Returns (id_col, text_col scrubbed, n_<name> per pattern).
    """
    from decision_tree_stuff_spark.functions.text import (
        PII_PATTERNS,
        pii_counts,
        scrub_pii,
    )

    pats = PII_PATTERNS if patterns is None else patterns
    counts = pii_counts(F.col(text_col), pats)
    return docs.select(
        F.col(id_col),
        scrub_pii(F.col(text_col), pats).alias(text_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
    )


#: query parameters stripped by ``normalize_urls`` — the standard
#: tracking/click-id set every web-corpus URL deduper drops (CCNet /
#: RefinedWeb-style canonicalization; params carry no content
#: identity). Prefix match for utm_*.
URL_TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid")


def normalize_urls(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_www: bool = True,
    tracking_params=URL_TRACKING_PARAMS,
) -> DataFrame:
    """URL canonicalization for web-corpus dedup (r13): the
    normalize-before-group step of URL-level dedup (RefinedWeb §3.1 /
    CCNet run exactly this shape before exact URL dedup — raw crawl
    URLs differ in case, default ports, tracking params and fragment
    while naming the same resource).

    Canonical form, all in ONE shuffle-free projection of portable
    primitives (regexp_extract / split / filter / array_sort — the
    DuckDB twin mirrors each step 1:1):

    * scheme and host lowercased (path/query case is significant and
      kept);
    * ``www.`` host prefix dropped when ``strip_www``;
    * default ports removed (``:80`` for http, ``:443`` for https);
    * fragment dropped (never sent to the server);
    * tracking query params dropped (``utm_*`` prefix + the click-id
      set), remaining params SORTED so param order can't split a
      group, and ``?`` dropped when nothing survives.

    Non-URL strings (no ``scheme://``) canonicalize to NULL — the
    caller's signal to fall back to exact-text dedup. Returns
    ``(id_col, url_col, url_canonical)``.
    """
    u = F.trim(F.col(url_col))
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    if strip_www:
        hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    # path + query with the fragment dropped (everything from '#' on)
    tail = F.substring_index(
        F.regexp_replace(rest, r"^[^/?#]*", ""), "#", 1
    )
    path = F.substring_index(tail, "?", 1)
    query = F.when(
        tail.contains("?"),
        tail.substr(F.length(path) + 2, F.length(tail)),
    )

    def keep_param(x):
        dropped = F.lit(False)
        for tp in tracking_params:
            if tp.endswith("_"):
                dropped = dropped | x.startswith(tp)
            else:
                dropped = dropped | x.startswith(tp + "=") | (x == tp)
        return ~dropped

    params = F.array_sort(
        F.filter(
            F.when(
                query.isNotNull() & (query != ""), F.split(query, "&")
            ).otherwise(F.array().cast("array<string>")),
            keep_param,
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canonical = F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), hostport, path, qpart),
    )
    return docs.select(
        F.col(id_col),
        F.col(url_col),
        canonical.alias("url_canonical"),
    )
