"""Text analysis & quality gates (E-4): stats, TF-IDF, LM ladder, NB/LR, BPE, Gopher, BM25/RRF, CMS, heavy hitters, retrieval pipeline.

Split out of the monolithic queries.py (r9); function and
oracle text moved verbatim — see queries/__init__.py for
the registry.
"""

from __future__ import annotations

from decision_tree_stuff_spark.operators.sketch import hist_auto_grouped_sql, hist_auto_sql, hist_rebucket_sql, hist_sql, hll_sql, kmv_sql_pairwise, kmv_sql_set_estimates
from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    BM25_B,
    BM25_K,
    BM25_K1,
    BM25_QUERIES,
    BPE_MERGES,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    CMS_WATCHLIST,
    DECON_N,
    DECON_THRESHOLD,
    F,
    HYBRID_K,
    HYBRID_PROBES,
    LR_BUCKETS,
    LR_ITERS,
    LR_RATE,
    QUALITY_STOPWORDS,
    TOKS_SQL,
    _BM25_VALUES_SQL,
    _CMS_D,
    _CMS_W,
    _DOCSTATS_PR,
    _DOCSTATS_SR,
    _LANG_CASE,
    _LN_BACKOFF,
    _bpe_encode_sql,
    _bpe_merges_sql,
    _unigram_encode_sql,
    _unigram_lm_sql,
    _cms_sql_cells,
    _cos_sql,
    _docs,
    _emb,
    _lr_cte_sql,
    _sqllist,
    cosine_topk,
    document_stats,
    tf_idf,
)



def q_e4_quantile_filter(spark, sf_dir):
    """Quantile-threshold selection: docs at or above the exact 0.9
    length quantile (the 'train on the top decile' selection, with the
    threshold computed inside the plan)."""
    from decision_tree_stuff_spark.operators.sampling import (
        filter_by_quantile,
    )

    return filter_by_quantile(
        _docs(spark, sf_dir).select("doc_id", "n_chars"), "n_chars", 0.9
    )


def q_e4_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-k retrieval (r7): the lexical probe-query miner
    (and RAG baseline) — score = sum over query terms of
    idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), Lucene idf. Document
    length rides the occurrence rows (projected before the explode),
    so the corpus side costs one shuffle; the query side broadcasts."""
    from decision_tree_stuff_spark.operators.retrieval import bm25_topk

    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    return bm25_topk(
        _docs(spark, sf_dir), q, k=BM25_K, k1=BM25_K1, b=BM25_B
    )



def q_e4_heavy_hitters(spark, sf_dir):
    """Exact two-pass heavy hitters (r7, Misra–Gries '82): tokens
    with corpus share > 2% (k=49 counters/partition → φ=1/50) — the
    frequent-keys enumerator whose shuffle stays partitions×k however
    large the vocabulary. Candidates vary with partitioning; the
    exact-recount output doesn't, so the plain HAVING twin matches
    exactly."""
    from decision_tree_stuff_spark.functions.text import tokens as _toks
    from decision_tree_stuff_spark.operators import spread_small
    from decision_tree_stuff_spark.operators.heavy import heavy_hitters

    occ = spread_small(_docs(spark, sf_dir)).select(
        F.explode(
            F.filter(_toks(F.col("text")), lambda t: t != "")
        ).alias("token")
    )
    return heavy_hitters(occ, "token", k=49)


def q_e4_quantile_by_domain(spark, sf_dir):
    """Per-domain quantile floor (r7): every language keeps its docs
    at/above its OWN exact P25 length — the CCNet-style per-domain
    gate a global cutoff gets wrong (it empties weak domains and
    waves strong ones through). Thresholds are one group-sized agg
    broadcast back into the scan."""
    from decision_tree_stuff_spark.operators.sampling import (
        filter_by_quantile_grouped,
    )

    return filter_by_quantile_grouped(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        "n_chars",
        0.25,
        ["lang"],
    )


def q_e4_hybrid_rrf(spark, sf_dir):
    """Hybrid more-like-this retrieval via Reciprocal Rank Fusion
    (r7, Cormack et al. SIGIR'09): for 5 probe documents, fuse the
    BM25 lexical ranking (probe text as the query) with the exact
    embedding-cosine ranking — the standard lexical+dense combiner in
    production RAG. Fusion runs on two already-top-k inputs, so it
    never touches the corpus; scores are 1/(60+rank) sums of exactly
    two fixed-order terms ⇒ engine-exact."""
    from decision_tree_stuff_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from decision_tree_stuff_spark.operators.similarity import cosine_topk

    docs = _docs(spark, sf_dir)
    probes = docs.where(F.col("doc_id").isin(HYBRID_PROBES)).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    # bm25 keeps the lazy default (cache_tf=False measured faster on
    # this standalone row — see bm25_topk docstring); the keepalive is
    # inert then, but keeps the row correct for a caller who flips the
    # knob: the tf cache is released by a weakref on the bm25 wrapper,
    # which the .select() would otherwise drop before execution
    from decision_tree_stuff_spark.utils import keepalive

    lex0 = bm25_topk(docs, probes, k=HYBRID_K, k1=BM25_K1, b=BM25_B)
    lex = lex0.select("query_id", "doc_id", "rank")
    dense = cosine_topk(
        _emb(spark, sf_dir), HYBRID_PROBES, k=HYBRID_K
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return keepalive(rrf_fuse(lex, dense, k=HYBRID_K), lex0)


def q_e4_retrieval_pipeline(spark, sf_dir):
    """End-to-end retrieval pipeline (r8 — the composed-pipeline
    pattern e7b set, per the r7 verdict): probe queries → BM25
    lexical top-k + exact dense top-k → RRF fusion → benchmark
    DECONTAMINATION of the fused results (retrieved docs containing
    ≥ 20 % of any %7==0 benchmark doc's token 3-grams are dropped; a
    benchmark member that retrieves itself is dropped by its own 1.0
    self-containment). One lazy plan exercising retrieval, fusion and
    decontamination together; the oracle composes the identical CTEs.
    The funnel-audit accounting twin lives in
    tests/test_retrieval_pipeline.py (run_with_audit over the same
    stages ≡ independent counts)."""
    from decision_tree_stuff_spark.operators.decontam import (
        ngram_contamination,
    )
    from decision_tree_stuff_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from decision_tree_stuff_spark.operators.similarity import cosine_topk

    docs = _docs(spark, sf_dir)
    probes = docs.where(F.col("doc_id").isin(HYBRID_PROBES)).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    # lex0 kept alive on the returned frame (utils.keepalive): its tf
    # cache would otherwise unpersist when .select() drops the
    # wrapper. cache_tf=True here — the composed-pipeline case is
    # where the A/B measured it a wash-to-win (see bm25_topk
    # docstring); the standalone rows keep the lazy default.
    lex0 = bm25_topk(
        docs, probes, k=HYBRID_K, k1=BM25_K1, b=BM25_B, cache_tf=True
    )
    lex = lex0.select("query_id", "doc_id", "rank")
    dense = cosine_topk(
        _emb(spark, sf_dir), HYBRID_PROBES, k=HYBRID_K
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse(lex, dense, k=HYBRID_K)
    # r14 optimization round (guide §5 caching rule): ``fused`` feeds
    # BOTH the decontam candidate stream and the final anti-join, and
    # without a cache the entire BM25 + dense + RRF upstream executed
    # twice in one plan (14 documents scans total). The fused list is
    # ≤ |probes|·k rows — persist it (MEMORY_AND_DISK, released when
    # the result frame is dropped) so retrieval runs once.
    from pyspark import StorageLevel

    from decision_tree_stuff_spark.utils import unpersist_when_dropped

    fused = fused.persist(StorageLevel.MEMORY_AND_DISK)
    retrieved = docs.join(fused.select("doc_id").distinct(), "doc_id")
    contaminated = (
        ngram_contamination(
            retrieved,
            docs.where("doc_id % 7 = 0"),
            n=DECON_N,
            threshold=DECON_THRESHOLD,
        )
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )
    out = fused.join(contaminated, "doc_id", "left_anti").select(
        "query_id", "doc_id", "rrf_score", "rank"
    )
    from decision_tree_stuff_spark.utils import keepalive

    return keepalive(unpersist_when_dropped(out, fused), lex0)


def q_e4_cms_profile(spark, sf_dir):
    """Count-min sketch cells over every token occurrence (r7): the
    fixed-size frequency summary whose shuffle is d x w cells however
    large the corpus — the streaming/100 TB complement to the exact
    top_tokens groupBy."""
    from decision_tree_stuff_spark.operators import spread_small
    from decision_tree_stuff_spark.operators.sketch import cms_cells
    from decision_tree_stuff_spark.functions.text import tokens as _tokens

    # tokenize+explode dominates; spread the single-split bench input
    # (guarded no-op at real scale — measured FASTER at 10x the data
    # than at sf0.1 before this, on both engines, because one parquet
    # split serialized the scan)
    toks = spread_small(_docs(spark, sf_dir)).select(
        F.explode(
            F.filter(_tokens(F.col("text")), lambda t: t != "")
        ).alias("token")
    )
    return cms_cells(toks)


def q_e4_cms_watchlist(spark, sf_dir):
    """Point estimates for a literal hot-key watchlist read off the
    sketch: est = min over rows of the probed cells (absent cell = 0);
    one-sided error (est >= true) by construction."""
    from decision_tree_stuff_spark.operators import spread_small
    from decision_tree_stuff_spark.operators.sketch import (
        cms_cells,
        cms_estimate,
    )
    from decision_tree_stuff_spark.functions.text import tokens as _tokens

    toks = spread_small(_docs(spark, sf_dir)).select(
        F.explode(
            F.filter(_tokens(F.col("text")), lambda t: t != "")
        ).alias("token")
    )
    return cms_estimate(cms_cells(toks), CMS_WATCHLIST)


def q_e4_lr_langid(spark, sf_dir):
    """Logistic-regression language gate (r7): the learned-weights
    member of the fastText-style classifier family (NB is the
    counts-only member). Full-batch GD, fixed 4 iterations, 6 dp
    rounding contract on z/σ/weights — the same determinism recipe as
    the k-means twin, so the unrolled-CTE oracle matches exactly.
    Trains on even ids (label: lang='en'), scores the odd half."""
    from decision_tree_stuff_spark.operators.classifier import (
        lr_classify,
        lr_fit,
    )

    docs = _docs(spark, sf_dir)
    train = docs.where("doc_id % 2 = 0").withColumn(
        "is_en", (F.col("lang") == "en").cast("int")
    )
    w = lr_fit(
        train, "is_en", n_buckets=LR_BUCKETS, iters=LR_ITERS, lr=LR_RATE
    )
    return lr_classify(docs.where("doc_id % 2 = 1"), w)


def q_e4_lr_langid_joined(spark, sf_dir):
    """The JOINED LR path (r10, r9 verdict task 7): identical program
    to ``q_e4_lr_langid`` but forced through ``_lr_fit_joined`` and
    the broadcast-weight-table classify with ``dense_max_buckets=0``
    — the code path a 100 TB run with a large feature space takes.
    The dense≡joined regression test (tests/test_classifier.py) pins
    self-consistency; this row gives the joined path its own DuckDB
    VALUE check every session (same oracle as the dense twin: the
    paths claim bit-identical trajectories)."""
    from decision_tree_stuff_spark.operators.classifier import (
        lr_classify,
        lr_fit,
    )

    docs = _docs(spark, sf_dir)
    train = docs.where("doc_id % 2 = 0").withColumn(
        "is_en", (F.col("lang") == "en").cast("int")
    )
    w = lr_fit(
        train, "is_en", n_buckets=LR_BUCKETS, iters=LR_ITERS,
        lr=LR_RATE, dense_max_buckets=0,
    )
    return lr_classify(
        docs.where("doc_id % 2 = 1"), w, dense_max_buckets=0
    )


def q_e4_bpe_merges(spark, sf_dir):
    """BPE tokenizer training (r7, Sennrich et al. 2016): 12 merges
    learned on the word-type table — one corpus shuffle builds the
    types, then every iteration is a vocab-sized pair count + 1-row
    argmax. Integer counts + lexicographic ties = bit-deterministic,
    so the DuckDB twin unrolls the same iterations as CTEs."""
    from decision_tree_stuff_spark.operators.bpe import (
        bpe_merge_table,
        bpe_train,
    )

    merges = bpe_train(_docs(spark, sf_dir), n_merges=BPE_MERGES)
    return bpe_merge_table(spark, merges)


def q_e4_wordpiece_merges(spark, sf_dir):
    """WordPiece tokenizer training (r7, Schuster & Nakajima 2012 —
    the BERT criterion): same merge machinery as BPE but the argmax is
    count(a,b)/(count(a)·count(b)); the ratio is exact double division
    of integer counts, so the unrolled CTE twin's argmax walks the
    identical doubles."""
    from decision_tree_stuff_spark.operators.bpe import (
        bpe_merge_table,
        bpe_train,
    )

    merges = bpe_train(
        _docs(spark, sf_dir), n_merges=BPE_MERGES, score="likelihood"
    )
    return bpe_merge_table(spark, merges)


def q_e4_unigram_lm(spark, sf_dir):
    """Unigram-LM tokenizer training (r11, Kudo 2018 — the
    SentencePiece trainer, completing the BPE/WordPiece/Unigram
    triple): seed vocabulary from substring frequencies, 2 soft-EM
    rounds of exact forward-backward over the word-type lattice, keep
    the 40 highest-expected-count pieces. Bit-deterministic by
    arithmetic (fixed IEEE fold orders; micro-unit integer expected
    counts), so the unrolled CTE twin matches every count exactly."""
    from decision_tree_stuff_spark.operators.bpe import (
        unigram_lm_train,
        unigram_table,
    )

    pieces = unigram_lm_train(
        _docs(spark, sf_dir),
        vocab_size=40,
        seed_size=60,
        max_piece_len=3,
        max_word_len=8,
        em_iters=2,
    )
    return unigram_table(spark, pieces)


def q_e4_unigram_encode(spark, sf_dir):
    """Unigram-LM Viterbi encode (r11 — the SentencePiece APPLY step,
    completing the trainer triple's apply path next to
    ``e4_bpe_encode``): train the 40-piece model, then segment every
    document by the max-probability DP in one shuffle-free projection.
    The oracle is an EXHAUSTIVE twin — it rescores every possible
    segmentation (176 composition branches) and picks the max with
    the same tie rule, so a match proves the DP's argmax, not just
    the arithmetic."""
    from decision_tree_stuff_spark.operators.bpe import (
        unigram_encode,
        unigram_lm_train,
    )

    docs = _docs(spark, sf_dir)
    pieces = unigram_lm_train(
        docs,
        vocab_size=40,
        seed_size=60,
        max_piece_len=3,
        max_word_len=8,
        em_iters=2,
    )
    # distinct_types: the r12 A/B's winning mode (3.9x at sf0.1, 2x at
    # sf10p — SCALING_r12.md §3). r13 discovered the r12 commit that
    # claimed this switch only landed the BPE comment: the row had
    # silently stayed per-occurrence (caught by the bench split's
    # encode-only timing). Output identical in both modes
    # (differential tests + the exhaustive-enumeration oracle).
    return unigram_encode(docs, pieces, distinct_types=True)


def q_e4_bpe_encode(spark, sf_dir):
    """BPE encoding (r7): the 12 learned merges applied to every
    document as a chain of literal replaces over the double-spaced
    guard representation — ONE shuffle-free projection; real subword
    token counts (vs the e4 regex BPE-ish approximation)."""
    from decision_tree_stuff_spark.operators.bpe import bpe_encode, bpe_train

    docs = _docs(spark, sf_dir)
    merges = bpe_train(docs, n_merges=BPE_MERGES)
    # per-occurrence stays the registry mode for BPE: the replace
    # chain is cheap enough that the distinct-types join/regroup
    # overhead outweighs the saved work at every measured scale
    # (SCALING_r12.md §3); distinct_types remains the knob for
    # heavier merge lists
    return bpe_encode(docs, merges)


def q_e4_lm_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity split (r7): unigram LM scores
    cut at the 1/3 and 2/3 exact quantiles — thresholds stay in the
    plan as a broadcast 1-row aggregate. 'head' is the slice CCNet
    trains on first."""
    from decision_tree_stuff_spark.operators.textstats import (
        perplexity_buckets,
        unigram_logprob,
    )

    return perplexity_buckets(unigram_logprob(_docs(spark, sf_dir)))


def q_e4_gopher_rules(spark, sf_dir):
    """The full Gopher rule battery (r7, Rae et al. 2021 §A1.1): one
    narrow projection emitting per-rule booleans + the composed keep —
    word-count/mean-length bounds, symbol ratio, alpha-word fraction,
    stopword floor, line-shape caps. min_words=5 / min_stop_hits=2
    actually discriminate on this corpus (short docs and stopword-free
    docs fail)."""
    from decision_tree_stuff_spark.operators.textstats import gopher_rules

    return gopher_rules(_docs(spark, sf_dir), min_words=15)


def q_e4_document_stats(spark, sf_dir):
    return document_stats(_docs(spark, sf_dir))


def q_e4_tf_idf(spark, sf_dir):
    return tf_idf(_docs(spark, sf_dir))


def q_e4_quality_filter(spark, sf_dir):
    """The composed corpus filter: quality ≥ 0.45 AND not repetitive
    (C4/Gopher-style conjunction of the e4 diagnostics)."""
    from decision_tree_stuff_spark.operators.textstats import quality_filter

    return quality_filter(_docs(spark, sf_dir))


def q_e4_repetition_stats(spark, sf_dir):
    from decision_tree_stuff_spark.operators.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def q_e4_lm_quality(spark, sf_dir):
    """Unigram-LM quality scores (r6, CCNet-style): mean per-token
    ln-probability under the corpus's own unigram model."""
    from decision_tree_stuff_spark.operators.textstats import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


def q_e4_lm_bigram(spark, sf_dir):
    """Bigram-LM quality scores (r6): mean conditional ln P(w2|w1)
    under the corpus's own bigram model."""
    from decision_tree_stuff_spark.operators.textstats import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir))


def q_e4_lm_backoff(spark, sf_dir):
    """Stupid Backoff trigram scores (r7, Brants et al. EMNLP'07): the
    model trains on the even-id half of the corpus and scores the odd
    half — the production train-offline/score-on-ingest split, and the
    configuration where every backoff order AND the OOV floor actually
    fire (a self-scored corpus would hit order-3 on every trigram)."""
    from decision_tree_stuff_spark.operators.textstats import (
        stupid_backoff_logprob,
        stupid_backoff_model,
    )

    docs = _docs(spark, sf_dir)
    model = stupid_backoff_model(docs.where(F.col("doc_id") % 2 == 0))
    return stupid_backoff_logprob(
        docs.where(F.col("doc_id") % 2 == 1), model=model
    )


def q_e4_chi2_features(spark, sf_dir):
    """χ² feature selection (r7, Yang & Pedersen 1997): top-10
    label-associated tokens per lang from document-presence
    contingency tables — the feature-selection step ahead of the
    NB/LR text gates. Integer-exact double algebra; WindowGroupLimit
    rank."""
    from decision_tree_stuff_spark.operators.textstats import (
        chi2_features,
    )

    return chi2_features(_docs(spark, sf_dir), "lang", k=10)


def q_e4_blocklist(spark, sf_dir):
    """C4-style blocklist gate (r7, Raffel et al. 2020): per-doc
    blocklisted-token occurrence count + keep decision as one
    shuffle-free projection; the list uses words the synthetic corpus
    actually contains so both outcomes fire."""
    from decision_tree_stuff_spark.operators.textstats import (
        blocklist_filter,
    )

    return blocklist_filter(
        _docs(spark, sf_dir), ["spark", "dup", "merge"]
    )


def q_e4_lm_kn(spark, sf_dir):
    """Interpolated Kneser–Ney bigram scores (r7, Kneser & Ney '95 /
    Chen & Goodman '99): trains on the even-id half, scores the odd
    half — the split where the unseen-bigram interpolation path and
    the OOV floor genuinely fire alongside seen-bigram discounting."""
    from decision_tree_stuff_spark.operators.textstats import (
        kneser_ney_logprob,
        kneser_ney_model,
    )

    docs = _docs(spark, sf_dir)
    model = kneser_ney_model(docs.where(F.col("doc_id") % 2 == 0))
    return kneser_ney_logprob(
        docs.where(F.col("doc_id") % 2 == 1), model=model
    )


def q_e4_nb_langid(spark, sf_dir):
    """Naive Bayes language-ID (r7): a multinomial NB classifier
    trained on the even-id half's (text, lang) pairs predicts the
    language of the odd half — the counts-only member of the
    fastText-style classifier family data-curation pipelines use for
    cheap quality/language gating, fully SQL-expressible."""
    from decision_tree_stuff_spark.operators.textstats import (
        nb_classify,
        nb_model,
    )

    docs = _docs(spark, sf_dir)
    tp, lp = nb_model(docs.where(F.col("doc_id") % 2 == 0), "lang")
    return nb_classify(docs.where(F.col("doc_id") % 2 == 1), tp, lp)


def q_e4_top_tokens(spark, sf_dir):
    """Per-lang top-10 vocabulary with corpus share — WindowGroupLimit
    keeps k rows per group through the rank exchange."""
    from decision_tree_stuff_spark.operators.textstats import top_tokens

    return top_tokens(_docs(spark, sf_dir), k=10)


def q_e4_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-token estimate per lang (r10) next to the
    exact count: the ORACLE-EXACT sketch variant —
    ``corpus_profile``'s approximate mode uses Spark's built-in
    ``approx_count_distinct`` (HLL++, engine-internal hashing, only
    tolerance-testable), while ``sketch.hll_registers`` hashes with
    md5 and folds the harmonic-mean denominator in exact BIGINT
    arithmetic, so DuckDB reproduces the estimate bit-for-bit. The
    register shuffle is ≤ 2^b rows per lang regardless of corpus
    size (map-side max), the 100 TB distinct-count shape."""
    from decision_tree_stuff_spark.functions.text import tokens
    from decision_tree_stuff_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    toks = _docs(spark, sf_dir).select(
        "lang",
        F.explode(
            F.filter(tokens(F.col("text")), lambda t: t != "")
        ).alias("token"),
    )
    est = hll_estimate(hll_registers(toks, "token", ["lang"]), ["lang"])
    exact = (
        toks.distinct()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    )
    return est.join(exact, "lang")


def q_e4_kmv_overlap(spark, sf_dir):
    """KMV / theta-sketch corpus-overlap estimate (r11): the SET
    question the HLL row can't answer. Sketch the distinct-token sets
    of two corpus halves (doc_id parity) at k=256, then estimate
    |A∩B|, |A∪B| and Jaccard from the coordinated sample below
    theta = min(theta_a, theta_b). The key space is 3-token SHINGLES
    (the dedup family's unit), whose cardinality is corpus-scale —
    unlike the tiny closed token vocabulary — so both sketches run
    full and the theta estimator (not the under-full exact path) is
    what's value-checked. Each sketch shuffles at most k rows per map
    partition (WindowGroupLimit prunes below the exchange), and the
    overlap join is over two ≤k-row tables — the cost of estimating
    shingle overlap between two 100 TB corpora is two scans and a
    256-row join. Deterministic md5 arithmetic end to end, so the
    estimates themselves value-check vs DuckDB."""
    from decision_tree_stuff_spark.functions.text import tokens
    from decision_tree_stuff_spark.operators.sketch import (
        kmv_set_estimates,
        kmv_sketch,
    )

    t = tokens(F.col("text"))
    sh = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    shingled = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 2).alias("side"),
        F.explode(sh).alias("shingle"),
    )
    sa = kmv_sketch(shingled.where("side = 0"), "shingle")
    sb = kmv_sketch(shingled.where("side = 1"), "shingle")
    return kmv_set_estimates(sa, sb)


def q_e4_hist_quantiles(spark, sf_dir):
    """Histogram-sketch quantiles (r11): per-lang n_chars quartiles +
    p95 from a fixed-grid sketch — the QUANTILE member completing the
    mergeable sketch family (CMS frequency / HLL distinct / KMV set
    ops). Unlike ``percentile_approx`` (GK, engine-internal,
    tolerance-only), the grid is deterministic double arithmetic, so
    the interpolated estimates themselves value-check vs DuckDB; the
    sketch shuffles ≤ n_buckets+2 rows per lang however large the
    corpus."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets,
        hist_quantiles,
    )

    docs = _docs(spark, sf_dir).select("lang", "n_chars")
    b = hist_buckets(
        docs, "n_chars", ["lang"], lo=0.0, hi=1024.0, n_buckets=64
    )
    return hist_quantiles(
        b,
        (0.25, 0.5, 0.75, 0.95),
        ["lang"],
        lo=0.0,
        hi=1024.0,
        n_buckets=64,
    )


def q_e4_hist_quantiles_auto(spark, sf_dir):
    """Auto-range histogram quantiles (r12): the same grid-quantile
    sketch with the [lo, hi] grid set by one exact global min/max
    pre-aggregate instead of a caller guess — the range-free mode the
    r11 verdict ranked the #1 missing piece (real quality-score
    columns have unknown range; a guessed grid clamps out-of-range
    quantiles to the guessed hi). min/max are exact and the grid
    arithmetic is the same deterministic double program, so every
    interpolated estimate still value-checks against DuckDB."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_quantiles_auto,
    )

    docs = _docs(spark, sf_dir).select("lang", "n_chars")
    b = hist_buckets_auto(docs, "n_chars", ["lang"], n_buckets=64)
    return hist_quantiles_auto(
        b, (0.25, 0.5, 0.75, 0.95), ["lang"], n_buckets=64
    )


def q_e4_hist_quantiles_auto_grouped(spark, sf_dir):
    """Per-GROUP auto-range histogram quantiles (r12): each lang
    derives its own [lo, hi] from an exact per-group min/max — the
    variant for groups on different scales, where one global grid
    wastes cells on the widest group. Same deterministic program,
    every estimate value-checks."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto_grouped,
        hist_quantiles_auto,
    )

    docs = _docs(spark, sf_dir).select("lang", "n_chars")
    b = hist_buckets_auto_grouped(docs, "n_chars", ["lang"], n_buckets=64)
    return hist_quantiles_auto(
        b, (0.25, 0.5, 0.75, 0.95), ["lang"], n_buckets=64
    )


def q_e4_hist_quantiles_weighted(spark, sf_dir):
    """WEIGHTED histogram quantiles (r12): per-lang n_chars quartiles
    with each doc weighted by its own n_chars — the storage-weighted
    dataset-card cut ("the median stored character lives in docs of
    length X", vs the doc-weighted median which short docs dominate).
    Integer weights keep every cell and every interpolated estimate
    exact; same bounded shuffle as the unweighted grid."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets,
        hist_quantiles,
    )

    docs = _docs(spark, sf_dir).select("lang", "n_chars")
    b = hist_buckets(
        docs, "n_chars", ["lang"], lo=0.0, hi=1024.0, n_buckets=64,
        weight_col="n_chars",
    )
    return hist_quantiles(
        b, (0.25, 0.5, 0.75), ["lang"], lo=0.0, hi=1024.0, n_buckets=64
    )


def q_e4_hist_quantiles_auto_weighted(spark, sf_dir):
    """WEIGHTED × AUTO-RANGE histogram quantiles (r13 — the flagship
    dataset-card cut the r12 verdict ranked missing gap #2:
    "token-weighted length quantiles over an UNKNOWN range"): the
    grid comes from one exact global min/max pre-aggregate and the
    cells carry Σ n_chars instead of row counts, so the interpolated
    estimates answer "where does the median stored CHARACTER live"
    without a caller-guessed range. Integer weights keep every cell
    and estimate exact; same bounded shuffle."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_quantiles_auto,
    )

    docs = _docs(spark, sf_dir).select("lang", "n_chars")
    b = hist_buckets_auto(
        docs, "n_chars", ["lang"], n_buckets=64, weight_col="n_chars"
    )
    return hist_quantiles_auto(
        b, (0.25, 0.5, 0.75), ["lang"], n_buckets=64
    )


def q_e4_hist_quantiles_auto_grouped_weighted(spark, sf_dir):
    """WEIGHTED × PER-GROUP AUTO-RANGE histogram quantiles (r13):
    each lang derives its own exact [lo, hi] AND walks
    character-weighted mass — the per-language storage-weighted
    length card with no range guess anywhere. Same deterministic
    double program; every estimate value-checks."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto_grouped,
        hist_quantiles_auto,
    )

    docs = _docs(spark, sf_dir).select("lang", "n_chars")
    b = hist_buckets_auto_grouped(
        docs, "n_chars", ["lang"], n_buckets=64, weight_col="n_chars"
    )
    return hist_quantiles_auto(
        b, (0.25, 0.5, 0.75), ["lang"], n_buckets=64
    )


def q_e4_pii_scrub(spark, sf_dir):
    """PII scrubbing + release audit (r13 — the BigScience/ROOTS
    pre-release redaction stage; the operator existed since r5 but
    had no oracle row): deterministic PII spans (an email, an IPv4,
    or an SSN shape, dispatched on doc_id % 3) are PLANTED in-plan —
    the e6 synthesis pattern, so the corpus actually contains what
    the scrubber must find — then ``scrub_documents`` redacts with
    typed placeholders and counts matches per category in ONE
    shuffle-free projection. The DuckDB twin plants identically and
    runs the same regex chain (counts over the original text, chain
    over progressively scrubbed text), so both the redacted strings
    and every audit count value-check."""
    from decision_tree_stuff_spark.operators.textstats import (
        scrub_documents,
    )

    mid = F.col("doc_id")
    extra = (
        F.when(
            mid % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                mid.cast("string"),
                F.lit("@mail.example.com now"),
            ),
        )
        .when(
            mid % 3 == 1,
            F.concat(
                F.lit(" from 10."),
                (mid % 200).cast("string"),
                F.lit(".0.1 logged"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(" ssn "),
                (mid % 900 + 100).cast("string"),
                F.lit("-"),
                (mid % 90 + 10).cast("string"),
                F.lit("-"),
                (mid % 9000 + 1000).cast("string"),
                F.lit(" filed"),
            )
        )
    )
    planted = _docs(spark, sf_dir).select(
        "doc_id", F.concat(F.col("text"), extra).alias("text")
    )
    return scrub_documents(planted)


def q_e4_url_dedup(spark, sf_dir):
    """URL canonicalization + exact URL dedup (r13 — the
    RefinedWeb/CCNet web-pipeline step the repo was missing: crawl
    URLs naming the same resource differ in case, www, default
    ports, tracking params, param order and fragments): messy URLs
    are PLANTED in-plan from doc_id (scheme/host case, www, :80/:443
    vs :8080, utm_*/click-id params in varying order, fragments),
    ``normalize_urls`` canonicalizes in one shuffle-free projection,
    then exact dedup keeps the min doc_id per canonical URL — the
    e1 keep rule. The DuckDB twin mirrors every normalization step
    1:1 (anchored regexes, list_filter/list_sort, split_part), so
    the canonical strings AND the keep flags value-check."""
    from decision_tree_stuff_spark.operators.textstats import (
        normalize_urls,
    )

    mid = F.col("doc_id")
    scheme = F.when(mid % 2 == 0, "HTTP").otherwise("https")
    www = F.when(mid % 3 == 0, "WWW.").otherwise("")
    host = F.concat(F.lit("ExAmple"), (mid % 7).cast("string"), F.lit(".CoM"))
    port = (
        F.when((mid % 4 == 0) & (mid % 2 == 0), ":80")
        .when((mid % 4 == 0), ":443")
        .when(mid % 4 == 1, ":8080")
        .otherwise("")
    )
    path = F.concat(F.lit("/Doc/"), (mid % 20).cast("string"))
    query = (
        F.when(mid % 5 == 0, "?utm_source=feed&b=2&a=1")
        .when(mid % 5 == 1, "?a=1&utm_campaign=x&b=2")
        .when(mid % 5 == 2, "?b=2&a=1")
        .when(mid % 5 == 3, "?utm_medium=z")
        .otherwise("")
    )
    frag = F.when(mid % 6 == 0, "#SeCtion").otherwise("")
    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            scheme, F.lit("://"), www, host, port, path, query, frag
        ).alias("url"),
    )
    normed = normalize_urls(planted)
    keep = normed.groupBy("url_canonical").agg(
        F.min("doc_id").alias("__keep_id")
    )
    return (
        normed.join(keep, "url_canonical")
        .select(
            "doc_id",
            "url_canonical",
            (F.col("doc_id") == F.col("__keep_id")).alias("keep"),
        )
    )


def q_e4_hist_rebucket_merge(spark, sf_dir):
    """CROSS-GRID histogram merge (r13 — the r12 verdict's missing
    gap #3: per-shard auto sketches lived on different grids and
    could not merge): two deterministic doc_id-parity shards each
    build their OWN auto-range sketch (independent bounds passes →
    different grids), ``hist_rebucket`` maps both onto one fixed
    [0, 1024)×64 grid, ``hist_merge`` re-sums, and the fixed-grid
    quantile fold interpolates — the whole shard→rebucket→merge→
    quantile program is deterministic double arithmetic, so every
    estimate value-checks against the DuckDB twin (which replays the
    identical per-shard bounds/midpoint/merge program)."""
    from decision_tree_stuff_spark.operators.sketch import (
        hist_buckets_auto,
        hist_merge,
        hist_quantiles,
        hist_rebucket,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    kw = dict(lo=0.0, hi=1024.0, n_buckets=64)
    shards = [
        docs.where(F.col("doc_id") % 2 == p).select("lang", "n_chars")
        for p in (0, 1)
    ]
    reb = [
        hist_rebucket(
            hist_buckets_auto(s, "n_chars", ["lang"], n_buckets=64),
            group_cols=["lang"],
            src_n_buckets=64,
            **kw,
        )
        for s in shards
    ]
    merged = hist_merge(*reb, group_cols=["lang"])
    return hist_quantiles(merged, (0.25, 0.5, 0.75), ["lang"], **kw)


def q_e4_kmv_matrix(spark, sf_dir):
    """Pairwise corpus-overlap MATRIX (r11): per-lang KMV sketches of
    the 3-gram shingle sets, then theta-sketch |∩|/|∪|/Jaccard for
    every lang pair — the dataset-card "corpus similarity" artifact
    at sketch cost (G·k-row joins after one sketch pass; a pairwise
    EXACT comparison would rescan the corpus per pair). Deterministic
    md5/double arithmetic end to end."""
    from decision_tree_stuff_spark.functions.text import tokens
    from decision_tree_stuff_spark.operators.sketch import (
        kmv_pairwise,
        kmv_sketch,
    )

    t = tokens(F.col("text"))
    sh = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    shingled = _docs(spark, sf_dir).select(
        "lang", F.explode(sh).alias("shingle")
    )
    return kmv_pairwise(
        kmv_sketch(shingled, "shingle", group_cols=["lang"]), "lang"
    )


def q_e4_corpus_profile(spark, sf_dir):
    """Per-lang corpus profile, EXACT mode (the oracled gate; the
    approximate HLL/GK mode is the 100 TB path, tolerance-tested vs
    this in tests/test_textstats_profile.py). Quartiles rounded to
    2 dp — both engines interpolate in double and can differ in the
    last ulp."""
    from decision_tree_stuff_spark.operators.textstats import corpus_profile

    prof = corpus_profile(_docs(spark, sf_dir), group_col="lang")
    return prof.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_distinct_tokens",
        F.round("len_p25", 2).alias("len_p25"),
        F.round("len_p50", 2).alias("len_p50"),
        F.round("len_p75", 2).alias("len_p75"),
    )


def q_e4_corpus_profile_approx(spark, sf_dir):
    """Per-lang corpus profile, APPROX mode (r11, r10 verdict task 7
    completed late-r11): the distinct-token estimate rides the
    engine's own oracle-exact HLL, and the quartiles now ride the
    engine's own fixed-grid histogram sketch instead of the
    engine-internal GK ``approx_percentile`` — so EVERY approx-mode
    column is VALUE-checked against DuckDB, not just bound-tested
    (accuracy bounds still pinned vs exact mode in
    tests/test_textstats_profile.py)."""
    from decision_tree_stuff_spark.operators.textstats import corpus_profile

    return corpus_profile(
        _docs(spark, sf_dir), group_col="lang", approximate=True, rsd=0.02
    )


def q_e4_chunks(spark, sf_dir):
    """Context-window chunking: every document split into 40-token
    windows with stride 30 (10-token overlap) — the splitting dual of
    e8_pack_sequences' concatenation. Shuffle-free projection +
    explode."""
    from decision_tree_stuff_spark.operators.textstats import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), CHUNK_TOKENS, CHUNK_STRIDE
    )

ORACLE_SQL: Dict[str, str] = {
    "e4_quantile_filter": """
WITH t AS (SELECT round(quantile_cont(n_chars, 0.9), 6) AS thr
           FROM documents)
SELECT doc_id, n_chars FROM documents, t
WHERE round(n_chars, 6) >= thr
""",
    # Count-min sketch twins: cells via the shared cms_sql_cells
    # generator (same md5km hashing as the Spark plan); watchlist
    # estimates probe the same grid with min(coalesce(cnt, 0)).
    "e4_cms_profile": _cms_sql_cells(
        f"SELECT unnest(list_filter({TOKS_SQL}, t -> t <> '')) AS key"
        " FROM documents"
    ),
    "e4_cms_watchlist": f"""
WITH cells AS ({_cms_sql_cells(
        f"SELECT unnest(list_filter({TOKS_SQL}, t -> t <> '')) AS key"
        " FROM documents"
    )}),
grid AS (
  SELECT k.key, i.i AS "row",
         (('0x' || substr(md5(k.key), 1, 15))::BIGINT
          + i.i * ('0x' || substr(md5(k.key), 17, 15))::BIGINT)
         % {_CMS_W} AS col
  FROM (SELECT unnest({_sqllist(CMS_WATCHLIST)}) AS key) k,
       (SELECT unnest(range(0, {_CMS_D})) AS i) i
)
SELECT g.key, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
FROM grid g LEFT JOIN cells c ON g."row" = c."row" AND g.col = c.col
GROUP BY 1
""",
    # LR twin: unrolled gradient-descent iterations (see _lr_cte_sql).
    "e4_lr_langid": _lr_cte_sql(
        "doc_id % 2 = 0",
        "doc_id % 2 = 1",
        "lang = 'en'",
        LR_BUCKETS,
        LR_ITERS,
        LR_RATE,
    ),
    # the joined-path row shares the oracle verbatim — the two code
    # paths claim bit-identical trajectories (r10)
    "e4_lr_langid_joined": _lr_cte_sql(
        "doc_id % 2 = 0",
        "doc_id % 2 = 1",
        "lang = 'en'",
        LR_BUCKETS,
        LR_ITERS,
        LR_RATE,
    ),
    # BPE twins: unrolled merge iterations (see _bpe_ctes_sql); the
    # encode twin chains the same literal replaces over documents.
    "e4_bpe_merges": _bpe_merges_sql(BPE_MERGES),
    "e4_unigram_lm": _unigram_lm_sql(
        vocab_size=40, seed_size=60, P=3, W=8, em_iters=2
    ),
    # r11: exhaustive-enumeration Viterbi twin (176 branches)
    "e4_unigram_encode": _unigram_encode_sql(
        vocab_size=40, seed_size=60, P=3, W=8, em_iters=2
    ),
    "e4_wordpiece_merges": _bpe_merges_sql(BPE_MERGES, "likelihood"),
    "e4_bpe_encode": _bpe_encode_sql(BPE_MERGES),
    # CCNet-bucket twin: the e4_lm_quality program + quantile_cont
    # thresholds (the interpolation definition F.percentile shares),
    # bucketed on 6dp-rounded scores so boundary rows agree.
    "e4_lm_buckets": f"""
WITH occ AS (
  SELECT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
model AS (
  SELECT token, ln(CAST(count(*) AS DOUBLE)
                   / (SELECT count(*) FROM occ)) AS lp
  FROM occ GROUP BY 1
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(avg(lp), 6) AS mean_logprob
  FROM occ JOIN model USING (token) GROUP BY 1
),
fullset AS (
  SELECT d.doc_id,
         coalesce(s.n_tokens, 0) AS n_tokens,
         s.mean_logprob
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN scored s USING (doc_id)
),
thr AS (
  SELECT round(quantile_cont(mean_logprob, {1 / 3}), 6) AS t_low,
         round(quantile_cont(mean_logprob, {2 / 3}), 6) AS t_high
  FROM fullset
)
SELECT doc_id, n_tokens, mean_logprob,
  CASE WHEN mean_logprob IS NULL THEN NULL
       WHEN round(mean_logprob, 6) >= t_high THEN 'head'
       WHEN round(mean_logprob, 6) >= t_low THEN 'middle'
       ELSE 'tail' END AS bucket
FROM fullset CROSS JOIN thr
""",
    # Gopher-rules twin: same one-projection shape; every counter is
    # the same length/replace/list_filter arithmetic so doubles match
    # bit-for-bit before the shared 6 dp rounding.
    "e4_gopher_rules": f"""
WITH base AS (
  SELECT doc_id, text AS raw, list_filter({TOKS_SQL}, t -> t <> '') AS toks
  FROM documents
),
stats AS (
  SELECT doc_id,
    len(toks) AS n_words,
    round(length(array_to_string(toks, ''))
          / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS mean_word_len,
    round(((length(raw) - length(replace(raw, '#', '')))
           + (length(raw) - length(replace(raw, '...', ''))) / 3)
          / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS symbol_word_ratio,
    round(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
          / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS alpha_word_frac,
    len(list_filter(toks, t -> list_contains({_sqllist(QUALITY_STOPWORDS)}, t)))
      AS stop_hits,
    round(len(list_filter(lines, l -> ends_with(l, '...')))
          / CAST(greatest(len(lines), 1) AS DOUBLE), 6) AS ellipsis_line_frac,
    round(len(list_filter(lines, l -> starts_with(l, '-')
                                      OR starts_with(l, '*')))
          / CAST(greatest(len(lines), 1) AS DOUBLE), 6) AS bullet_line_frac
  FROM (
    SELECT *, list_filter(list_transform(string_split(raw, chr(10)),
                                         l -> trim(l)), l -> l <> '') AS lines
    FROM base) b
)
SELECT *,
  coalesce(r_word_count AND r_mean_word_len AND r_symbol_ratio
           AND r_alpha_words AND r_stopwords AND r_line_shape,
           false) AS keep
FROM (
  SELECT *,
    n_words BETWEEN 15 AND 100000 AS r_word_count,
    mean_word_len BETWEEN 2.0 AND 10.0 AS r_mean_word_len,
    symbol_word_ratio <= 0.1 AS r_symbol_ratio,
    alpha_word_frac >= 0.8 AS r_alpha_words,
    stop_hits >= 2 AS r_stopwords,
    ellipsis_line_frac <= 0.3 AND bullet_line_frac <= 0.9 AS r_line_shape
  FROM stats) rules
""",
    # BM25 twin: identical arithmetic shape (Lucene idf, k1/b form) so
    # per-term contributions are bit-exact; the score sum is rounded to
    # 6 dp on both sides and rank is computed on the ROUNDED score with
    # doc_id tie-breaks, so top-k membership is engine-portable.
    "e4_bm25_topk": f"""
WITH base AS (
  SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks FROM documents
),
occ AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl FROM occ GROUP BY 1, 2
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM base),
qraw AS (SELECT * FROM (VALUES {_BM25_VALUES_SQL}) v(query_id, query_text)),
qterms AS (
  SELECT DISTINCT query_id, token FROM (
    SELECT query_id,
           unnest(string_split(trim(regexp_replace(lower(query_text),
             '\\s+', ' ', 'g')), ' ')) AS token
    FROM qraw) u WHERE token <> ''
),
qdf AS (
  SELECT qt.query_id, qt.token, d.df
  FROM qterms qt JOIN dfreq d USING (token)
),
scored AS (
  SELECT qdf.query_id, t.doc_id,
         round(sum(
           ln((s.n_docs - qdf.df + 0.5) / (qdf.df + 0.5) + 1.0)
           * (t.tf * {BM25_K1 + 1.0}
              / (t.tf + {BM25_K1}
                 * ({1.0 - BM25_B} + {BM25_B} * t.dl / s.avgdl)))
         ), 6) AS score
  FROM tf t JOIN qdf USING (token) CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score, rank FROM (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS INT)
           AS rank
  FROM scored) ranked
WHERE rank <= {BM25_K}
""",
    # r7 exact heavy hitters: the two-pass MG candidates are an
    # implementation detail — the recount + strict integer threshold
    # equals the plain HAVING program.
    "e4_heavy_hitters": f"""
WITH occ AS (
  SELECT unnest(list_filter({TOKS_SQL}, t -> t <> '')) AS token
  FROM documents
),
n AS (SELECT count(*) AS n FROM occ)
SELECT token, count(*) AS cnt
FROM occ, n
GROUP BY token, n.n
HAVING count(*) * 50 > n.n
""",
    # r7 per-domain quantile floor: quantile_cont == Spark
    # F.percentile (interpolated), per group; 6dp rounding on both
    # sides of the comparison — the e4_quantile_filter contract,
    # grouped.
    "e4_quantile_by_domain": """
WITH t AS (SELECT lang, round(quantile_cont(n_chars, 0.25), 6) AS thr
           FROM documents GROUP BY 1)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN t ON t.lang = d.lang
WHERE round(d.n_chars, 6) >= t.thr
""",
    # r7 hybrid RRF: the bm25 twin re-parameterized with probe-doc
    # queries, the cosine twin re-keyed to doc ids, and the fusion
    # join mirroring rrf_fuse's fixed-order two-term sum.
    "e4_hybrid_rrf": f"""
WITH base AS (
  SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks FROM documents
),
occ AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl FROM occ GROUP BY 1, 2
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM base),
qraw AS (
  SELECT doc_id AS query_id, text AS query_text FROM documents
  WHERE doc_id IN ({', '.join(str(i) for i in HYBRID_PROBES)})
),
qterms AS (
  SELECT DISTINCT query_id, token FROM (
    SELECT query_id,
           unnest(string_split(trim(regexp_replace(lower(query_text),
             '\\s+', ' ', 'g')), ' ')) AS token
    FROM qraw) u WHERE token <> ''
),
qdf AS (
  SELECT qt.query_id, qt.token, d.df
  FROM qterms qt JOIN dfreq d USING (token)
),
scored AS (
  SELECT qdf.query_id, t.doc_id,
         round(sum(
           ln((s.n_docs - qdf.df + 0.5) / (qdf.df + 0.5) + 1.0)
           * (t.tf * {BM25_K1 + 1.0}
              / (t.tf + {BM25_K1}
                 * ({1.0 - BM25_B} + {BM25_B} * t.dl / s.avgdl)))
         ), 6) AS score
  FROM tf t JOIN qdf USING (token) CROSS JOIN stats s
  GROUP BY 1, 2
),
lexr AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id ASC)
             AS INT) AS rank
    FROM scored) t WHERE rank <= {HYBRID_K}
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({', '.join(str(i) for i in HYBRID_PROBES)})
),
ds AS (
  SELECT q.query_id, e.vec_id AS doc_id,
         round({_cos_sql('q.qv', 'e.embedding')}, 6) AS cosine
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
),
denser AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC)
             AS INT) AS rank
    FROM ds) t WHERE rank <= {HYBRID_K}
),
fused AS (
  SELECT query_id, doc_id,
         round(coalesce(1.0/(60.0 + l.rank), 0.0)
               + coalesce(1.0/(60.0 + d.rank), 0.0), 6) AS rrf_score
  FROM lexr l FULL JOIN denser d USING (query_id, doc_id)
)
SELECT query_id, doc_id, rrf_score, rank FROM (
  SELECT query_id, doc_id, rrf_score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC)
           AS INT) AS rank
  FROM fused) r
WHERE rank <= {HYBRID_K}
""",
    # r8 composed pipeline: the hybrid fused top-k (identical CTEs as
    # e4_hybrid_rrf) anti-joined against benchmark 3-gram containment
    # (identical gram CTEs as e9_decontamination, train side = the
    # retrieved ids) — the oracle for queries.q_e4_retrieval_pipeline.
    "e4_retrieval_pipeline": f"""

WITH base AS (
  SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks FROM documents
),
occ AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM base),
tf AS (
  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl FROM occ GROUP BY 1, 2
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM base),
qraw AS (
  SELECT doc_id AS query_id, text AS query_text FROM documents
  WHERE doc_id IN ({', '.join(str(i) for i in HYBRID_PROBES)})
),
qterms AS (
  SELECT DISTINCT query_id, token FROM (
    SELECT query_id,
           unnest(string_split(trim(regexp_replace(lower(query_text),
             '\\s+', ' ', 'g')), ' ')) AS token
    FROM qraw) u WHERE token <> ''
),
qdf AS (
  SELECT qt.query_id, qt.token, d.df
  FROM qterms qt JOIN dfreq d USING (token)
),
scored AS (
  SELECT qdf.query_id, t.doc_id,
         round(sum(
           ln((s.n_docs - qdf.df + 0.5) / (qdf.df + 0.5) + 1.0)
           * (t.tf * {BM25_K1 + 1.0}
              / (t.tf + {BM25_K1}
                 * ({1.0 - BM25_B} + {BM25_B} * t.dl / s.avgdl)))
         ), 6) AS score
  FROM tf t JOIN qdf USING (token) CROSS JOIN stats s
  GROUP BY 1, 2
),
lexr AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id ASC)
             AS INT) AS rank
    FROM scored) t WHERE rank <= {HYBRID_K}
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({', '.join(str(i) for i in HYBRID_PROBES)})
),
ds AS (
  SELECT q.query_id, e.vec_id AS doc_id,
         round({_cos_sql('q.qv', 'e.embedding')}, 6) AS cosine
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
),
denser AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC)
             AS INT) AS rank
    FROM ds) t WHERE rank <= {HYBRID_K}
),
fused AS (
  SELECT query_id, doc_id,
         round(coalesce(1.0/(60.0 + l.rank), 0.0)
               + coalesce(1.0/(60.0 + d.rank), 0.0), 6) AS rrf_score
  FROM lexr l FULL JOIN denser d USING (query_id, doc_id)
),
topk AS (
  SELECT query_id, doc_id, rrf_score, rank FROM (
    SELECT query_id, doc_id, rrf_score,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC)
             AS INT) AS rank
    FROM fused) r
  WHERE rank <= {HYBRID_K}
),
g AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(toks) - {DECON_N} + 2, 1)),
             i -> array_to_string(toks[i:i + {DECON_N} - 1], ' '))) AS gram
    FROM base
  ) gg GROUP BY 1, 2
),
bg AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 7 = 0),
sizes AS (SELECT bench_id, CAST(count(*) AS BIGINT) AS bench_n FROM bg GROUP BY 1),
tg AS (
  SELECT g.doc_id AS train_id, gram
  FROM g JOIN (SELECT DISTINCT doc_id FROM topk) r USING (doc_id)
),
contam AS (
  SELECT DISTINCT train_id AS doc_id
  FROM (SELECT train_id, bench_id, CAST(count(*) AS BIGINT) AS matched
        FROM tg JOIN bg USING (gram) GROUP BY 1, 2) m
  JOIN sizes USING (bench_id)
  WHERE round(matched / CAST(bench_n AS DOUBLE), 6) >= {DECON_THRESHOLD}
)
SELECT t.query_id, t.doc_id, t.rrf_score, t.rank
FROM topk t LEFT JOIN contam c ON t.doc_id = c.doc_id
WHERE c.doc_id IS NULL
""",
    # HLL twin (r10): registers + the exact-integer harmonic fold are
    # single-sourced in sketch.hll_sql; exact distinct joined beside.
    "e4_hll_distinct": f"""
WITH src AS (
  SELECT lang, tok AS key FROM (
    SELECT lang, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
e AS (
  SELECT lang, CAST(count(DISTINCT key) AS BIGINT) AS exact_distinct
  FROM src GROUP BY 1
),
h AS ({hll_sql('SELECT lang, key FROM src', ['lang'])})
SELECT h.lang, h.est, e.exact_distinct FROM h JOIN e USING (lang)
""",
    # Histogram-quantile twin (r11): grid + interpolation single-
    # sourced in sketch.hist_sql.
    "e4_hist_quantiles": hist_sql(
        "SELECT lang, n_chars AS v FROM documents",
        ["lang"],
        qs=(0.25, 0.5, 0.75, 0.95),
        lo=0.0,
        hi=1024.0,
        n_buckets=64,
    ),
    # Weighted twin (r12): same grid program, cnt = SUM(w).
    "e4_hist_quantiles_weighted": hist_sql(
        "SELECT lang, n_chars AS v, n_chars AS w FROM documents",
        ["lang"],
        qs=(0.25, 0.5, 0.75),
        lo=0.0,
        hi=1024.0,
        n_buckets=64,
        weighted=True,
    ),
    # Per-group auto-range twin (r12): per-group bounds CTE, program
    # single-sourced in sketch.hist_auto_grouped_sql.
    "e4_hist_quantiles_auto_grouped": hist_auto_grouped_sql(
        "SELECT lang, n_chars AS v FROM documents",
        ["lang"],
        qs=(0.25, 0.5, 0.75, 0.95),
        n_buckets=64,
    ),
    # Auto-range twin (r12): bounds CTE = the broadcast min/max row,
    # grid/interpolation single-sourced in sketch.hist_auto_sql.
    "e4_hist_quantiles_auto": hist_auto_sql(
        "SELECT lang, n_chars AS v FROM documents",
        ["lang"],
        qs=(0.25, 0.5, 0.75, 0.95),
        n_buckets=64,
    ),
    # Weighted × auto-range twin (r13): same bounds CTE + grid
    # program, cnt = SUM(w).
    "e4_hist_quantiles_auto_weighted": hist_auto_sql(
        "SELECT lang, n_chars AS v, n_chars AS w FROM documents",
        ["lang"],
        qs=(0.25, 0.5, 0.75),
        n_buckets=64,
        weighted=True,
    ),
    # Weighted × per-group auto-range twin (r13).
    "e4_hist_quantiles_auto_grouped_weighted": hist_auto_grouped_sql(
        "SELECT lang, n_chars AS v, n_chars AS w FROM documents",
        ["lang"],
        qs=(0.25, 0.5, 0.75),
        n_buckets=64,
        weighted=True,
    ),
    # URL canonicalization + dedup twin (r13): identical planting and
    # a 1:1 mirror of every normalize_urls step.
    "e4_url_dedup": r"""
WITH planted AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
         || '://'
         || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
         || 'ExAmple' || CAST(doc_id % 7 AS VARCHAR) || '.CoM'
         || (CASE WHEN doc_id % 4 = 0 AND doc_id % 2 = 0 THEN ':80'
                  WHEN doc_id % 4 = 0 THEN ':443'
                  WHEN doc_id % 4 = 1 THEN ':8080'
                  ELSE '' END)
         || '/Doc/' || CAST(doc_id % 20 AS VARCHAR)
         || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&b=2&a=1'
                  WHEN doc_id % 5 = 1 THEN '?a=1&utm_campaign=x&b=2'
                  WHEN doc_id % 5 = 2 THEN '?b=2&a=1'
                  WHEN doc_id % 5 = 3 THEN '?utm_medium=z'
                  ELSE '' END)
         || (CASE WHEN doc_id % 6 = 0 THEN '#SeCtion' ELSE '' END)
           AS url
  FROM documents
),
parts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
  FROM planted
),
hp AS (
  SELECT doc_id, scheme, rest,
         regexp_replace(
           lower(regexp_extract(rest, '^([^/?#]*)', 1)),
           '^www\.', '') AS hostport0,
         split_part(regexp_replace(rest, '^[^/?#]*', ''), '#', 1) AS tail
  FROM parts
),
norm AS (
  SELECT doc_id, scheme,
         CASE WHEN scheme = 'http'
              THEN regexp_replace(hostport0, ':80$', '')
              WHEN scheme = 'https'
              THEN regexp_replace(hostport0, ':443$', '')
              ELSE hostport0 END AS hostport,
         split_part(tail, '?', 1) AS path,
         CASE WHEN contains(tail, '?')
              THEN substring(tail, length(split_part(tail, '?', 1)) + 2)
         END AS query
  FROM hp
),
canon AS (
  SELECT doc_id,
         scheme || '://' || hostport || path ||
         CASE WHEN len(p) > 0 THEN '?' || array_to_string(p, '&')
              ELSE '' END AS url_canonical
  FROM (
    SELECT doc_id, scheme, hostport, path,
           list_sort(list_filter(
             CASE WHEN query IS NOT NULL AND query <> ''
                  THEN string_split(query, '&')
                  ELSE [] END,
             x -> NOT (starts_with(x, 'utm_')
                       OR starts_with(x, 'fbclid=') OR x = 'fbclid'
                       OR starts_with(x, 'gclid=') OR x = 'gclid'
                       OR starts_with(x, 'msclkid=') OR x = 'msclkid')
           )) AS p
    FROM norm
  ) q
)
SELECT c.doc_id, c.url_canonical,
       c.doc_id = k.keep_id AS keep
FROM canon c
JOIN (SELECT url_canonical, min(doc_id) AS keep_id
      FROM canon GROUP BY 1) k USING (url_canonical)
""",
    # PII scrub twin (r13): identical planting, counts over the
    # original text, the same sequential regexp chain ('g' flag —
    # DuckDB replaces first-match-only without it; Spark always all).
    "e4_pii_scrub": r"""
WITH planted AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail.example.com now'
           WHEN doc_id % 3 = 1 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                || '.0.1 logged'
           ELSE ' ssn ' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
                || CAST(doc_id % 90 + 10 AS VARCHAR) || '-'
                || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' filed'
         END AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
             'g'),
           '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
         '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<ID>', 'g') AS text,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_email,
       CAST(len(regexp_extract_all(text,
         '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text,
         '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn
FROM planted
""",
    # Cross-grid merge twin (r13): per-shard bounds + midpoint
    # rebucket + merge + fixed-grid quantiles, single-sourced in
    # sketch.hist_rebucket_sql.
    "e4_hist_rebucket_merge": hist_rebucket_sql(
        "SELECT lang, n_chars AS v FROM documents WHERE doc_id % 2 = 0",
        "SELECT lang, n_chars AS v FROM documents WHERE doc_id % 2 = 1",
        ["lang"],
        qs=(0.25, 0.5, 0.75),
        lo=0.0,
        hi=1024.0,
        n_buckets=64,
        src_n_buckets=64,
    ),
    # Pairwise-matrix twin (r11): grouped sketches + per-pair theta
    # program single-sourced in sketch.kmv_sql_pairwise.
    "e4_kmv_matrix": kmv_sql_pairwise(
        f"""SELECT lang, array_to_string(
                     toks[(CAST(i AS INT)+1):(CAST(i AS INT)+3)], ' ')
                   AS key
            FROM (
              SELECT lang, toks, unnest(range(0, len(toks) - 2)) AS i
              FROM (SELECT lang, {TOKS_SQL} AS toks FROM documents) t0
            ) u""",
        "lang",
    ),
    # KMV twin (r11): sketches + theta-overlap arithmetic are
    # single-sourced in sketch.kmv_sql_set_estimates.
    "e4_kmv_overlap": kmv_sql_set_estimates(
        f"""SELECT array_to_string(
                     toks[(CAST(i AS INT)+1):(CAST(i AS INT)+3)], ' ')
                   AS key
            FROM (
              SELECT toks, unnest(range(0, len(toks) - 2)) AS i FROM (
                SELECT {TOKS_SQL} AS toks FROM documents
                WHERE doc_id % 2 = 0
              ) t0
            ) u""",
        f"""SELECT array_to_string(
                     toks[(CAST(i AS INT)+1):(CAST(i AS INT)+3)], ' ')
                   AS key
            FROM (
              SELECT toks, unnest(range(0, len(toks) - 2)) AS i FROM (
                SELECT {TOKS_SQL} AS toks FROM documents
                WHERE doc_id % 2 = 1
              ) t0
            ) u""",
    ),
    # r11: approx-mode profile twin — the HLL estimate is the
    # operator's own sketch (hll_sql at b=12, the rsd=0.02 mapping),
    # so the "approximate" number itself value-checks exactly.
    "e4_corpus_profile_approx": f"""
WITH src AS (
  SELECT lang, tok AS key FROM (
    SELECT lang, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
nt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens FROM src GROUP BY 1),
h AS ({hll_sql('SELECT lang, key FROM src', ['lang'], b=12)}),
hq AS ({hist_sql(
    "SELECT lang, CAST(length(text) AS DOUBLE) AS v FROM documents",
    ['lang'], qs=(0.25, 0.5, 0.75), lo=0.0, hi=4096.0, n_buckets=512)}),
qp AS (
  SELECT lang,
         max(CASE WHEN q = 0.25 THEN est END) AS len_p25,
         max(CASE WHEN q = 0.5 THEN est END) AS len_p50,
         max(CASE WHEN q = 0.75 THEN est END) AS len_p75
  FROM hq GROUP BY 1
)
SELECT nd.lang, nd.n_docs,
       coalesce(nt.n_tokens, 0) AS n_tokens,
       coalesce(CAST(round(h.est) AS BIGINT), 0) AS n_distinct_tokens,
       qp.len_p25, qp.len_p50, qp.len_p75
FROM nd LEFT JOIN nt USING (lang) LEFT JOIN h USING (lang)
LEFT JOIN qp USING (lang)
""",
    "e4_top_tokens": f"""
WITH toks AS (
  SELECT lang, tok AS token FROM (
    SELECT lang, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
counts AS (
  SELECT lang, token, count(*) AS n FROM toks GROUP BY 1, 2
),
totals AS (
  SELECT lang, count(*) AS total FROM toks GROUP BY 1
),
ranked AS (
  SELECT c.lang, token, n,
         round(n / CAST(t.total AS DOUBLE), 6) AS share,
         CAST(row_number() OVER (
           PARTITION BY c.lang ORDER BY n DESC, token ASC
         ) AS INT) AS rank
  FROM counts c JOIN totals t ON c.lang = t.lang
)
SELECT lang, token, n, share, rank FROM ranked WHERE rank <= 10
""",
    "e4_corpus_profile": f"""
WITH toks AS (
  SELECT lang, doc_id, tok AS token FROM (
    SELECT lang, doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
t AS (
  SELECT lang,
         count(*) AS n_tokens,
         count(DISTINCT token) AS n_distinct_tokens
  FROM toks GROUP BY 1
),
g AS (
  SELECT d.lang, count(*) AS n_docs,
         coalesce(any_value(t.n_tokens), 0) AS n_tokens,
         coalesce(any_value(t.n_distinct_tokens), 0) AS n_distinct_tokens
  FROM documents d LEFT JOIN t ON d.lang = t.lang
  GROUP BY 1
),
q AS (
  SELECT lang,
         round(quantile_cont(len(text)::DOUBLE, 0.25), 2) AS len_p25,
         round(quantile_cont(len(text)::DOUBLE, 0.5), 2) AS len_p50,
         round(quantile_cont(len(text)::DOUBLE, 0.75), 2) AS len_p75
  FROM documents GROUP BY 1
)
SELECT g.lang, n_docs, n_tokens, n_distinct_tokens,
       len_p25, len_p50, len_p75
FROM g JOIN q ON g.lang = q.lang
""",
    "e4_document_stats": f"""
WITH d AS (
  SELECT *, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents
)
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars_actual,
       CAST(len({TOKS_SQL}) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT)
         AS n_tokens_bpe,
       round({_DOCSTATS_SR}, 6) AS stopword_ratio,
       round({_DOCSTATS_PR}, 6) AS punct_ratio,
       round(0.4*({_DOCSTATS_SR})
           + 0.3*least(1.0, len({TOKS_SQL}) / 100.0)
           + 0.3*(1.0 - ({_DOCSTATS_PR})), 6) AS quality,
       {_LANG_CASE} AS lang_guess,
       md5(norm) AS fingerprint,
       list_min(list_transform(range(1, greatest(length(norm)-8+2, 2)),
           i -> md5(substr(norm, CAST(i AS INT), 8)))) AS shingle_fp
FROM d
""",
    "e4_tf_idf": f"""
WITH occ AS (
  SELECT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY 1, 2),
dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, token FROM occ) d GROUP BY 1
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
SELECT t.doc_id, t.token, t.tf, f.df,
       round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / f.df), 6) AS tfidf
FROM tf t JOIN dfreq f USING (token) CROSS JOIN n
""",
    "e4_lm_quality": f"""
WITH occ AS (
  SELECT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
model AS (
  SELECT token, ln(CAST(count(*) AS DOUBLE)
                   / (SELECT count(*) FROM occ)) AS lp
  FROM occ GROUP BY 1
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(avg(lp), 6) AS mean_logprob
  FROM occ JOIN model USING (token) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(s.n_tokens, 0) AS n_tokens,
       s.mean_logprob
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN scored s USING (doc_id)
""",
    "e4_lm_bigram": f"""
WITH base AS (
  SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM base
),
bg AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM pos
  ) x WHERE w2 IS NOT NULL
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(c2) AS DOUBLE) AS c1 FROM c2 GROUP BY 1),
model AS (SELECT w1, w2, ln(c2 / c1) AS lp FROM c2 JOIN c1 USING (w1)),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(avg(lp), 6) AS mean_logprob
  FROM bg JOIN model USING (w1, w2) GROUP BY 1
)
SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams, s.mean_logprob
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN scored s USING (doc_id)
""",
    # r7 Stupid Backoff: model from the even-id half (raw-count
    # relative frequencies, three orders), odd half scored through the
    # coalesce backoff chain. Backoff-factor logs are Python-computed
    # literals embedded in BOTH engines' plans so ln() ULP differences
    # cannot diverge the rounded averages.
    "e4_lm_backoff": f"""
WITH tb AS (
  SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
  FROM documents WHERE doc_id % 2 = 0
),
tpos AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM tb
),
ttg AS (
  SELECT w1, w2, w3 FROM (
    SELECT tok AS w1,
           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
    FROM tpos) x WHERE w3 IS NOT NULL
),
tbg AS (
  SELECT w1, w2 FROM (
    SELECT tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tpos) x WHERE w2 IS NOT NULL
),
c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM ttg GROUP BY 1, 2, 3),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM tbg GROUP BY 1, 2),
c1 AS (SELECT tok AS w, count(*) AS c1 FROM tpos GROUP BY 1),
tri AS (
  SELECT c3.w1, c3.w2, c3.w3, ln(c3.c3 / c2.c2) AS lp3
  FROM c3 JOIN c2 USING (w1, w2)
),
bi AS (
  SELECT c2.w1 AS w2, c2.w2 AS w3, ln(c2.c2 / c1.c1) AS lp2
  FROM c2 JOIN c1 ON c2.w1 = c1.w
),
uni AS (
  SELECT w AS w3, ln(c1 / (SELECT CAST(count(*) AS DOUBLE) FROM tpos)) AS lp1
  FROM c1
),
sb AS (
  SELECT doc_id, w1, w2, w3 FROM (
    SELECT doc_id, tok AS w1,
           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
    FROM (
      SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
      FROM (
        SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
        FROM documents WHERE doc_id % 2 = 1
      ) qb
    ) qpos) x WHERE w3 IS NOT NULL
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         round(avg(coalesce(tri.lp3,
                            bi.lp2 + {_LN_BACKOFF!r},
                            uni.lp1 + {2.0 * _LN_BACKOFF!r},
                            -20.0)), 6) AS mean_logprob
  FROM sb
  LEFT JOIN tri USING (w1, w2, w3)
  LEFT JOIN bi USING (w2, w3)
  LEFT JOIN uni USING (w3)
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(s.n_trigrams, 0) AS n_trigrams,
       s.mean_logprob
FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN scored s USING (doc_id)
""",
    "e4_chi2_features": f"""
WITH pres AS (
  SELECT DISTINCT lang AS label, doc_id, tok AS token FROM (
    SELECT lang, doc_id, unnest({TOKS_SQL}) AS tok FROM documents) u
  WHERE tok <> ''
),
a AS (SELECT label, token, CAST(count(*) AS DOUBLE) AS A
      FROM pres GROUP BY 1, 2),
tt AS (SELECT token, sum(A) AS T FROM a GROUP BY 1),
lt AS (SELECT lang AS label, CAST(count(*) AS DOUBLE) AS L
       FROM documents GROUP BY 1),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM documents),
cells AS (
  SELECT a.label, a.token, a.A, tt.T - a.A AS B, lt.L - a.A AS C,
         nn.N - tt.T - lt.L + a.A AS D, nn.N AS N
  FROM a JOIN tt USING (token) JOIN lt USING (label) CROSS JOIN nn
  WHERE a.A + (tt.T - a.A) < nn.N AND a.A + (lt.L - a.A) < nn.N
),
ranked AS (
  SELECT label, token,
         N * pow(A*D - B*C, 2) / ((A+B)*(C+D)*(A+C)*(B+D)) AS chi2,
         row_number() OVER (PARTITION BY label
           ORDER BY N * pow(A*D - B*C, 2)
                    / ((A+B)*(C+D)*(A+C)*(B+D)) DESC,
                    token ASC) AS rank
  FROM cells
)
SELECT label, token, round(chi2, 6) AS chi2, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
""",
    # r7 C4-style blocklist gate: occurrence count of blocklisted
    # tokens + keep decision, one projection.
    "e4_blocklist": f"""
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(len(list_filter(toks, t -> t IN ('dup', 'merge', 'spark')))
       AS INT) AS n_flagged,
  coalesce(len(list_filter(toks, t -> t IN ('dup', 'merge', 'spark')))
           <= 0, false) AS keep
FROM (SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
      FROM documents) b
""",
    # r7 interpolated Kneser–Ney bigram LM: discounted seen-bigram
    # mass + continuation-distribution interpolation, even-half model
    # scoring the odd half. Arithmetic order mirrors the Spark exprs
    # term-for-term so doubles match bit-for-bit before the 6dp round.
    "e4_lm_kn": f"""
WITH tb AS (
  SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
  FROM documents WHERE doc_id % 2 = 0
),
tbg AS (
  SELECT w1, w2 FROM (
    SELECT tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM (
      SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos
      FROM tb) tp) x WHERE w2 IS NOT NULL
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM tbg GROUP BY 1, 2),
ctx AS (
  SELECT w1, CAST(sum(c2) AS DOUBLE) AS ctot,
         CAST(count(*) AS DOUBLE) AS nfwd
  FROM c2 GROUP BY 1
),
big AS (
  SELECT c2.w1, c2.w2, greatest(c2.c2 - 0.75, 0.0) / ctx.ctot AS disc
  FROM c2 JOIN ctx USING (w1)
),
lam AS (SELECT w1, 0.75 * nfwd / ctot AS lam FROM ctx),
cont AS (
  SELECT w2, CAST(count(*) AS DOUBLE)
             / (SELECT CAST(count(*) AS DOUBLE) FROM c2) AS pcont
  FROM c2 GROUP BY 1
),
qbg AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM (
      SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos
      FROM (
        SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
        FROM documents WHERE doc_id % 2 = 1
      ) qb) qp) x WHERE w2 IS NOT NULL
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(avg(CASE
           WHEN lam.lam IS NOT NULL AND cont.pcont IS NOT NULL
           THEN ln(coalesce(big.disc, 0.0) + lam.lam * cont.pcont)
           ELSE -20.0 END), 6) AS mean_logprob
  FROM qbg
  LEFT JOIN big USING (w1, w2)
  LEFT JOIN lam USING (w1)
  LEFT JOIN cont USING (w2)
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(s.n_bigrams, 0) AS n_bigrams,
       s.mean_logprob
FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN scored s USING (doc_id)
""",
    # r7 Naive Bayes language-ID: Laplace-smoothed multinomial NB,
    # trained on the even half, argmax per odd doc (ties label ASC).
    "e4_nb_langid": f"""
WITH occ_t AS (
  SELECT lang AS label, tok AS token FROM (
    SELECT lang, unnest({TOKS_SQL}) AS tok
    FROM documents WHERE doc_id % 2 = 0
  ) u WHERE tok <> ''
),
c_tl AS (SELECT label, token, count(*) AS c FROM occ_t GROUP BY 1, 2),
n_l AS (SELECT label, CAST(sum(c) AS DOUBLE) AS n_l FROM c_tl GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT token) AS DOUBLE) AS v FROM c_tl),
tp AS (
  SELECT label, token, ln((c + 1.0) / (n_l + v)) AS lp
  FROM c_tl JOIN n_l USING (label) CROSS JOIN v
),
dc AS (
  SELECT lang AS label, count(*) AS n_docs
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS t FROM documents WHERE doc_id % 2 = 0
),
lpt AS (
  SELECT label, ln(n_docs / t) AS prior, ln(1.0 / (n_l + v)) AS oov
  FROM dc JOIN n_l USING (label) CROSS JOIN tot CROSS JOIN v
),
occ_s AS (
  SELECT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok
    FROM documents WHERE doc_id % 2 = 1
  ) u WHERE tok <> ''
),
contrib AS (
  SELECT o.doc_id, l.label, sum(coalesce(tp.lp, l.oov)) AS s
  FROM occ_s o
  CROSS JOIN lpt l
  LEFT JOIN tp ON tp.label = l.label AND tp.token = o.token
  GROUP BY 1, 2
),
base AS (
  SELECT d.doc_id, l.label, l.prior
  FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 2 = 1) d
  CROSS JOIN lpt l
),
scored AS (
  SELECT b.doc_id, b.label, b.prior + coalesce(c.s, 0.0) AS score
  FROM base b
  LEFT JOIN contrib c ON b.doc_id = c.doc_id AND b.label = c.label
)
SELECT doc_id, label, round(score, 6) AS score FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rn
  FROM scored) x
WHERE rn = 1
""",
    "e4_repetition_stats": f"""
WITH base AS (
  SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks FROM documents
),
tokc AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS gram FROM base) t GROUP BY 1, 2
),
tstats AS (
  SELECT doc_id, sum(c) AS n, max(c) AS top,
         coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS dup
  FROM tokc GROUP BY 1
),
pos AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM base
),
bgc AS (
  SELECT doc_id, gram, count(*) AS c FROM (
    SELECT doc_id,
           tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
             AS gram
    FROM pos
  ) g WHERE gram IS NOT NULL GROUP BY 1, 2
),
bstats AS (
  SELECT doc_id, sum(c) AS bn,
         coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS bdup
  FROM bgc GROUP BY 1
)
SELECT t.doc_id,
       CAST(t.n AS BIGINT) AS n_tokens,
       round(t.top / CAST(t.n AS DOUBLE), 6) AS top_token_frac,
       round(t.dup / CAST(t.n AS DOUBLE), 6) AS dup_token_frac,
       round(coalesce(b.bdup / CAST(b.bn AS DOUBLE), 0.0), 6)
         AS dup_bigram_frac
FROM tstats t LEFT JOIN bstats b USING (doc_id)
""",
}

# Composed keep-decision: reuses the two e4 oracle bodies verbatim as
# CTEs — the filter compares the same ROUNDED values both engines
# already agree on, so the kept set is identical by construction.
ORACLE_SQL["e4_quality_filter"] = f"""
WITH ds AS ({ORACLE_SQL["e4_document_stats"]}),
rs AS ({ORACLE_SQL["e4_repetition_stats"]})
SELECT ds.doc_id, ds.quality, ds.lang_guess,
       rs.top_token_frac, rs.dup_bigram_frac
FROM ds JOIN rs USING (doc_id)
WHERE ds.quality >= 0.45
  AND rs.top_token_frac <= 0.12
  AND rs.dup_bigram_frac <= 0.1
"""

ORACLE_SQL["e4_chunks"] = f"""
WITH tokd AS (
  SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, toks,
         unnest(range(1, len(toks) + 1, {CHUNK_STRIDE})) AS start
  FROM tokd WHERE len(toks) > 0
)
SELECT doc_id,
       CAST((start - 1) // {CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(len(toks[start:start + {CHUNK_TOKENS} - 1]) AS INT) AS n_tokens,
       array_to_string(toks[start:start + {CHUNK_TOKENS} - 1], ' ')
         AS chunk_text
FROM c
"""
