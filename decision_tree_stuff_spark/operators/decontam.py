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

import math
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


def _bloom_pos_cols(gram, k: int, m: int):
    """The k Bloom bit positions of a gram: Kirsch-Mitzenmacher over
    ONE md5 — ``pos_i = (h1 + i*h2) mod m`` with h1/h2 the two 60-bit
    md5 halves (the exact scheme ``dedup.minhash_lsh_pairs`` uses, so
    the DuckDB twin ``('0x'||substr(md5(g),...))::BIGINT`` parity is
    already established). Positive operands, so ``%`` agrees across
    engines."""
    d = F.md5(gram)
    h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(d, 17, 15), 16, 10).cast("bigint")
    return [(h1 + F.lit(i) * h2) % F.lit(m) for i in range(k)]


BLOOM_M, BLOOM_K = 1 << 20, 3


def bloom_bitset(
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> list:
    """Driver-side Bloom bitset (list of m/64 signed int64 words) over
    the benchmark corpus's distinct token n-grams.

    The collect is bounded by the BENCH side (k x |distinct bench
    grams| positions, deduped before collect) — eval sets are small by
    nature; this is a model artifact like the IVF centroid table, not
    a corpus-sized pull. At 100 TB the thing you must never shuffle is
    the TRAIN corpus, and this structure exists so you don't:
    membership becomes a broadcast literal probed by a pure projection.
    """
    grams = token_ngrams(bench, id_col, text_col, n)
    pos = (
        grams.select(F.col("gram")).distinct()
        .select(F.explode(F.array(*_bloom_pos_cols(F.col("gram"), k, m))).alias("pos"))
        .distinct()
    )
    bits = bytearray(m // 8)
    for (p,) in pos.collect():
        bits[p >> 3] |= 1 << (p & 7)
    # bytes, NOT a list: a binary literal is ONE foldable Literal
    # object, whereas F.lit(list) builds a CreateArray(m/64) that the
    # interpreted higher-order-function path re-evaluates per probe —
    # measured 20 s vs 2 s on the sf0.1 corpus scan
    return bytes(bits)


def bloom_contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    train_id: str = "doc_id",
    bench_id: str = "doc_id",
    text_col: str = "text",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom-filter contamination scan: per TRAIN doc, the fraction of
    its distinct token n-grams that hit a Bloom filter built over the
    union of benchmark n-grams (Bloom 1970; Kirsch-Mitzenmacher
    double hashing). Returns flagged docs
    ``(doc_id, n_grams, n_hit, hit_frac)`` with ``hit_frac >=
    threshold`` (rounded 6dp; gram-less docs can never flag).

    vs ``ngram_contamination``: this is the UNION-membership measure
    (the Dolma/RefinedWeb-style production filter), not per-bench-doc
    containment — it cannot say WHICH bench doc leaked, and it admits
    the filter's false-positive rate ((1-e^(-kn/m))^k), in exchange
    for a plan with ZERO shuffle on the corpus side: tokenize ->
    n-grams -> k x element_at probes into a literal array<bigint>, all
    inside one projection. The exact-join variant shuffles corpus
    grams; at 100 TB that exchange dwarfs everything else, and this
    operator is how you avoid it. FP behavior is deterministic given
    (md5, m, k), so the DuckDB twin reproduces it bit-for-bit.
    """
    scored = _bloom_scored(
        train, bench, n, train_id, bench_id, text_col, m, k
    )
    return scored.where(
        (F.col("n_grams") > 0) & (F.col("hit_frac") >= threshold)
    ).select(train_id, "n_grams", "n_hit", "hit_frac")


def _bloom_scored(
    train, bench, n, train_id, bench_id, text_col, m, k, bits=None
) -> DataFrame:
    """All train columns + (n_grams, n_hit, hit_frac) — one pure
    projection, no shuffle, no join. ``bits`` (r10): a precomputed
    ``bloom_bitset`` artifact — pass it when the same filter probes
    many frames (the streaming ingest probes one per micro-batch;
    rebuilding the bitset would re-scan the bench every batch)."""
    from decision_tree_stuff_spark.operators import spread_small

    if bits is None:
        bits = bloom_bitset(bench, bench_id, text_col, n, m, k)
    bits = F.lit(bits)

    tokd = spread_small(train).withColumn(
        "_toks", F.filter(tokens(F.col(text_col)), lambda t: t != "")
    )
    t = F.col("_toks")
    grams = F.when(
        F.size(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))

    # one md5 per gram (the HOF path has no CSE: inlining the halves
    # into every probe would hash k*2 times per gram), then k byte
    # probes into the binary literal per gram
    def _halves(g):
        d = F.md5(g)
        return F.struct(
            F.conv(F.substring(d, 1, 15), 16, 10).cast("bigint").alias("h1"),
            F.conv(F.substring(d, 17, 15), 16, 10).cast("bigint").alias("h2"),
        )

    def _hit(s):
        tests = []
        for i in range(k):
            p = (s["h1"] + F.lit(i) * s["h2"]) % F.lit(m)
            byte = F.conv(
                F.hex(F.substring(bits, (p / 8).cast("int") + 1, 1)), 16, 10
            ).cast("int")
            mask = F.element_at(
                F.lit([1, 2, 4, 8, 16, 32, 64, 128]),
                (p % 8).cast("int") + 1,
            )
            tests.append(byte.bitwiseAND(mask) != 0)
        out = tests[0]
        for c in tests[1:]:
            out = out & c
        return out

    from decision_tree_stuff_spark.operators import pushdown_fence

    scored = (
        tokd.withColumn("_hs", F.transform(grams, _halves))
        .withColumn("n_grams", F.size("_hs").cast("bigint"))
        .withColumn(
            "n_hit", F.size(F.filter(F.col("_hs"), _hit)).cast("bigint")
        )
        .withColumn(
            "hit_frac",
            F.round(F.col("n_hit") / F.col("n_grams").cast("double"), 6),
        )
        .drop("_toks", "_hs")
    )
    # without the fence, the caller's threshold filter inlines these
    # columns and pushes below the spread exchange — the whole probe
    # then runs (twice) in the single-split scan task: 10 s -> 1 s
    # at sf0.1
    return pushdown_fence(scored)


def bloom_decontaminate(
    train: DataFrame,
    bench: DataFrame = None,
    n: int = 3,
    threshold: float = 0.5,
    train_id: str = "doc_id",
    bench_id: str = "doc_id",
    text_col: str = "text",
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    bits: bytes = None,
) -> DataFrame:
    """The cleaned corpus under the Bloom measure: drop train docs
    whose benchmark-gram hit fraction reaches threshold. NO join —
    the flag is an expression, so the whole decontamination pass is
    scan -> projection -> filter on the corpus (false positives
    over-drop slightly; that is the documented trade, tunable via
    m/k). Either ``bench`` (bitset built here) or a precomputed
    ``bits`` artifact must be given."""
    if bench is None and bits is None:
        raise ValueError("bloom_decontaminate needs bench or bits")
    scored = _bloom_scored(
        train, bench, n, train_id, bench_id, text_col, m, k, bits=bits
    )
    return scored.where(
        (F.col("n_grams") == 0) | (F.col("hit_frac") < threshold)
    ).drop("n_grams", "n_hit", "hit_frac")


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


def embedding_decontamination(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool | None = None,
    ivf_bench_bound: int = 10_000,
    n_centroids: int = 64,
    nprobe: int = 4,
    centroid_mode: str = "first",
) -> DataFrame:
    """SEMANTIC decontamination (E-9c): flag corpus items whose
    embedding is near-identical to any benchmark item — the fuzzy
    complement to the n-gram/Bloom checks, which a paraphrased or
    reformatted benchmark leak walks straight past (the
    "fuzzy/semantic decontamination" step of recent LLM data
    pipelines; same scoring as SemDeDup, pointed at an eval set).

    Returns (id_col, max_bench_cos, bench_id, contaminated): per
    corpus item, its maximum 6dp-rounded cosine against the benchmark
    set, the lowest-id benchmark item attaining it, and the threshold
    flag. Corpus items that score against nothing (empty benchmark
    set, zero-norm vectors, or — on the IVF path — no bench
    cell-mate) are KEPT with null score and contaminated = false;
    both paths share this contract.

    Path selection (r9): the scale path is what a naive caller gets.
    ``exact=None`` (default) counts the benchmark side once — an eval
    set is small, so the count is cheap — and brute-forces when
    |bench| <= ``ivf_bench_bound``, else delegates to
    ``embedding_decontamination_ivf`` (approximate: recall < 1,
    identical vectors always caught; tune ``n_centroids``/``nprobe``,
    and ``centroid_mode='kmeans'`` for data-adaptive cells).
    ``exact=True`` forces the brute-force scorer regardless of size;
    ``exact=False`` forces IVF.

    Scale shape (exact path): the benchmark side BROADCASTS and the
    corpus side never shuffles — scoring is a broadcast nested-loop
    over |bench| rows per corpus row followed by one
    map-side-combinable max-struct aggregate keyed on the corpus id.
    That is linear in |corpus|x|bench|, which is exactly why
    |bench| > ``ivf_bench_bound`` auto-routes to the IVF staging.

    Contract notes (r10, documenting two builder-time behaviors):
    ``exact=None`` fires the bench count as a Spark job at
    plan-construction time (cheap — the bench side is an eval set);
    pass ``exact`` explicitly to keep the builder fully lazy. And
    ``id_col`` is assumed UNIQUE per corpus row (the natural key of
    an embedding table): with duplicate ids the join-back returns one
    row per corpus ROW, not per distinct id — deduplicate upstream
    (a corpus-side ``distinct`` is a shuffle this operator refuses to
    pay for you).
    """
    from decision_tree_stuff_spark.functions.array_math import dot_product

    if exact is None:
        exact = bench_emb.count() <= ivf_bench_bound
    if not exact:
        return embedding_decontamination_ivf(
            corpus_emb,
            bench_emb,
            threshold=threshold,
            n_centroids=n_centroids,
            nprobe=nprobe,
            id_col=id_col,
            vec_col=vec_col,
            centroid_mode=centroid_mode,
        )

    def norm(v):
        return F.sqrt(dot_product(v, v))

    # norms are HOISTED to one computation per row on each side (the
    # per-pair work is then a single dot-product fold instead of
    # three): cos = dot/(sqrt(A)·sqrt(B)) is the identical expression
    # tree either way, so every double — and the 6dp rounding — is
    # bit-for-bit what the per-pair form and the _cos_sql twin produce
    bench = bench_emb.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bvec"),
        norm(F.col(vec_col)).alias("__bn"),
    )
    scored = corpus_emb.select(
        id_col, vec_col, norm(F.col(vec_col)).alias("__cn")
    ).join(F.broadcast(bench), F.lit(True))
    denom = F.col("__cn") * F.col("__bn")
    cos = F.round(
        F.when(
            denom > 0.0,
            dot_product(F.col(vec_col), F.col("__bvec")) / denom,
        ),
        6,
    )
    # max(struct(cos, -bid)) = highest cosine, ties to the LOWEST
    # bench id — deterministic winner without a rank window
    best = (
        scored.select(
            F.col(id_col),
            F.struct(cos.alias("c"), (-F.col("__bid")).alias("nb")).alias(
                "__s"
            ),
        )
        .groupBy(id_col)
        .agg(F.max("__s").alias("__m"))
    )
    # left-join back onto the corpus ids (r9 advice): an empty
    # benchmark set or an all-zero-norm corpus row must yield the row
    # with contaminated = false, not drop it — the IVF variant's
    # contract, now shared
    return (
        corpus_emb.select(id_col)
        .join(best, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__m.c").alias("max_bench_cos"),
            (-F.col("__m.nb")).alias("bench_id"),
            F.coalesce(
                F.col("__m.c") >= F.lit(threshold), F.lit(False)
            ).alias("contaminated"),
        )
    )


def token_ngram_positions(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, pos, gram) for EVERY n-gram occurrence — ``pos`` is the
    1-based index of the gram's first token. The positional variant
    of ``token_ngrams`` (which deduplicates to set semantics);
    repeated grams keep every position, which is what span reporting
    needs."""
    from decision_tree_stuff_spark.operators import spread_small

    tokd = spread_small(df).select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("_toks"),
    )
    t = F.col("_toks")
    pg = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.struct(
                i.alias("pos"), F.concat_ws(" ", F.slice(t, i, n)).alias("gram")
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<pos:int,gram:string>>")
    )
    ex = tokd.select(F.col(id_col), F.explode(pg).alias("__pg"))
    return ex.select(
        F.col(id_col),
        F.col("__pg.pos").alias("pos"),
        F.col("__pg.gram").alias("gram"),
    )


def contamination_spans(
    train: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    train_id: str = "doc_id",
    bench_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WHERE the leak is (E-9d): for every contaminated
    (train, bench) pair — same flagging as ``ngram_contamination`` —
    the merged TOKEN spans of the train doc that matched benchmark
    n-grams. The audit/redaction artifact: instead of dropping a
    10-page doc over a leaked 10-line item, strip exactly
    [start_tok, end_tok] (Dolma's paragraph-removal move, at token
    resolution).

    Returns (train_id, bench_id, start_tok, end_tok, span_tokens) —
    one row per maximal contaminated span; positions are 1-based
    inclusive token indices. Span merging is the gaps-and-islands
    program (same two-window plan as ``temporal.interval_coverage``)
    over gram intervals [pos, pos+n−1], merging overlap AND
    adjacency (contiguous tokens = one span). All-integer ⇒ exact
    and engine-portable.

    Scale: flagged pairs bound everything — positions join the (small
    by nature) benchmark gram set first, then semi-join the flagged
    pairs; the windows partition by (train, bench) pair, so no global
    sort and no hot key beyond a single pathological pair.
    """
    from pyspark.sql import Window

    flagged = ngram_contamination(
        train, bench, n=n, threshold=threshold,
        train_id=train_id, bench_id=bench_id, text_col=text_col,
    ).select("train_id", "bench_id")
    tpos = token_ngram_positions(train, train_id, text_col, n).select(
        F.col(train_id).alias("train_id"), "pos", "gram"
    )
    bg = token_ngrams(bench, bench_id, text_col, n).select(
        F.col(bench_id).alias("bench_id"), "gram"
    )
    hits = (
        tpos.join(bg, "gram")
        .join(flagged, ["train_id", "bench_id"], "semi")
        .select(
            "train_id",
            "bench_id",
            F.col("pos").alias("__s"),
            (F.col("pos") + F.lit(n - 1)).alias("__e"),
        )
    )
    w = Window.partitionBy("train_id", "bench_id").orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # break only when a GAP of at least one token separates the next
    # gram from everything seen: s > prev_max_e + 1 (adjacency merges)
    flagged_rows = hits.withColumn(
        "__ni",
        F.when(
            prev_max_end.isNull() | (F.col("__s") > prev_max_end + 1), 1
        ).otherwise(0),
    )
    w2 = w.rowsBetween(Window.unboundedPreceding, 0)
    islands = flagged_rows.withColumn("__iid", F.sum("__ni").over(w2))
    return (
        islands.groupBy("train_id", "bench_id", "__iid")
        .agg(F.min("__s").alias("start_tok"), F.max("__e").alias("end_tok"))
        .select(
            "train_id",
            "bench_id",
            "start_tok",
            "end_tok",
            (F.col("end_tok") - F.col("start_tok") + 1).alias("span_tokens"),
        )
    )


def embedding_decontamination_ivf(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mode: str = "first",
) -> DataFrame:
    """The SCALE path for ``embedding_decontamination`` — the IVF
    staging the brute-force docstring promises, as real code: both
    sides coarse-quantize against the corpus quantizer
    (``similarity._quantizer_centroids`` — 'first' is the
    deterministic oracle mode, 'kmeans' the production one); the
    corpus keeps its ONE home cell, each benchmark item probes its
    ``nprobe`` nearest cells, and only cell-mates are verified. The
    |corpus|×|bench| cross join becomes a cell equi-join ~
    (n_centroids/nprobe)× smaller — SemDeDup's staging pointed at an
    eval set.

    APPROXIMATE by construction: a leak whose embedding lands in a
    cell none of the bench item's probes reach is missed (recall
    rises with nprobe; an IDENTICAL embedding is always caught — it
    shares the exact argmax cell). Corpus items with no bench
    cell-mate return null score and contaminated = false.
    Same output schema as the exact operator.
    """
    from decision_tree_stuff_spark.functions.array_math import dot_product
    from decision_tree_stuff_spark.operators import spread_small
    from decision_tree_stuff_spark.operators.similarity import (
        _quantizer_centroids,
    )

    def norm(v):
        return F.sqrt(dot_product(v, v))

    # The quantizer is a bounded model artifact (n_centroids rows) —
    # like the k-means/PQ codebooks it rides in the PLAN as literals,
    # so cell assignment is a shuffle-free per-row argmax projection.
    # The r8 version assigned cells with a broadcast join + row_number
    # window: correct, but the window shuffles the full corpus (64-dim
    # vectors through the exchange) AND its small post-shuffle output
    # let AQE coalesce the heavy verify fan-out onto 4 of 32 cores
    # (measured sf1: 17 s; literal assignment + spread_small: the
    # whole query is one scan-side pipeline into the aggregate).
    # Ordering matches the window exactly: max rounded cosine, ties to
    # the lowest cid, NULL cosines (zero-norm) never win.
    crows = sorted(
        _quantizer_centroids(
            corpus_emb, n_centroids, id_col, vec_col, centroid_mode
        ).collect()
    )

    # r10 (the sf0.1 intercept A/B, SCALING_r10.md): the r9 argmax
    # called cosine_similarity(vec, clit) per centroid, which re-folds
    # dot(v,v) AND dot(c,c) inside every branch — Catalyst does no CSE
    # across lambda boundaries, so each row paid 3·n_centroids folds.
    # The centroid norms are plan-time Python constants (computed with
    # the IDENTICAL left-to-right (acc + x·x) order as the aggregate
    # fold, then sqrt — same IEEE op sequence, so every double and the
    # 6dp rounding stay bit-identical to the oracle) and the row norm
    # binds ONCE as a column; the argmax now costs n_centroids folds
    # per row, not 3x. Measured: 3.5 -> ~1.5 s at sf0.1.
    def _py_norm(vals) -> float:
        acc = 0.0
        for v in vals:
            acc += float(v) * float(v)
        return math.sqrt(acc)

    def cell_rank_structs(vec, vn):
        out = []
        for cid, cvec in crows:
            cn = _py_norm(cvec)
            if cn > 0.0:
                clit = F.array(*[F.lit(float(v)) for v in cvec])
                denom = vn * F.lit(cn)
                cos = F.when(denom > 0.0, dot_product(vec, clit) / denom)
                negc = F.coalesce(-F.round(cos, 6), F.lit(float("inf")))
            else:
                negc = F.lit(float("inf"))
            out.append(
                F.struct(negc.alias("negc"), F.lit(int(cid)).alias("cid"))
            )
        return out

    ccells = (
        spread_small(corpus_emb)
        .select(
            F.col(id_col),
            F.col(vec_col),
            norm(F.col(vec_col)).alias("__cn"),
        )
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.array_min(
                F.array(
                    *cell_rank_structs(F.col(vec_col), F.col("__cn"))
                )
            )["cid"].alias("cid"),
            F.col("__cn"),
        )
    )
    bcells = bench_emb.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bvec"),
        norm(F.col(vec_col)).alias("__bn"),
    ).select(
        "__bid",
        "__bvec",
        "__bn",
        F.explode(
            F.slice(
                F.array_sort(
                    F.array(
                        *cell_rank_structs(F.col("__bvec"), F.col("__bn"))
                    )
                ),
                1,
                nprobe,
            )["cid"]
        ).alias("cid"),
    )
    denom = F.col("__cn") * F.col("__bn")
    cos = F.round(
        F.when(
            denom > 0.0,
            dot_product(F.col(vec_col), F.col("__bvec")) / denom,
        ),
        6,
    )
    best = (
        ccells.join(F.broadcast(bcells), "cid")
        .select(
            F.col(id_col),
            F.struct(cos.alias("c"), (-F.col("__bid")).alias("nb")).alias(
                "__s"
            ),
        )
        .groupBy(id_col)
        .agg(F.max("__s").alias("__m"))
    )
    return (
        corpus_emb.select(id_col)
        .join(best, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__m.c").alias("max_bench_cos"),
            (-F.col("__m.nb")).alias("bench_id"),
            F.coalesce(
                F.col("__m.c") >= F.lit(threshold), F.lit(False)
            ).alias("contaminated"),
        )
    )


#: Side tag for exact_substring_decontam: bench ids are offset by this
#: stride inside the shared anchor pipeline, so corpus id < bench id
#: holds for every cross-side pair and the (id_a, id_b) orientation of
#: exact_substring_matches IS (corpus, bench). Corpus/bench ids must
#: be in [0, 2^40) — checked per row with raise_error, not assumed.
_SUBSTR_SIDE_STRIDE = 1 << 40


def exact_substring_decontam(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    max_df="auto",
    auto_quantile: float = 0.70,
) -> DataFrame:
    """ExactSubstr DECONTAMINATION (Lee et al. 2022, applied
    corpus-vs-benchmark — the missing sibling of the dedup variant
    ``dedup.exact_substring_matches``): every maximal verbatim run of
    ≥ ``min_len`` normalized chars shared between a corpus document
    and a benchmark document, with exact positions and length. This
    is the DETERMINISTIC end of the decontam family: n-gram
    contamination (``ngram_contamination``) scores fixed-size gram
    overlap fractions, Bloom is its shuffle-free approximation,
    semantic catches paraphrase — none of them returns the exact
    span of a long verbatim leak shared by exactly one corpus doc
    and one bench doc, which is precisely the "test-set membership"
    case.

    Implementation: tag bench ids by ``_SUBSTR_SIDE_STRIDE`` (per-row
    ``raise_error`` guard on the id range — silent aliasing would
    produce wrong pairs), run the shared sorted-anchor + diagonal
    gaps-and-islands pipeline on the union (one pass over
    corpus+bench; the ``max_df`` hot-gram cap sees BOTH sides, which
    is correct — boilerplate is boilerplate wherever it occurs), and
    keep only cross-side pairs. Returns
    (``id_col``, bench_id, pos, bench_pos, match_len), one row per
    maximal contaminated span.

    SCALE RECIPE (r12): identical to
    ``dedup.exact_substring_matches`` — a fixed integer ``max_df``
    bounds the pair stage at ``max_df × n_anchors`` (linear with a
    cap-sized constant; SCALING_r12.md §4 has the measured slopes);
    on heavily duplicated corpora raise ``min_len`` toward Lee et
    al.'s ~250 chars first, and run
    ``dedup.exact_substring_cap_report`` on the side-tagged union to
    see what a candidate cap drops before committing the pass.
    Decontam-specific note: the benchmark side is tiny, so dropped
    grams are almost always CORPUS boilerplate — a cap rarely costs
    bench-leak recall, but the report makes that check concrete."""
    from decision_tree_stuff_spark.operators.dedup import (
        exact_substring_matches,
    )

    def _guarded(df, offset: int):
        i = F.col(id_col).cast("bigint")
        checked = F.when(
            (i < 0) | (i >= _SUBSTR_SIDE_STRIDE),
            F.raise_error(
                F.concat(
                    F.lit(
                        "exact_substring_decontam: id out of [0, 2^40): "
                    ),
                    i.cast("string"),
                )
            ).cast("bigint"),
        ).otherwise(i + F.lit(offset))
        return df.select(
            checked.alias(id_col), F.col(text_col).alias(text_col)
        )

    tagged = _guarded(corpus, 0).unionByName(
        _guarded(bench, _SUBSTR_SIDE_STRIDE)
    )
    m = exact_substring_matches(
        tagged,
        id_col=id_col,
        text_col=text_col,
        min_len=min_len,
        max_df=max_df,
        auto_quantile=auto_quantile,
    )
    return m.where(
        (F.col("id_a") < _SUBSTR_SIDE_STRIDE)
        & (F.col("id_b") >= _SUBSTR_SIDE_STRIDE)
    ).select(
        F.col("id_a").alias(id_col),
        (F.col("id_b") - _SUBSTR_SIDE_STRIDE).alias("bench_id"),
        F.col("pos_a").alias("pos"),
        F.col("pos_b").alias("bench_pos"),
        "match_len",
    )


def bloom_stats(
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom-filter saturation accounting (r12 — the honest-accounting
    sibling of ``dedup.exact_substring_cap_report``): one row

      (m_bits, k, n_grams, n_set, fill_ratio, expected_fpr)

    for the filter ``bloom_bitset`` would build over this benchmark —
    ``n_set`` the EXACT count of distinct bit positions set,
    ``fill_ratio = n_set/m`` and ``expected_fpr = fill_ratio^k`` (the
    probability a never-inserted gram probes k set bits, using the
    filter's ACTUAL fill rather than the textbook e^-kn/m
    approximation). Run it before sizing ``m``/``k`` for a benchmark
    suite: a saturated filter silently converts the zero-shuffle
    decontam pass into a delete-everything pass, and this row is the
    number that says so.

    Fully distributed (no driver bitset, no collect): distinct grams
    → k Kirsch-Mitzenmacher positions → distinct count. The power is
    expanded to a fixed-order multiplication chain so the double
    arithmetic is exactly reproducible in the DuckDB twin (libm
    ``pow`` is not bit-specified; products are).
    """
    grams = token_ngrams(bench, id_col, text_col, n)
    dg = grams.select("gram").distinct()
    ng = dg.agg(F.count(F.lit(1)).alias("n_grams"))
    ns = (
        dg.select(
            F.explode(
                F.array(*_bloom_pos_cols(F.col("gram"), k, m))
            ).alias("pos")
        )
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_set"))
    )
    fill = F.col("n_set").cast("double") / F.lit(float(m))
    fpr = fill
    for _ in range(k - 1):
        fpr = fpr * fill
    return (
        ng.crossJoin(F.broadcast(ns)).select(
            F.lit(m).cast("bigint").alias("m_bits"),
            F.lit(k).cast("int").alias("k"),
            "n_grams",
            "n_set",
            F.round(fill, 6).alias("fill_ratio"),
            F.round(fpr, 6).alias("expected_fpr"),
        )
    )
