"""Byte-pair-encoding tokenizer training and encoding (E-4bpe):
Sennrich et al. 2016's subword vocabulary learner, the step a
training-data pipeline runs between corpus curation and token
counting/packing.

Representation: a segmentation is a DOUBLE-SPACE-delimited symbol
string (``'  h  e  y  '`` — two spaces at the boundaries too), so
applying a merge (a, b)→ab is one literal
``replace(seg, ' a  b ', ' ab ')``: the pattern consumes ONE of the
two spaces on each side and the replacement restores it. That
single-space margin is what makes plain ``replace`` (non-overlapping,
left-to-right, scanning resumes AFTER each substitution — the
semantics Spark's ``UTF8String.replace`` and DuckDB's ``replace``
share) exactly canonical greedy BPE application: adjacent pattern
occurrences (``the the``, ``aaaa`` under (a,a)) do not share a
delimiter, so none is skipped. A single-space scheme gets this wrong —
the trailing space of one match is the leading space of the next, and
runs under-merge. Verified against a pure-Python reference BPE in
tests/test_bpe.py.

Scale design:
  * training runs on the WORD-TYPE table (distinct word, frequency) —
    one corpus-sized shuffle builds it, after which every merge
    iteration touches only vocabulary rows (web-scale: ~10M types vs
    trillions of tokens). Per iteration: one pair-count aggregate
    (map-side combined) and a 1-row argmax collect; the segmentation
    update is a projection. Counts are integer sums, ties break
    lexicographically — training is bit-deterministic, so the DuckDB
    twin unrolls the same iterations as CTEs and matches exactly.
  * encoding is a PURE PROJECTION over documents: the doc is spaced
    per character with a ``|`` guard symbol between words (no merge
    pattern can contain the guard, so merges cannot cross word
    boundaries), the learned merges are applied in rank order as a
    chain of literal replaces, and the token array falls out of one
    split. Zero shuffles, zero joins — at 100 TB the cost is the scan.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

from decision_tree_stuff_spark.functions.text import tokens

SEP = "  "  # two spaces between adjacent symbols (and at boundaries)


def _spaced(word):
    """'abc' -> 'a  b  c  ' (every char followed by two spaces)."""
    return F.regexp_replace(word, "(.)", "$1" + SEP)


def _pattern(left: str, right: str) -> str:
    return f" {left}{SEP}{right} "


def _replacement(merged: str) -> str:
    return f" {merged} "


def bpe_train(
    docs: DataFrame,
    n_merges: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache: bool = True,
    score: str = "count",
) -> List[Tuple[int, str, str, str]]:
    """Learn ``n_merges`` merges from the corpus.

    ``score='count'`` is canonical BPE (Sennrich et al. 2016: merge
    the most frequent pair). ``score='likelihood'`` is the WordPiece
    criterion (Schuster & Nakajima 2012, the BERT tokenizer): merge
    the pair maximizing ``count(a,b) / (count(a) * count(b))`` — the
    pair whose merge most increases corpus likelihood under a unigram
    symbol model. Same segmentation mechanics, same portable merge
    table, one extra vocab-sized symbol-count aggregate per iteration.
    The ratio is exact double division of integer counts, so the
    DuckDB twin's argmax walks identical doubles — training stays
    bit-deterministic (ties break on pair-string ASC).

    Returns ``[(rank, left, right, merged), ...]`` in application
    order (rank 1 first). Stops early if no adjacent pair remains.

    ``cache=True`` persists the word-type table for the duration of
    training: each iteration's pair-count action otherwise replays the
    full corpus word count through the lazy lineage — iters extra
    corpus scans for a frame that is vocabulary-sized by construction.
    (The per-iteration replace chain still replays over the cached
    rows; that is vocab-sized work and cheap.)
    """
    assert score in ("count", "likelihood"), score
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
        .select(
            F.concat(F.lit(SEP), _spaced(F.col("word"))).alias("seg"), "f"
        )
    )
    if cache:
        from pyspark import StorageLevel

        words = words.persist(StorageLevel.MEMORY_AND_DISK)
    merges: List[Tuple[int, str, str, str]] = []
    cur = words
    for rank in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("seg")), SEP)
        pairs = F.expr(
            "transform(slice(__s, 1, greatest(size(__s) - 1, 0)),"
            f" (x, i) -> concat(x, '{SEP}', element_at(__s, i + 2)))"
        )
        pc = (
            cur.select(F.col("f"), syms.alias("__s"))
            .select(F.col("f"), F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("f").alias("c"))
        )
        if score == "likelihood":
            sc = (
                cur.select(F.col("f"), syms.alias("__s"))
                .select(F.col("f"), F.explode(F.col("__s")).alias("sym"))
                .groupBy("sym")
                .agg(F.sum("f").alias("cs"))
            )
            pc = (
                pc.withColumn("__l", F.split(F.col("pair"), SEP)[0])
                .withColumn("__r", F.split(F.col("pair"), SEP)[1])
                .join(
                    sc.select(
                        F.col("sym").alias("__l"), F.col("cs").alias("cl")
                    ),
                    "__l",
                )
                .join(
                    sc.select(
                        F.col("sym").alias("__r"), F.col("cs").alias("cr")
                    ),
                    "__r",
                )
            )
            order = [
                (
                    F.col("c").cast("double")
                    / (F.col("cl") * F.col("cr"))
                ).desc(),
                F.col("pair").asc(),
            ]
        else:
            order = [F.col("c").desc(), F.col("pair").asc()]
        top = pc.orderBy(*order).limit(1).collect()
        if not top:
            break
        pair = top[0]["pair"]
        left, right = pair.split(SEP, 1)
        merged = left + right
        merges.append((rank, left, right, merged))
        cur = cur.select(
            F.replace(
                F.col("seg"),
                F.lit(_pattern(left, right)),
                F.lit(_replacement(merged)),
            ).alias("seg"),
            "f",
        )
    if cache:
        words.unpersist()
    return merges


def bpe_merge_table(
    spark, merges: List[Tuple[int, str, str, str]]
) -> DataFrame:
    """The portable (rank, left, right, merged) model table."""
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string"
    )


def _encode_by_type(
    docs: DataFrame,
    words_arr,
    id_col: str,
    text_col: str,
    encode_types,
    n_col: str,
) -> DataFrame:
    """Shared distinct-word-types encode plan (r12, the 100 TB mode
    for the tokenizer APPLY ops): the expensive per-word program (the
    Viterbi DP / the BPE replace chain) runs once per distinct word
    TYPE, not once per occurrence — types are 2–3 orders fewer than
    occurrences at corpus scale (Heaps' law), so the hot expression
    does proportionally less work.

    Plan: posexplode occurrences (shuffle-free) → ``distinct`` over
    the type column (a shuffle bounded by partition-locally-deduped
    TYPES, never occurrences) → ``encode_types`` projects the
    per-type piece array over that table → join back onto
    occurrences → one per-doc regroup (the only guaranteed
    occurrence-sized exchange) reassembles ``(pos, pieces)`` in word
    order. Identical output to the per-occurrence projection, pinned
    by differential tests.

    No broadcast HINT on the join (r13, advice fix): the type table
    is vocabulary-sized and unbounded — Heaps' law says *sublinear*,
    not *small* (hundreds of millions of types at 100 TB), so a
    forced broadcast would pin a driver/executor-OOM risk into every
    caller's plan at exactly the scale this mode targets. AQE picks
    broadcast at runtime when the encoded type table is actually
    under the threshold (it is, in every test/bench corpus here) and
    falls back to a shuffle join when it is not — the same reasoning
    as ``hist_buckets_auto_grouped``'s bounds join.

    ``encode_types``: fn(types_df with column ``__word``) →
    df(``__word``, ``__toks`` array<string>).
    """
    base = docs.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        F.when(F.col(text_col).isNotNull(), words_arr).alias("__words"),
    )
    occ = (
        base.select(F.col(id_col), F.posexplode(F.col("__words")))
        .withColumnRenamed("pos", "__pos")
        .withColumnRenamed("col", "__w")
    )
    types = occ.select(F.col("__w").alias("__word")).distinct()
    enc_t = encode_types(types).select("__word", "__toks")
    joined = occ.join(enc_t, occ["__w"] == enc_t["__word"])
    per_doc = joined.groupBy(id_col).agg(
        F.sum(F.size("__toks")).cast("int").alias("__np"),
        F.array_sort(
            F.collect_list(F.struct("__pos", "__toks"))
        ).alias("__ord"),
    )
    enc_str = F.array_join(
        F.transform(
            F.col("__ord"), lambda x: F.array_join(x["__toks"], " ")
        ),
        " ",
    )
    return (
        base.select(id_col, "__text")
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("__text").isNull(), F.lit(None).cast("int"))
            .otherwise(F.coalesce(F.col("__np"), F.lit(0)))
            .alias(n_col),
            F.when(F.col("__text").isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(enc_str, F.lit("")))
            .alias("encoded"),
        )
    )


def bpe_encode(
    docs: DataFrame,
    merges: List[Tuple[int, str, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct_types: bool = False,
) -> DataFrame:
    """Encode every document with a learned merge list — ONE
    shuffle-free projection.

    The document is spaced per character with a ``'|'`` guard symbol
    between words, the merges are applied in rank order as literal
    replaces, and the BPE tokens are the non-guard symbols of the
    final segmentation.

    Returns (id, n_tokens_bpe, encoded) where ``encoded`` is the
    space-joined token sequence. Null text propagates nulls; empty
    text encodes to 0 tokens and an empty string.

    ``distinct_types`` (r12): run the replace chain once per DISTINCT
    word type and join back (AQE-chosen strategy; see
    ``_encode_by_type``). Crossover measured at sf0.1 (r13,
    SCALING_r13.md §4): per-occurrence wins at 12 merges (1.84 vs
    2.63 s — the chain is cheaper than the regroup), distinct_types
    wins by 48 merges (2.03 vs 2.97 s) and the gap grows with the
    merge-list length — real vocabularies (thousands of merges)
    want distinct_types —
    sound because merges never cross the ``'|'`` word guard, so the
    per-word segmentation equals the per-document one (pinned by
    tests). Identical output in both modes.
    """
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    if distinct_types:
        def _encode_word_types(types):
            wseg = F.concat(F.lit(SEP), _spaced(F.col("__word")))
            for _, left, right, merged in merges:
                wseg = F.replace(
                    wseg,
                    F.lit(_pattern(left, right)),
                    F.lit(_replacement(merged)),
                )
            wtoks = F.filter(
                F.split(F.trim(wseg), SEP),
                lambda t: (t != "") & (t != "|"),
            )
            return types.select("__word", wtoks.alias("__toks"))

        return _encode_by_type(
            docs,
            toks,
            id_col,
            text_col,
            _encode_word_types,
            n_col="n_tokens_bpe",
        )
    seg = F.concat(
        F.lit(SEP),
        F.array_join(F.transform(toks, lambda w: _spaced(w)), "|" + SEP),
    )
    for _, left, right, merged in merges:
        seg = F.replace(
            seg, F.lit(_pattern(left, right)), F.lit(_replacement(merged))
        )
    out_toks = F.filter(
        F.split(F.trim(seg), SEP),
        lambda t: (t != "") & (t != "|"),
    )
    return docs.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("int"))
        .otherwise(F.size(out_toks))
        .alias("n_tokens_bpe"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(F.array_join(out_toks, " "))
        .alias("encoded"),
    )

# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer trainer — r11.
# ---------------------------------------------------------------------------

MICRO = 1_000_000.0  # expected counts are accumulated in micro-units


def _unigram_prob_map(probs: dict):
    """The current piece→probability table as ONE bound map column
    (bound once; an inline literal map would be re-created per HOF
    element — the CreateArray-per-lambda-call pitfall)."""
    items = []
    for piece in sorted(probs):
        items.append(F.lit(piece))
        items.append(F.lit(float(probs[piece])))
    return F.create_map(*items)


def _unigram_estep(words: DataFrame, probs: dict, P: int) -> DataFrame:
    """One soft-EM E-step over the word-type table: expected piece
    counts in exact micro-unit BIGINTs.

    Forward/backward are ``F.aggregate`` folds (linear, one pass —
    the wide-column DP would hit the expression-chain cliff) whose
    per-step sums are written with a FIXED term order (k = 1..P,
    left-to-right additions) and whose probabilities are plain
    double literals: IEEE +,*,/ are exactly specified, so the DuckDB
    twin folding the identical expressions produces bit-identical
    alphas/betas — the e9c/LR portability contract. The only
    cross-row aggregation is the final per-piece SUM of
    ``round(((alpha·p·beta)/Z)·f·1e6)`` BIGINTs: integer sums are
    order-free under any partitioning, the same fixed-point trick as
    ``classifier.lr_fit``.
    """
    pm = _unigram_prob_map(probs)
    w = F.col("word")
    n = F.col("__n")

    def plook(s):
        return F.coalesce(
            F.try_element_at(F.col("__pm"), s), F.lit(0.0)
        )

    def alpha_step(acc, i):
        terms = None
        for k in range(1, P + 1):
            t = F.when(
                i - F.lit(k) >= 0,
                F.element_at(acc, i - F.lit(k) + 1)
                * plook(F.substring(w, i - F.lit(k) + 1, F.lit(k))),
            ).otherwise(F.lit(0.0))
            terms = t if terms is None else terms + t
        return F.concat(acc, F.array(terms))

    # betas are built end-first: __b = [beta_n, beta_{n-1}, ... beta_0],
    # i.e. element d+1 is beta at distance d from the word end
    def beta_step(acc, j):
        terms = None
        for k in range(1, P + 1):
            t = F.when(
                j + F.lit(k) <= n,
                plook(F.substring(w, j + 1, F.lit(k)))
                * F.element_at(acc, n - (j + F.lit(k)) + 1),
            ).otherwise(F.lit(0.0))
            terms = t if terms is None else terms + t
        return F.concat(acc, F.array(terms))

    base = words.select(
        "word", "f", F.length("word").alias("__n"), pm.alias("__pm")
    )
    bound = base.select(
        "word",
        "f",
        "__n",
        "__pm",
        F.aggregate(
            F.sequence(F.lit(1), n), F.array(F.lit(1.0)), alpha_step
        ).alias("__a"),
        F.aggregate(
            F.sequence(n - 1, F.lit(0), F.lit(-1)),
            F.array(F.lit(1.0)),
            beta_step,
        ).alias("__b"),
    )
    z = F.element_at(F.col("__a"), n + 1)
    fd = F.col("f").cast("double")

    def edge(j, k):
        piece = F.substring(w, j + 1, k)
        em = F.when(
            z > 0.0,
            F.round(
                (
                    (
                        (
                            (F.element_at(F.col("__a"), j + 1) * plook(piece))
                            * F.element_at(F.col("__b"), n - (j + k) + 1)
                        )
                        / z
                    )
                    * fd
                )
                * F.lit(MICRO),
                0,
            ),
        ).otherwise(F.lit(0.0))
        return F.struct(piece.alias("piece"), em.alias("em"))

    edges = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda j: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(P), n - j)),
                lambda k: edge(j, k),
            ),
        )
    )
    ex = bound.select("__pm", F.explode(edges).alias("e"))
    return (
        ex.where(
            F.try_element_at(
                F.col("__pm"), F.col("e.piece")
            ).isNotNull()
        )
        .groupBy(F.col("e.piece").alias("piece"))
        .agg(F.sum(F.col("e.em").cast("bigint")).alias("em"))
    )


def unigram_lm_train(
    docs: DataFrame,
    vocab_size: int = 40,
    seed_size: int = 60,
    max_piece_len: int = 3,
    max_word_len: int = 8,
    em_iters: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache: bool = True,
):
    """Unigram-LM subword trainer (Kudo 2018 — the SentencePiece
    algorithm; r11, completing the BPE / WordPiece / Unigram trainer
    triple): fit piece probabilities by soft EM over the word-type
    table, then keep the ``vocab_size`` highest-expected-count pieces.

    Faithful shape, bounded configuration:

    * **seed** — candidate vocabulary = every single character plus
      the ``seed_size`` most frequent substrings of length
      2..``max_piece_len`` (frequency = Σ word-freq × occurrences;
      ties lexicographic). Initial p ∝ seed frequency.
    * **E-step** — exact forward-backward over each word type's
      segmentation lattice (``_unigram_estep``): expected count of
      piece g = Σ_edges α(j)·p(g)·β(j+k)/Z, accumulated in
      micro-unit BIGINTs (order-free integer sums; per-edge
      rounding — the LR fixed-point contract).
    * **M-step** — p(g) = count(g)/Σcounts, one exact double
      division of integers, computed driver-side like ``bpe_train``'s
      argmax (the model table is vocabulary-sized by construction).
    * **prune** — after ``em_iters`` rounds, rank by the LAST
      E-step's expected counts (desc, piece asc) and keep the top
      ``vocab_size``. (Production SentencePiece interleaves
      prune/refit rounds; the single final prune keeps the driver
      query's unrolled SQL twin tractable and is the documented
      difference.)

    Scale: like ``bpe_train``, everything after the one corpus-sized
    word-count shuffle is vocabulary-sized work — each EM iteration
    is ONE aggregate over word types (per-word O(len·P) expression
    math, no joins) plus a bounded model collect. Words are truncated
    to ``max_word_len`` chars (the lattice cost knob; SentencePiece's
    own trainer caps sentence/word lengths the same way).

    Training is bit-deterministic by arithmetic (fixed fold orders,
    IEEE +,*,/ only — no transcendentals), so the DuckDB twin
    unrolling the same iterations matches exactly, including the
    micro counts. Returns ``[(rank, piece, count_micro), ...]``.
    """
    if max_piece_len < 1 or max_word_len < 1:
        raise ValueError("max_piece_len and max_word_len must be >= 1")
    if em_iters < 1:
        raise ValueError("em_iters must be >= 1")
    P = int(max_piece_len)
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .where(F.col("tok") != "")
        .select(F.substring("tok", 1, max_word_len).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    if cache:
        from pyspark import StorageLevel

        words = words.persist(StorageLevel.MEMORY_AND_DISK)
    subs = words.select(
        "f",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(P), F.length("word") - i + 1
                            ),
                        ),
                        lambda k: F.substring(F.col("word"), i, k),
                    ),
                )
            )
        ).alias("piece"),
    )
    cnts = subs.groupBy("piece").agg(F.sum("f").alias("cnt"))
    singles = cnts.where(F.length("piece") == 1)
    multis = (
        cnts.where(F.length("piece") >= 2)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(seed_size)
    )
    seed = {
        r["piece"]: int(r["cnt"])
        for r in singles.unionAll(multis).collect()
    }
    total = sum(seed.values())
    if total == 0:
        if cache:
            words.unpersist()
        return []
    probs = {g: c / total for g, c in seed.items()}
    counts = {}
    for _ in range(em_iters):
        em = {
            r["piece"]: int(r["em"])
            for r in _unigram_estep(words, probs, P).collect()
        }
        counts = {g: em.get(g, 0) for g in probs}
        t = sum(counts.values())
        if t <= 0:
            break
        probs = {g: c / t for g, c in counts.items()}
    if cache:
        words.unpersist()
    ranked = sorted(
        (g for g, c in counts.items() if c > 0),
        key=lambda g: (-counts[g], g),
    )[:vocab_size]
    return [(r + 1, g, counts[g]) for r, g in enumerate(ranked)]


def unigram_table(spark, pieces) -> DataFrame:
    """The portable (rank, piece, count_micro) model table."""
    return spark.createDataFrame(
        pieces, "rank int, piece string, count_micro bigint"
    )


#: Fallback probability for out-of-vocabulary SINGLE characters during
#: Viterbi encode — an exact power of two so every product is the same
#: double on every engine. Multi-char OOV pieces get 0 (never chosen:
#: the single-char fallback path always has positive score).
UNIGRAM_UNK_P = 2.0 ** -40


def unigram_encode(
    docs: DataFrame,
    pieces,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 3,
    max_word_len: int = 8,
    distinct_types: bool = False,
) -> DataFrame:
    """Viterbi segmentation under a trained unigram LM (Kudo 2018 §3 —
    the SentencePiece ENCODE step; r11, the apply path the trainer
    triple was missing: ``bpe_encode`` applies merges, WordPiece
    shares it, this applies piece probabilities).

    Per word: the max-probability segmentation by the textbook DP
    ``best[i] = max_k best[i-k] · p(w[i-k+1..i])`` (k ≤
    ``max_piece_len``), as ONE shuffle-free projection — the DP is an
    ``F.aggregate`` fold building (score, back-pointer) pairs and the
    backtrack a second bounded fold, the ``unigram_lm_train`` lattice
    machinery reused for argmax instead of sums. p(g) =
    count_micro/Σcount_micro over the model table (exact integer
    division); OOV single chars fall back to ``UNIGRAM_UNK_P`` so
    every word segments. DETERMINISTIC tie rule, required for the
    enumeration oracle to match: on equal scores the LONGER piece
    wins, applied right-to-left (the DP's natural greedy-from-end
    order) — equivalently, among max-score segmentations, the one
    whose reversed piece-length sequence is lexicographically
    largest. Words are truncated to ``max_word_len`` chars (the same
    lattice bound as the trainer; documented).

    Returns (id, n_pieces, encoded) like ``bpe_encode``. Null text
    propagates nulls; empty text encodes to 0 pieces.

    ``distinct_types`` (r12, the 100 TB mode): run the DP once per
    DISTINCT word TYPE instead of once per word OCCURRENCE, then
    join the (type → pieces) map back onto occurrences (AQE picks
    broadcast when the vocab is actually small) and
    reassemble per document. Word types are 2–3 orders of magnitude
    fewer than occurrences at corpus scale (Heaps' law), so the DP —
    the expensive part — does proportionally less work; the price is
    two bounded shuffles (the distinct over partition-locally-deduped
    types, and the per-doc regroup of (pos, pieces) rows) where the
    default is one shuffle-free projection. Output is IDENTICAL in
    both modes (pinned by tests and the exhaustive-enumeration
    oracle); pick per-occurrence for small/streaming inputs where
    plan simplicity wins, distinct_types when occurrences ≫ types.
    """
    total = float(sum(c for _, _, c in pieces))
    probs = (
        {g: c / total for _, g, c in pieces} if total > 0 else {}
    )
    P = int(max_piece_len)

    def plook(s):
        v = F.try_element_at(F.col("__pm"), s)
        return F.coalesce(
            v,
            F.when(F.length(s) == 1, F.lit(UNIGRAM_UNK_P)).otherwise(
                F.lit(0.0)
            ),
        )

    def dp_array(w):
        n = F.length(w)

        def step(acc, i):
            best = None
            for k in range(1, P + 1):
                cand_s = F.when(
                    i - F.lit(k) >= 0,
                    F.element_at(acc, i - F.lit(k) + 1)["s"]
                    * plook(F.substring(w, i - F.lit(k) + 1, F.lit(k))),
                ).otherwise(F.lit(-1.0))
                cand = F.struct(cand_s.alias("s"), F.lit(k).alias("k"))
                if best is None:
                    best = cand
                else:
                    # k ascends, so >= makes the LONGER piece win ties
                    best = F.when(cand["s"] >= best["s"], cand).otherwise(
                        best
                    )
            return F.concat(acc, F.array(best))

        return F.aggregate(
            F.sequence(F.lit(1), n),
            F.array(F.struct(F.lit(1.0).alias("s"), F.lit(0).alias("k"))),
            step,
        )

    def backtrack(w, d):
        # d is a LAMBDA VARIABLE holding the word's finished DP array
        # — inlining the dp expression here instead would re-run the
        # whole DP once per backtrack step (measured 83 s -> 8 s at
        # sf0.1 for this staging)
        def back(acc, _):
            pos = acc["pos"]
            k = F.element_at(d, pos + 1)["k"]
            return F.when(pos <= 0, acc).otherwise(
                F.struct(
                    (pos - k).alias("pos"),
                    F.concat(
                        F.array(F.substring(w, pos - k + 1, k)),
                        acc["toks"],
                    ).alias("toks"),
                )
            )

        return F.aggregate(
            F.sequence(F.lit(1), F.length(w)),
            F.struct(
                F.length(w).cast("int").alias("pos"),
                F.array().cast("array<string>").alias("toks"),
            ),
            back,
        )["toks"]

    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    capped = F.transform(
        toks, lambda t: F.substring(t, 1, max_word_len)
    )
    if distinct_types:
        seg_of = lambda w: F.element_at(  # noqa: E731
            F.zip_with(
                F.array(w), F.transform(F.array(w), dp_array), backtrack
            ),
            1,
        )
        return _encode_by_type(
            docs,
            capped,
            id_col,
            text_col,
            lambda types: types.select(
                "__word", _unigram_prob_map(probs).alias("__pm")
            ).select(
                "__word", seg_of(F.col("__word")).alias("__toks")
            ),
            n_col="n_pieces",
        )
    # stage the word array as a COLUMN (referenced twice below —
    # CollapseProject keeps multiply-referenced non-cheap aliases
    # staged), then compute each word's DP array ONCE and hand it to
    # the backtrack as a zip_with lambda variable: Catalyst does not
    # CSE across lambda boundaries, so any inline sharing re-runs the
    # DP per reference
    staged = docs.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        _unigram_prob_map(probs).alias("__pm"),
        F.when(F.col(text_col).isNotNull(), capped).alias("__words"),
    ).select(
        id_col,
        "__text",
        F.zip_with(
            F.col("__words"),
            F.transform(F.col("__words"), dp_array),
            backtrack,
        ).alias("__enc"),
    )
    return staged.select(
        id_col,
        F.when(
            F.col("__text").isNull(), F.lit(None).cast("int")
        )
        .otherwise(F.size(F.flatten(F.col("__enc"))))
        .alias("n_pieces"),
        F.when(F.col("__text").isNull(), F.lit(None).cast("string"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.col("__enc"), lambda a: F.array_join(a, " ")
                ),
                " ",
            )
        )
        .alias("encoded"),
    )


def unigram_encode_py(
    text, pieces, max_piece_len: int = 3, max_word_len: int = 8
):
    """Pure-Python differential twin of ``unigram_encode`` for one
    document: same probs, same UNK fallback, same DP and tie rule.
    Returns the list of pieces (all words concatenated in order)."""
    import re as _re

    total = float(sum(c for _, _, c in pieces))
    probs = {g: c / total for _, g, c in pieces} if total > 0 else {}
    P = int(max_piece_len)

    def plook(s):
        if s in probs:
            return probs[s]
        return UNIGRAM_UNK_P if len(s) == 1 else 0.0

    out = []
    norm = _re.sub(r"\s+", " ", text.lower()).strip()
    for word in [w for w in norm.split(" ") if w][: 10 ** 9]:
        w = word[:max_word_len]
        n = len(w)
        best = [(1.0, 0)] + [(-1.0, 0)] * n
        for i in range(1, n + 1):
            bs, bk = -1.0, 0
            for k in range(1, P + 1):
                if i - k >= 0:
                    s = best[i - k][0] * plook(w[i - k:i])
                    if s >= bs:  # >= with ascending k: longer wins ties
                        bs, bk = s, k
            best[i] = (bs, bk)
        toks, pos = [], n
        while pos > 0:
            k = best[pos][1]
            toks.insert(0, w[pos - k:pos])
            pos -= k
        out += toks
    return out
