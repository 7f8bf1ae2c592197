"""Deduplication operators over the ``documents`` table (E-1, E-2).

Four families, all shuffle-planned for 100 TB:

* exact: one hash groupBy on the dedup key — map-side combine makes
  the shuffle proportional to distinct keys, not rows.
* n-gram Jaccard: exact threshold join via AllPairs/PPJoin prefix
  filtering — docs only meet on their rarest-token prefixes, so the
  join fans out on Σ prefix-df² instead of Σ df²; blocking (lang,
  length bucket) caps pair formation on top.
* MinHash + LSH banding: signature per doc (narrow, one groupBy),
  band-bucket join for candidates — the classic sub-quadratic near-dup
  path; Jaccard is estimated from signature agreement.
* SimHash: 64-bit sign fingerprint per doc via one groupBy with 64
  conditional sums; near-dups via 16-bit band blocking + hamming
  verification (``bit_count(a XOR b)``).

Exact and Jaccard are ANSI-SQL-expressible (DuckDB oracle ✔). MinHash
supports two hash families: xxhash64 (prod default; rows-only check)
and md5 (byte-identical in DuckDB → full value oracle). SimHash
depends on xxhash64 bit patterns and stays rows-only.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F

from decision_tree_stuff_spark.functions.text import tokens


def exact_dedup(
    df: DataFrame, key_cols: List[str], id_col: str
) -> DataFrame:
    """E-1: exact dedup — keep the smallest id per duplicate group.

    ``dropDuplicates`` keeps an *arbitrary* row per key (first seen per
    partition) — nondeterministic under shuffle, so we use min(id):
    deterministic, oracle-checkable, same single shuffle. Returns
    (key_cols..., id_col, dup_count).
    """
    return df.groupBy(*key_cols).agg(
        F.min(F.col(id_col)).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (id, token) pairs — the set representation. The input
    is spread first: regex tokenization dominates the scan stage, and
    a sub-rowgroup bench file is one split (spread_small is a guarded
    no-op on real multi-split tables)."""
    from decision_tree_stuff_spark.operators import spread_small

    return (
        spread_small(docs)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: Optional[List[str]] = None,
    threshold: float = 0.5,
    max_df: Optional[int] = None,
    prefix_filter: bool = True,
    key: str = "text",
    cache_docsets: bool = True,
) -> DataFrame:
    """E-2a: exact token-set Jaccard near-dup pairs within blocks.

    Default plan — AllPairs/PPJoin prefix filtering (Bayardo et al.,
    WWW'07; Xiao et al., WWW'08), *exact* for threshold joins:

    1. tokenize → distinct (id, token); optional ``max_df`` hot-token
       cap (see below); optional block columns.
    2. global token rarity = document frequency (one small groupBy).
    3. per doc: tokens sorted rarest-first (one total order: df, then
       token); prefix = first ``n − ⌈t·n⌉ + 1`` tokens. Any pair with
       J ≥ t MUST share a prefix token under a shared total order —
       sharing only non-prefix (hot) tokens cannot reach the
       threshold, so joining on prefix tokens loses nothing.
    4. candidate join on (prefix token [+ blocks]) with a size filter
       (|A| ≥ t·|B| and vice versa — necessary for J ≥ t) and the
       PPJoin positional filter (overlap reachable from the meeting
       positions must cover the J ≥ t overlap requirement — halves
       the join output before the distinct on dense vocabularies).
    5. verify each candidate once: common = |array_intersect| of the
       full token arrays; J = common / (|A| + |B| − common) ≥ t.

    Scale: the join only fans out on *rare* tokens — Σ prefix-df²
    instead of Σ df² — and the heavy common-token count groupBy of the
    naive plan (quadratic join output) is replaced by one array
    intersection per surviving candidate. This is the published
    100 TB-safe shape for exact threshold joins; measured ~3× on the
    sf0.1 corpus (dense 31-word vocab — the prefix join's worst case).

    ``max_df`` is the hot-token guard: tokens appearing in more than
    ``max_df`` documents are dropped from the set representation
    entirely (prefix path: a filter on the SAME df aggregate the
    rarity ranking uses — zero extra passes; naive path: one extra
    groupBy + broadcast anti-join). Without it a
    single token with document frequency d still contributes d·(d−1)/2
    candidates *when it lands in prefixes* (e.g. all-stopword docs);
    near-dup signal lives in the rare tokens anyway. Jaccard is then
    over the capped sets, which the SQL oracle mirrors exactly.

    ``prefix_filter=False`` keeps the naive token self-join — same
    output by construction (differentially tested), used by the
    oracle-parity A/B test.

    ``key='xxhash64'`` replaces each token with its 8-byte xxhash64
    right after tokenization, so EVERY downstream structure — the df
    table, the prefix-join key, and the per-doc sorted token arrays
    the verify step carries through a shuffle (``collect_list`` in
    ``_jaccard_prefix_join``) — holds fixed-width bigints instead of
    strings. At 100 TB corpus scale with a huge vocabulary that
    verify shuffle is the memory hot spot; this is the same
    narrow-key trade ``span_dedup`` documents (64-bit collisions are
    the standard accepted risk, and a collision only ever MERGES two
    tokens, nudging one Jaccard value). Jaccard math is unchanged:
    set sizes and intersections are over distinct hashes. The shared
    total order becomes (df, token_hash) — any deterministic total
    order preserves prefix-filter exactness. Differentially tested
    against ``key='text'``.

    ``cache_docsets`` (r13, the 100 TB scan knob): the per-doc sorted
    token-set table feeds FOUR consumers (both prefix-join sides and
    both verify sides), and Spark's exchange reuse does not fire
    across their differing projections — the executed plan rescans
    the corpus and replays tokenize→df-join→collect_list once per
    consumer (8 parquet scans at sf0.001, measured). r13 measured a WASH at
    bench scale (4.5 s either way at sf0.1) and kept the default
    False/lazy; the r14 optimization round re-measured on the
    current tree and ``True`` now WINS consistently (same-session
    interleaved min-of-2 at sf0.1: False 6.33/8.09 s vs True
    5.52/4.98 s over two rounds, OPTIMIZATION_r14.md), and at corpus
    scale the 4× text-column rescan dominates regardless — so
    ``True`` is now the default. ``True`` persists ``docsets`` (MEMORY_AND_DISK, lineage kept
    for executor-loss recovery — the ``bpe_train`` pattern) so the
    corpus is scanned ONCE. The persisted frame's lifecycle follows
    the returned DataFrame (r14: ``unpersist_when_dropped`` — the
    cache is released when the result is garbage-collected, so
    repeated calls don't accumulate entries); output is
    bit-identical (tested).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold,
    jaccard rounded to 6dp for float-stable comparison.
    """
    if key not in ("text", "xxhash64"):
        raise ValueError(f"key must be 'text' or 'xxhash64', got {key!r}")
    block_cols = block_cols or []
    if prefix_filter:
        # r7 stage cut: the per-doc token SET is built ARRAY-LOCALLY
        # (array_distinct over the tokenizer output) — the old
        # distinct() over exploded (id, token) rows was a full extra
        # shuffle, and block columns now ride along from the scan
        # instead of joining back. One document-frequency aggregation
        # serves BOTH the hot-token cap and the prefix rarity ranking
        # (they group on the same key; previously two passes): capped
        # tokens are simply the ones missing from the filtered df
        # table, dropped by the inner rarity join.
        arr = F.array_distinct(
            F.filter(tokens(F.col(text_col)), lambda t: t != F.lit(""))
        )
        if key == "xxhash64":
            # single-arg lambda, NOT the bare F.xxhash64 reference: a
            # varargs callable gets transform's (element, index) pair
            # and would silently hash (token, position)
            arr = F.array_distinct(F.transform(arr, lambda t: F.xxhash64(t)))
        from decision_tree_stuff_spark.operators import spread_small

        exploded = spread_small(docs).select(
            F.col(id_col), *block_cols, F.explode(arr).alias("token")
        )
        tdf = exploded.groupBy("token").agg(F.count(F.lit(1)).alias("tdf"))
        if max_df is not None:
            tdf = tdf.where(F.col("tdf") <= max_df)
        ranked = exploded.join(tdf, "token")
        return _jaccard_prefix_join(
            ranked, id_col, block_cols, threshold,
            cache_docsets=cache_docsets,
        )
    toks = _doc_tokens(docs, id_col, text_col)
    if key == "xxhash64":
        toks = toks.withColumn("token", F.xxhash64(F.col("token")))
    if max_df is not None:
        hot = (
            toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("token")
        )
        toks = toks.join(F.broadcast(hot), "token", "left_anti")
    if block_cols:
        blocks = docs.select(F.col(id_col), *block_cols)
        toks = toks.join(blocks, id_col)
    return _jaccard_allpairs_naive(toks, id_col, block_cols, threshold)


def _jaccard_verify(cand: DataFrame, docsets: DataFrame, id_col: str,
                    threshold: float) -> DataFrame:
    """Join candidate pairs to per-doc token arrays and keep pairs with
    exact Jaccard ≥ threshold. ``docsets`` = (id, toks array, n)."""
    va = docsets.select(
        F.col(id_col).alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("na"),
    )
    vb = docsets.select(
        F.col(id_col).alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("nb"),
    )
    common = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                common / (F.col("na") + F.col("nb") - common).cast("double"), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _jaccard_prefix_join(ranked: DataFrame, id_col: str,
                         block_cols: List[str], threshold: float,
                         cache_docsets: bool = False) -> DataFrame:
    """Prefix-filtered exact Jaccard join (see ngram_jaccard_pairs).
    ``ranked`` = one row per (id, token [+ blocks]) already decorated
    with the global document frequency ``tdf`` (the caller computes it
    once and reuses it for the hot-token cap)."""
    # sort_array over struct(tdf, token) = the shared total order
    # (rarest document-frequency first, token string as tie-break)
    docsets = (
        ranked.groupBy(id_col, *block_cols)
        .agg(F.sort_array(F.collect_list(F.struct("tdf", "token"))).alias("st"))
        .select(
            F.col(id_col),
            *block_cols,
            F.col("st").getField("token").alias("toks"),
            F.size("st").alias("n"),
        )
    )
    if cache_docsets:
        from pyspark import StorageLevel

        docsets = docsets.persist(StorageLevel.MEMORY_AND_DISK)
    # prefix length n − ⌈t·n⌉ + 1; the 1e-9 slack keeps a float t·n
    # that lands ON an integer from ceil-ing one too high (a too-long
    # prefix is safe, a too-short one drops true pairs)
    plen = (
        F.col("n")
        - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)).cast("int")
        + 1
    )
    pref = docsets.select(
        F.col(id_col),
        F.col("n"),
        *block_cols,
        F.posexplode(F.slice(F.col("toks"), F.lit(1), plen)).alias(
            "pos", "token"
        ),
    )
    a = pref.select(
        F.col(id_col).alias("id_a"),
        F.col("n").alias("pna"),
        F.col("pos").alias("pos_a"),
        F.col("token"),
        *[F.col(c).alias(f"a_{c}") for c in block_cols],
    )
    b = pref.select(
        F.col(id_col).alias("id_b"),
        F.col("n").alias("pnb"),
        F.col("pos").alias("pos_b"),
        F.col("token"),
        *[F.col(c).alias(f"b_{c}") for c in block_cols],
    )
    # size filter: J ≥ t forces t·|B| ≤ |A| (and symmetrically) —
    # prunes candidates before the distinct
    cond = [
        a["token"] == b["token"],
        a["id_a"] < b["id_b"],
        a["pna"] >= F.lit(threshold) * b["pnb"] - F.lit(1e-9),
        b["pnb"] >= F.lit(threshold) * a["pna"] - F.lit(1e-9),
        # PPJoin POSITIONAL filter (Xiao et al., WWW'08 §3.2): J ≥ t
        # needs overlap α = ⌈t/(1+t)·(|A|+|B|)⌉; a join row meeting on
        # the shared token at 0-based positions (pos_a, pos_b) bounds
        # the overlap by 1 + min(|A|−pos_a−1, |B|−pos_b−1) — the
        # common tokens at or after this one in the shared total
        # order. Safe for every valid pair: its FIRST common token's
        # row has all α common tokens at later-or-equal positions on
        # both sides, so that row always survives. On a dense
        # vocabulary (prefixes stay hot) this cuts the join output
        # several-fold before the distinct — positions are already in
        # hand from the prefix explode, the bound is one comparison.
        F.lit(1)
        + F.least(
            a["pna"] - a["pos_a"] - 1, b["pnb"] - b["pos_b"] - 1
        )
        >= F.ceil(
            F.lit(threshold / (1.0 + threshold))
            * (a["pna"] + b["pnb"])
            - F.lit(1e-9)
        ),
    ]
    for c in block_cols:
        cond.append(F.col(f"a_{c}") == F.col(f"b_{c}"))
    cand = a.join(b, cond).select("id_a", "id_b").distinct()
    out = _jaccard_verify(cand, docsets, id_col, threshold)
    if cache_docsets:
        # r14 advice: tie the persisted docsets' lifecycle to the
        # returned DataFrame (the minhash pattern) — repeated calls in
        # a long-lived session no longer accumulate MEMORY_AND_DISK
        # entries until a whole-session clearCache.
        from decision_tree_stuff_spark.utils import unpersist_when_dropped

        out = unpersist_when_dropped(out, docsets)
    return out


def _jaccard_allpairs_naive(toks: DataFrame, id_col: str,
                            block_cols: List[str], threshold: float) -> DataFrame:
    """Naive plan: token self-join → count common per pair → join
    sizes. Join output is Σ df² rows — kept only as the differential
    baseline for the prefix plan."""
    # three consumers (sizes + both self-join branches) — no persist
    # needed: Catalyst's ReusedExchange dedups the identical shuffle
    # subplans (verified: persisting was a net loss at sf0.1)
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))

    a = toks.select(
        F.col(id_col).alias("id_a"),
        F.col("token"),
        *[F.col(c).alias(f"a_{c}") for c in block_cols],
    )
    b = toks.select(
        F.col(id_col).alias("id_b"),
        F.col("token"),
        *[F.col(c).alias(f"b_{c}") for c in block_cols],
    )
    cond = [a["token"] == b["token"], a["id_a"] < b["id_b"]]
    for c in block_cols:
        cond.append(F.col(f"a_{c}") == F.col(f"b_{c}"))
    common = (
        a.join(b, cond)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )

    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tokens").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tokens").alias("nb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _band_hash_exprs(sig_cols: list, bands: int, r: int, hash_fn: str) -> list:
    """One hash Column per band over ``bands`` groups of ``r``
    signature components. md5 of the '|'-joined component strings for
    the oracle-checkable families (hex digests for md5, decimal
    bigints for md5km — BIGINT→string renders identically in both
    engines); native xxhash64 otherwise."""
    groups = [sig_cols[b * r:(b + 1) * r] for b in range(bands)]
    if hash_fn in ("md5", "md5km"):
        return [F.md5(F.concat_ws("|", *g)) for g in groups]
    return [F.xxhash64(*g) for g in groups]


def corpus_fingerprints(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The materialization target for incremental EXACT dedup: one
    distinct normalized-text fingerprint per corpus document. Persist
    this once (parquet/Delta) and feed it back via
    ``dedup_against_corpus(..., corpus_precomputed=True)`` — a daily
    100 TB pipeline then anti-joins fingerprint-vs-fingerprint and
    never re-reads, re-normalizes, or re-hashes the corpus text."""
    from decision_tree_stuff_spark.functions.text import fingerprint

    return corpus.select(
        fingerprint(F.col(text_col)).alias("fp")
    ).distinct()


def corpus_band_table(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The materialization target for incremental MINHASH dedup: the
    corpus's distinct (band, band_hash) LSH keys. A drop decision only
    needs key membership — not which corpus doc collided — so the
    distinct collapses the table to ≤ bands × |corpus| skinny rows
    (far fewer in a self-similar corpus). Persist once; new batches
    then pay signature cost for THEIR rows only. Parameters must match
    the later ``dedup_against_corpus`` call (band keys are a function
    of (num_hashes, bands, hash_fn))."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(corpus, id_col, text_col, num_hashes, hash_fn)
    hashes = _band_hash_exprs(
        [F.col("sig").getItem(i) for i in range(num_hashes)], bands, r, hash_fn
    )
    return (
        sigs.select(F.posexplode(F.array(*hashes)).alias("band", "band_hash"))
        .distinct()
    )


def dedup_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "exact",
    num_hashes: int = 64,
    bands: int = 8,
    hash_fn: str = "xxhash64",
    corpus_precomputed: bool = False,
) -> DataFrame:
    """Incremental dedup: keep only the new docs NOT already present
    in a historical corpus — the production mode for a growing
    dataset, where re-deduplicating the full corpus per batch is a
    non-starter (the corpus side is a 100 TB scan at most; nothing
    quadratic in it).

    * ``mode='exact'``: anti-join on the normalized-text md5
      fingerprint — one shuffle keyed by a 32-char hash.
    * ``mode='minhash'``: anti-join on LSH band keys — a new doc is
      dropped if ANY of its bands collides with any corpus band
      (near-dup in the LSH sense). Sub-quadratic exactly like
      ``minhash_lsh_pairs``: both sides reduce to ``bands`` skinny
      rows per doc and meet on an equi-join; no pairwise verification
      is needed for a drop decision (banding already encodes the
      similarity threshold via the (b, r) S-curve).

    ``corpus_precomputed=True`` is the production shape: ``corpus`` is
    then the MATERIALIZED table from ``corpus_fingerprints`` (exact)
    or ``corpus_band_table`` (minhash) instead of raw documents — the
    100 TB corpus is tokenized/hashed exactly once, ever, and each
    batch joins against the persisted key table.

    Returns the surviving rows of ``new_docs`` (all columns).

    Streaming: both modes run as stream-static joins with ``new_docs``
    as the stream side (see tests/test_sources.py). Exact mode is one
    LEFT ANTI join on a projected fingerprint. Minhash mode cannot use
    the batch signature aggregation on a stream (aggregation → join →
    aggregation is not an allowed streaming chain), so signatures come
    from the per-row projection (``_minhash_sig_exprs``) and the
    "ANY band collides" drop becomes ``bands`` CHAINED stream-static
    LEFT ANTI equi-joins — one per band against the corpus rows for
    that band. Same result set as batch (stream≡batch pinned); each
    join is a plain equi-join on a skinny static side, so the plan
    scales like the batch one.
    """
    from decision_tree_stuff_spark.functions.text import fingerprint

    if mode == "exact":
        if "__fp" in new_docs.columns:
            # withColumn would silently REPLACE (then drop) a caller
            # column of this name — same hazard sampling guards with
            # _check_reserved
            raise ValueError(
                "dedup_against_corpus reserves the column name '__fp'; "
                "rename it on new_docs before calling"
            )
        new_fp = new_docs.withColumn("__fp", fingerprint(F.col(text_col)))
        if corpus_precomputed:
            corpus_fp = corpus.select(F.col("fp").alias("__fp"))
        else:
            corpus_fp = corpus.select(
                fingerprint(F.col(text_col)).alias("__fp")
            )
        return new_fp.join(corpus_fp, "__fp", "left_anti").drop("__fp")
    if mode == "minhash":
        assert num_hashes % bands == 0
        r = num_hashes // bands
        if corpus_precomputed:
            corpus_bands = corpus
        else:
            corpus_bands = corpus_band_table(
                corpus, id_col, text_col, num_hashes, bands, hash_fn
            )

        if new_docs.isStreaming:
            # Per-ROW signatures as a pure projection — the batch
            # exploded-groupBy signature is not plannable on a stream
            # (agg → join → agg), but min-over-distinct-tokens per
            # component is expressible with array_min(transform(...)),
            # producing values IDENTICAL to the batch path. The token
            # array (and the md5km digest structs) are bound as real
            # columns first: Catalyst does not CSE across lambda
            # boundaries, so inline exprs would re-run the
            # normalization regex / digest once per signature
            # component (the decontam token_ngrams pitfall, ×64 here).
            toks_c, hs_c = "__dts_toks", "__dts_hs"
            reserved = [toks_c, hs_c] + [
                f"__dts_band_{b}" for b in range(bands)
            ]
            clash = [c for c in new_docs.columns if c in reserved]
            if clash:
                # same silent-replace hazard the exact branch guards
                # with '__fp'
                raise ValueError(
                    f"dedup_against_corpus reserves the column names "
                    f"{clash}; rename them on new_docs before calling"
                )
            prep = new_docs.withColumn(
                toks_c,
                F.array_distinct(
                    F.filter(tokens(F.col(text_col)), lambda t: t != "")
                ),
            )
            if hash_fn == "md5km":
                prep = prep.withColumn(
                    hs_c,
                    F.transform(
                        F.transform(F.col(toks_c), lambda t: F.md5(t)),
                        lambda d: F.struct(
                            (F.conv(F.substring(d, 1, 15), 16, 10)
                             .cast("bigint") % MINHASH_KM_P).alias("h1"),
                            (F.conv(F.substring(d, 17, 15), 16, 10)
                             .cast("bigint") % MINHASH_KM_P).alias("h2"),
                        ),
                    ),
                )
                # closure factories, NOT `lambda x, i=i`: pyspark
                # treats a two-arg lambda as an (element, index)
                # function and passes the ARRAY INDEX as the second
                # argument, silently shadowing the default
                def km_i(i):
                    return lambda x: (
                        x["h1"] + F.lit(i) * x["h2"]
                    ) % MINHASH_KM_P

                sig = [
                    F.array_min(F.transform(F.col(hs_c), km_i(i)))
                    for i in range(num_hashes)
                ]
                tmp_cols = [toks_c, hs_c]
            else:
                def comp_i(i):
                    return lambda t: _minhash_component(i, t, hash_fn)

                sig = [
                    F.array_min(F.transform(F.col(toks_c), comp_i(i)))
                    for i in range(num_hashes)
                ]
                tmp_cols = [toks_c]
            hashes = _band_hash_exprs(sig, bands, r, hash_fn)
            # null band hash for token-less docs: array_min over an
            # empty array is null per component, and md5(concat_ws)
            # would otherwise hash the EMPTY string into a real key
            # (batch semantics: such docs have no signature row, no
            # bands, and always survive — the null key never equi-
            # matches, reproducing that exactly)
            has_toks = F.size(F.col(toks_c)) > 0
            out = prep.select(
                "*",
                *[
                    F.when(has_toks, h).alias(f"__dts_band_{bi}")
                    for bi, h in enumerate(hashes)
                ],
            )
            # "ANY band collides → drop" = chained per-band LEFT ANTI
            # equi-joins (a doc survives iff it survives every band)
            for bi in range(bands):
                bcol = f"__dts_band_{bi}"
                side = corpus_bands.where(F.col("band") == bi).select(
                    F.col("band_hash").alias(bcol)
                )
                out = out.join(side, bcol, "left_anti")
            return out.drop(*tmp_cols, *[f"__dts_band_{b}" for b in range(bands)])

        sigs = minhash_signatures(
            new_docs, id_col, text_col, num_hashes, hash_fn
        )
        hashes = _band_hash_exprs(
            [F.col("sig").getItem(i) for i in range(num_hashes)],
            bands, r, hash_fn,
        )
        new_bands = sigs.select(
            F.col(id_col),
            F.posexplode(F.array(*hashes)).alias("band", "band_hash"),
        )
        hit = (
            new_bands
            .join(corpus_bands, ["band", "band_hash"], "semi")
            .select(id_col)
            .distinct()
        )
        return new_docs.join(hit, id_col, "left_anti")
    raise ValueError(f"unknown dedup mode {mode!r}")


#: modulus for the md5km family: largest 32-bit prime. i*(h2%P) tops
#: out at 63 × 4.3e9 ≈ 2.7e11 — no bigint overflow at any num_hashes
#: ≤ a few thousand; the 4.3e9 value space makes min-collisions
#: between distinct tokens negligible at corpus vocabulary sizes.
MINHASH_KM_P = 4294967291


def _minhash_component(i: int, token, hash_fn: str):
    """The i-th member of the MinHash family applied to a token.

    * ``xxhash64`` (prod default): Spark-native, seeded by prefixing
      the index — bigint, fastest.
    * ``md5``: md5 of ``"{i}|" + token`` — the ONE hash Spark and
      DuckDB share byte-for-byte, so signatures (lexicographic min of
      lowercase-hex strings) are value-checkable against a SQL oracle.
      Same min-wise independence argument, ~2× wider shuffle rows.
    * ``md5km``: Kirsch-Mitzenmacher double hashing — h_i = (h1 +
      i·h2) mod P with h1/h2 = two 60-bit halves of ONE md5 per token
      (Kirsch & Mitzenmacher, ESA'06: two independent hashes suffice
      to simulate a family). 1 md5 + integer arithmetic instead of
      ``num_hashes`` md5s per token (the md5-family profile is
      hash-bound: 64× fewer digests ≈ an order of magnitude on the
      signature stage), components are BIGINTs (narrower shuffle than
      hex strings), and the arithmetic is reproduced exactly in
      DuckDB (``('0x' || substr(md5(t), ..))::BIGINT`` — verified
      equal to Spark's ``conv(substr(md5(t), ..), 16, 10)``).
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(i), token)
    if hash_fn == "md5":
        return F.md5(F.concat(F.lit(f"{i}|"), token))
    if hash_fn == "md5km":
        d = F.md5(token)
        h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("bigint") % MINHASH_KM_P
        h2 = F.conv(F.substring(d, 17, 15), 16, 10).cast("bigint") % MINHASH_KM_P
        return (h1 + F.lit(i) * h2) % MINHASH_KM_P
    raise ValueError(f"unknown minhash hash_fn {hash_fn!r}")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """E-2b: MinHash signature per document, as ONE array column.

    sig[i](doc) = min over tokens of hash_i(token) — one exploded
    frame, one groupBy with ``num_hashes`` min aggregates (map-side
    combined; shuffle is |docs| × num_hashes, independent of text
    size), assembled into ``sig: array<bigint|string>`` so downstream
    joins carry a single column instead of 64. See
    ``_minhash_component`` for the hash-family choice.
    """
    toks = _doc_tokens(docs, id_col, text_col)
    if hash_fn == "md5km":
        # ONE md5 per token, materialized in a projection BELOW the
        # aggregate so the 64 min-aggs see plain column arithmetic —
        # never 64 digest computations (independent of codegen
        # common-subexpression elimination)
        d = F.md5(F.col("token"))
        toks = toks.select(
            id_col,
            (F.conv(F.substring(d, 1, 15), 16, 10).cast("bigint")
             % MINHASH_KM_P).alias("_h1"),
            (F.conv(F.substring(d, 17, 15), 16, 10).cast("bigint")
             % MINHASH_KM_P).alias("_h2"),
        )
        aggs = [
            F.min(
                (F.col("_h1") + F.lit(i) * F.col("_h2")) % MINHASH_KM_P
            ).alias(f"s{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(_minhash_component(i, F.col("token"), hash_fn)).alias(f"s{i}")
            for i in range(num_hashes)
        ]
    return toks.groupBy(id_col).agg(*aggs).select(
        F.col(id_col),
        F.array(*[F.col(f"s{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """E-2b: near-dup candidate pairs via LSH banding over MinHash.

    Signatures are split into ``bands`` bands of r = num_hashes/bands
    values; docs sharing any band hash become candidates (probability
    ≈ 1−(1−j^r)^b). Tune banding to the threshold: the S-curve knee
    sits at (1/b)^(1/r) — b=16/r=4 targets j≈0.5, b=8/r=8 targets
    j≈0.77; a mistuned (too many) band count floods the candidate set
    with below-threshold pairs that verification then has to reject.
    Estimated Jaccard = fraction of agreeing signature
    components, computed with ``zip_with`` over the two signature
    arrays — the pair join carries one array column per side, not
    2×num_hashes scalar columns.

    Staging (measured across three designs at sf0.1): the band-bucket
    self-join fans out quadratically inside hot buckets, so it must
    run on SKINNY rows (id, band, band_hash — 16 B) with the distinct
    collapsing multi-band duplicates BEFORE anything expensive; the
    64-element zip_with verification then touches only distinct
    candidate pairs. Folding the sig arrays into the band join
    ("verify-in-join", no materialization) looked cheaper on paper but
    measured 2-8× slower: every exploded bucket pair paid the
    zip_with, ×bands duplicate matches. The signature frame feeds the
    band explosion and both verification sides → ``persist()``, ONE
    computation, and the blocks are freed by a ``weakref.finalize``
    the moment the caller drops the returned DataFrame
    (utils.unpersist_when_dropped). Unlike the r3
    ``localCheckpoint(eager=True)`` (blocks lost = plan dead, release
    timing left to the ContextCleaner), ``unpersist`` on a persisted
    frame keeps lineage — a late re-execution just recomputes — so the
    finalizer can never corrupt a still-referenced derived plan, and
    the r2 session-lifetime CacheManager pin is gone
    (tests/test_resource_hygiene.py).

    Returns (id_a, id_b, est_jaccard ≥ threshold).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(
        docs, id_col, text_col, num_hashes, hash_fn
    ).persist()

    def band_hash(b: int):
        cols = [F.col("sig").getItem(b * r + j) for j in range(r)]
        if hash_fn in ("md5", "md5km"):
            # md5 of the '|'-joined component strings (hex digests for
            # md5, decimal bigints for md5km — BIGINT→string renders
            # identically in both engines) — the DuckDB oracle
            # reproduces this key exactly
            return F.md5(F.concat_ws("|", *cols))
        return F.xxhash64(*cols)

    band_rows = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[band_hash(b).alias(f"b{b}") for b in range(bands)])
        ).alias("band", "band_hash"),
    )

    a = band_rows.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = band_rows.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    # Catalyst rewrites distinct to the same partial-aggregated
    # Aggregate a groupBy would plan — measured equivalent in
    # fresh-JVM A/B at sf0.1
    cand = (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.aggregate(
        F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    out = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(agree / F.lit(float(num_hashes)), 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    from decision_tree_stuff_spark.utils import unpersist_when_dropped

    return unpersist_when_dropped(out, sigs)


def _simhash_bit(token, j: int, hash_fn: str):
    """Bit j (0..63) of the per-token hash, as a 0/1 int Column.

    * ``xxhash64``: native bigint, bit via shift+mask (prod default).
    * ``md5``: bit j lives in hex digit j//4 of the digest (low nibble
      bit j%4) — extractable with identical arithmetic in DuckDB
      (``(strpos('0123456789abcdef', substr(md5(t), j/4+1, 1))-1)
      >> (j%4) & 1``), giving the fingerprint a value-level oracle.
    """
    if hash_fn == "xxhash64":
        return F.shiftright(F.xxhash64(token), j).bitwiseAND(F.lit(1))
    if hash_fn == "md5":
        nib = F.conv(F.substring(F.md5(token), j // 4 + 1, 1), 16, 10).cast(
            "int"
        )
        return F.shiftright(nib, j % 4).bitwiseAND(F.lit(1))
    raise ValueError(f"unknown simhash hash_fn {hash_fn!r}")


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """E-2c: 64-bit SimHash fingerprint per document.

    Explode token *occurrences* (multiset — frequency is the weight),
    then one groupBy with 64 conditional sums: bit j of the result is
    set iff Σ_tokens (±1 per occurrence, + when bit j of hash(token)
    is set) > 0. Single shuffle of |docs| × 64 longs. See
    ``_simhash_bit`` for the hash-family choice (xxhash64 prod,
    md5 oracle-checkable).
    """
    from decision_tree_stuff_spark.operators import spread_small

    occ = spread_small(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    aggs = [
        F.sum(
            F.when(_simhash_bit(F.col("token"), j, hash_fn) == 1, 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(64)
    ]
    votes = occ.groupBy(id_col).agg(*aggs)
    # assemble the 64-bit fingerprint; bit 63 via signed overflow is
    # avoided by building from two 32-bit halves
    lo = sum(
        (F.when(F.col(f"v_{j}") > 0, 1).otherwise(0) * F.lit(1 << j)).cast("bigint")
        for j in range(32)
    )
    hi = sum(
        (F.when(F.col(f"v_{j + 32}") > 0, 1).otherwise(0) * F.lit(1 << j)).cast(
            "bigint"
        )
        for j in range(32)
    )
    return votes.select(
        F.col(id_col),
        lo.alias("simhash_lo"),
        hi.alias("simhash_hi"),
    )


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """E-2c: near-dup pairs with hamming(simhash) ≤ max_hamming.

    Blocking: split the 64-bit fingerprint into four 16-bit chunks —
    any pair within hamming ≤ 3·16 shares at least one exact chunk
    (pigeonhole for max_hamming ≤ 3 per-chunk guarantee holds when
    max_hamming < 4; for larger radii this is an approximate blocker,
    which is the standard trade). Verification = popcount(xor).

    ``hash_fn`` passes through to ``simhash`` (r12): ``'md5'`` makes
    the whole pair pipeline value-oracle-able in DuckDB (the
    ``e2_simhash_md5_dups`` row — blocking condition and hamming
    verify reproduced exactly); ``'xxhash64'`` stays the prod
    default (engine-internal hash, property-tested).
    """
    sh = simhash(docs, id_col, text_col, hash_fn=hash_fn)
    chunks = sh.select(
        F.col(id_col),
        "simhash_lo",
        "simhash_hi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright(F.col("simhash_lo"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for c in range(2)
                ]
                + [
                    F.struct(
                        F.lit(c + 2).alias("chunk_id"),
                        F.shiftright(F.col("simhash_hi"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for c in range(2)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "simhash_lo", "simhash_hi", "cc.chunk_id", "cc.chunk")

    a = chunks.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash_lo").alias("a_lo"),
        F.col("simhash_hi").alias("a_hi"),
        "chunk_id",
        "chunk",
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash_lo").alias("b_lo"),
        F.col("simhash_hi").alias("b_hi"),
        "chunk_id",
        "chunk",
    )
    hamming = F.bit_count(
        F.col("a_lo").bitwiseXOR(F.col("b_lo"))
    ) + F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
    return (
        a.join(b, ["chunk_id", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    min_docs: int = 2,
    key: str = "text",
    keep: str = "none",
) -> DataFrame:
    """E-1d: sub-document (span-level) dedup — drop consecutive
    ``n``-token chunks whose exact text occurs in at least
    ``min_docs`` DISTINCT documents, then reconstruct each document
    from its surviving chunks in order. Boilerplate headers/footers
    and licence blocks are the target.

    ``keep='none'`` (default) removes EVERY occurrence of a frequent
    span — the RefinedWeb/Falcon frequent-line-removal semantics
    (boilerplate is noise wherever it appears). ``keep='first'``
    retains the single occurrence with the lowest (doc, position) —
    C4's "discard all but one of any repeated span" semantics. The
    winner per frequent span is a map-side-combined min(struct(doc,
    pos)) aggregate joined back — never a per-key window, so even a
    span occurring in 10^8 documents adds one combinable key, not one
    straggler task (see the inline plan note).

    Plan (three shuffles, all key-even):

    1. chunk: ``split`` + ``transform(sequence, slice)`` builds the
       chunk array doc-locally, then one ``posexplode`` — no join.
       The token array is bound as a real column first (Catalyst does
       not CSE across lambda boundaries, so an inline ``split`` would
       re-run once per chunk).
    2. frequent-span set: ``distinct (span_key, doc)`` then a
       map-side-combinable count per span_key — the shuffle carries
       distinct pairs, not raw chunk rows. A span repeated only
       WITHIN one doc never fires (distinct-doc count is 1).
    3. one LEFT join back (span marked dup or not) + one groupBy doc
       that rebuilds the text with ``array_sort(collect_list(struct
       (pos, span)))`` — ``collect_list`` is bounded by chunks per
       doc, i.e. by document length, the same bound the raw text
       already imposes.

    ``key='text'`` joins on the span text itself (exact semantics,
    DuckDB-oracle-checkable). ``key='xxhash64'`` shuffles an 8-byte
    hash instead for stages 2-3 — the 100 TB shape (narrow shuffle
    keys; 64-bit collisions are the standard accepted trade). In a
    production run the frequent-span set is usually small enough that
    AQE broadcasts the stage-3 join automatically.

    Whitespace-only documents produce no chunks and come back with
    ``text=''``. Returns (id_col, text_col, n_chunks, n_kept) with
    every input doc represented.
    """
    if key not in ("text", "xxhash64"):
        raise ValueError(f"key must be 'text' or 'xxhash64', got {key!r}")
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    for c in ("__toks", "__k", "__dup", "__w", "__w_id", "__w_pos"):
        if c in docs.columns:
            raise ValueError(
                f"span_dedup reserves the column name {c!r}; rename it "
                "on the input before calling"
            )

    base, spans = _doc_spans(docs, id_col, text_col, n, key)
    freq = (
        spans.select("__k", id_col)
        .distinct()
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("__k", F.lit(True).alias("__dup"))
    )
    flagged = spans.join(freq, "__k", "left")
    if keep == "first":
        # The kept occurrence is the global min (doc, position) per
        # frequent span. A row_number window over __k would sort EVERY
        # occurrence of a span in ONE task — a straggler when viral
        # boilerplate (a license header in 10^8 docs) hits one key at
        # 100 TB. min(struct) is an ALGEBRAIC aggregate instead: each
        # map task pre-reduces its local occurrences to one candidate
        # per span (partial_min), so the hot key crosses the shuffle
        # as <= one row per map task and the reduce side folds a
        # bounded set — no single-partition sort anywhere (plan pinned
        # in tests/test_dedup_properties.py: no Window on __k).
        winners = (
            spans.join(freq.select("__k"), "__k")
            .groupBy("__k")
            .agg(
                F.min(
                    F.struct(
                        F.col(id_col).alias("i"),
                        F.col("chunk_pos").alias("p"),
                    )
                ).alias("__w")
            )
            .select(
                "__k",
                F.col("__w.i").alias("__w_id"),
                F.col("__w.p").alias("__w_pos"),
            )
        )
        flagged = (
            flagged.join(winners, "__k", "left")
            .withColumn(
                "__dup",
                F.when(
                    F.col("__dup").isNotNull()
                    & ~(
                        (F.col(id_col) == F.col("__w_id"))
                        & (F.col("chunk_pos") == F.col("__w_pos"))
                    ),
                    F.lit(True),
                ),
            )
            .drop("__w_id", "__w_pos")
        )
    return _rebuild_stripped_docs(base, flagged, id_col, text_col)


def _doc_spans(docs, id_col: str, text_col: str, n: int, key: str):
    """Shared chunking stage of the span-dedup family: (base
    projection, one row per n-token chunk with its join key ``__k``).
    Chunking is doc-local (split + transform(sequence, slice) + one
    posexplode — no join); the token array is bound as a real column
    first because Catalyst does not CSE across lambda boundaries."""
    from decision_tree_stuff_spark.operators import spread_small

    base = docs.select(id_col, text_col)
    # chunk construction is the heavy per-row stage — spread a
    # single-split bench input first (guarded no-op at scale)
    prep = (
        spread_small(base)
        .where(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("__toks", F.split(F.col(text_col), " "))
    )
    n_spans = F.ceil(F.size(F.col("__toks")) / F.lit(n)).cast("int")
    spans = prep.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.array_join(
                    F.slice(F.col("__toks"), i * n + 1, n), " "
                ),
            )
        ).alias("chunk_pos", "span"),
    )
    spans = spans.withColumn(
        "__k",
        F.xxhash64(F.col("span")) if key == "xxhash64" else F.col("span"),
    )
    return base, spans


def _rebuild_stripped_docs(base, flagged, id_col: str, text_col: str):
    """Shared reassembly stage: keep chunks whose ``__dup`` is null,
    rebuild each doc's text in chunk order (collect_list bounded by
    chunks per doc = document length), and re-attach every input doc
    (all-whitespace docs produced no chunks → text='')."""
    kept_struct = F.when(
        F.col("__dup").isNull(), F.struct("chunk_pos", "span")
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["span"],
            ),
            " ",
        ).alias("__new_text"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(
            F.when(F.col("__dup").isNull(), 1).otherwise(0)
        ).alias("n_kept"),
    )
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__new_text"), F.lit("")).alias(text_col),
        F.coalesce(F.col("n_chunks"), F.lit(0)).cast("bigint").alias("n_chunks"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
    )


def frequent_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    min_docs: int = 2,
    key: str = "text",
) -> DataFrame:
    """The materialization target for INGEST-TIME span dedup: the
    corpus's frequent-span key table (one ``span_key`` per n-token
    chunk occurring in ≥ ``min_docs`` distinct documents). Learn it
    once over the historical corpus (RefinedWeb's boilerplate list),
    persist it, and strip new batches with
    ``span_dedup_against_corpus`` — the 100 TB corpus is chunked
    exactly once, ever. Parameters must match the later strip call
    (keys are a function of (n, key))."""
    if key not in ("text", "xxhash64"):
        raise ValueError(f"key must be 'text' or 'xxhash64', got {key!r}")
    _, spans = _doc_spans(docs, id_col, text_col, n, key)
    return (
        spans.select("__k", id_col)
        .distinct()
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select(F.col("__k").alias("span_key"))
    )


def span_dedup_against_corpus(
    new_docs: DataFrame,
    frequent: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    key: str = "text",
) -> DataFrame:
    """Strip a FIXED frequent-span table (from ``frequent_spans``) out
    of incoming documents — the production ingest shape for span-level
    dedup: boilerplate is learned offline from the historical corpus,
    and each new batch pays chunk + one equi-join + one per-doc
    rebuild, nothing quadratic and nothing that re-reads the corpus.

    Because the span table is static and the strip is a pure per-doc
    operation, the operator is micro-batch-invariant: running it per
    batch under ``foreachBatch`` yields byte-identical output to one
    batch run over the union (stream≡batch pinned in
    tests/test_dedup_properties.py). ``span_dedup(docs)`` with
    ``keep='none'`` is exactly ``span_dedup_against_corpus(docs,
    frequent_spans(docs))`` — also pinned.

    Same output shape as ``span_dedup``: (id, text, n_chunks, n_kept).
    """
    if key not in ("text", "xxhash64"):
        raise ValueError(f"key must be 'text' or 'xxhash64', got {key!r}")
    for c in ("__toks", "__k", "__dup"):
        if c in new_docs.columns:
            raise ValueError(
                f"span_dedup_against_corpus reserves the column name "
                f"{c!r}; rename it on the input before calling"
            )
    base, spans = _doc_spans(new_docs, id_col, text_col, n, key)
    freq = frequent.select(
        F.col("span_key").alias("__k"), F.lit(True).alias("__dup")
    ).distinct()
    flagged = spans.join(freq, "__k", "left")
    return _rebuild_stripped_docs(base, flagged, id_col, text_col)


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD'03; the MOSS algorithm): hash every character ``k``-gram of
    the normalized text, then keep the MINIMUM hash of each sliding
    window of ``w`` consecutive gram hashes. The selected set carries
    the scheme's guarantee: any verbatim match of length ≥ ``w+k-1``
    characters between two documents shares at least one fingerprint —
    unlike a random MinHash sample, misses are impossible for long
    matches, which is why plagiarism/boilerplate detectors use it.

    Plan: a pure per-doc projection — the gram-hash array is built
    doc-locally (``transform(sequence)`` over substrings; the
    normalized text and the gram array are bound as real columns
    first, since Catalyst does not CSE across lambda boundaries), the
    window minima are ``array_min(slice(...))`` over it, and one
    ``explode(array_distinct(...))`` emits the set. No joins, no
    shuffle, embarrassingly parallel at any scale; per-doc work is
    O(len·w) with w a small constant.

    Hashes are md5 hex strings (the one hash Spark and DuckDB share
    byte-for-byte, so the operator is SQL-oracle-checkable;
    lexicographic min is consistent across engines). Documents whose
    normalized text is empty produce no rows. Returns (id_col,
    fingerprint) distinct.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    for c in ("__norm", "__grams"):
        if c in docs.columns:
            raise ValueError(
                f"winnow_fingerprints reserves the column name {c!r}; "
                "rename it on the input before calling"
            )
    from decision_tree_stuff_spark.functions.text import normalize_text
    from decision_tree_stuff_spark.operators import spread_small

    # O(len·w) md5 per doc is the dominant cost — spread a small
    # (single-split) input across the executor first; guarded no-op
    # on real multi-split tables (measured 3.8x on the bench corpus)
    prep = (
        spread_small(docs)
        .select(id_col, normalize_text(F.col(text_col)).alias("__norm"))
        .where(F.length("__norm") > 0)
    )
    n_grams = F.greatest(F.length("__norm") - k + 1, F.lit(1))
    grams = prep.withColumn(
        "__grams",
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.substring(F.col("__norm"), i, k)),
        ),
    )
    n_windows = F.greatest(F.size("__grams") - w + 1, F.lit(1))
    fps = grams.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_windows),
                    lambda j: F.array_min(F.slice(F.col("__grams"), j, w)),
                )
            )
        ).alias("fingerprint"),
    )
    return fps.distinct()


def winnow_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df="auto",
    auto_quantile: float = 0.70,
) -> DataFrame:
    """MOSS-style near-dup candidates: pairs of documents sharing at
    least ``min_shared`` winnowing fingerprints, with the shared count
    as the match-strength score. By the winnowing guarantee a shared
    verbatim run of ≥ ``w+k-1`` chars ALWAYS surfaces here — the
    complement of the probabilistic MinHash family.

    Plan, ``max_df`` set (the production shape): fingerprint
    projection → df-count aggregate (map-side-combinable — cheap even
    on hot keys) → broadcast LEFT-ANTI join against the SMALL
    over-cap set (ubiquitous boilerplate — exactly the keys that
    would square; the signal lives in rarer fingerprints — same
    hot-key guard as the Jaccard join) → groupBy(fingerprint)
    collecting the sorted doc-id array (each buffer bounded by
    ``max_df`` BECAUSE the hot keys were dropped first) → pairs
    generated array-locally (nested ``transform``) → per-pair count.
    The Σ df² candidate rows are born map-side of the pair count and
    partially aggregated before they ever shuffle — measured 2.1×
    faster than the self-join formulation at sf0.1. The fingerprint
    table is aggregated twice (count, then collect) by design: a
    fused single pass would buffer a hot key's FULL id list before
    the cap could drop it, the exact OOM the guard prevents.

    ``max_df=None`` keeps the classic self-equi-join (no per-key
    array is safe to collect when a fingerprint's document frequency
    is unbounded); differential-tested equal where both apply.

    Returns (id_a, id_b, n_shared) with id_a < id_b.
    """
    fps = winnow_fingerprints(docs, id_col, text_col, k, w)
    if max_df == "auto":
        # Derive the cap from the fingerprint-df distribution instead
        # of a hand-tuned constant (r6 verdict task 9): the
        # ``auto_quantile`` (default P70) separates the rare-signal
        # head from the boilerplate tail — on the bench corpus it
        # lands at 51 vs the hand-tuned 50. The floor of 10 keeps
        # small corpora sane: a tiny input's df distribution is
        # mostly 1, and a raw quantile there would cap at 1 and drop
        # every genuinely shared fingerprint (breaking the match
        # guarantee the operator exists for). ONE cheap sketch
        # aggregate (percentile_approx over the df table) and one
        # driver-side action; pass an int to override, None for the
        # classic uncapped self-join.
        q = (
            fps.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.percentile_approx("df", F.lit(auto_quantile), F.lit(10000)))
            .first()[0]
        )
        max_df = max(int(q), 10) if q is not None else None
    if max_df is not None:
        # Hot-key guard, broadcast the SMALL side (r6 advice): the
        # df-cap anti-joins against the set of fingerprints ABOVE the
        # cap — boilerplate keys, few by construction — never the kept
        # set, which is nearly all distinct fingerprints and grows
        # with the corpus. The df count is a fully map-side-combinable
        # aggregate (cheap even on hot keys); the collect_list pass
        # then only ever buffers <= max_df ids per key, so no
        # aggregation buffer is unbounded. (A fused single-pass
        # count+collect_list would materialize the hot key's FULL id
        # list before the filter could drop it — the exact OOM this
        # guard exists to prevent.)
        hot = (
            fps.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("fingerprint")
        )
        kept = fps.join(F.broadcast(hot), "fingerprint", "left_anti")
        grouped = kept.groupBy("fingerprint").agg(
            F.sort_array(F.collect_list(id_col)).alias("ids")
        )
        # ids are distinct within a fingerprint (fps is distinct) and
        # sorted, so (i < j) positions give id_a < id_b directly;
        # sequence() counts DOWN when stop < start, hence the size
        # guard for single-doc fingerprints
        pairs = grouped.select(
            F.explode(
                F.when(
                    F.size("ids") >= 2,
                    F.flatten(
                        F.transform(
                            F.sequence(F.lit(1), F.size("ids") - 1),
                            lambda i: F.transform(
                                F.sequence(i + 1, F.size("ids")),
                                lambda j: F.struct(
                                    F.element_at(F.col("ids"), i).alias(
                                        "id_a"
                                    ),
                                    F.element_at(F.col("ids"), j).alias(
                                        "id_b"
                                    ),
                                ),
                            ),
                        )
                    ),
                ).otherwise(F.array())
            ).alias("p")
        )
        return (
            pairs.select(F.col("p.id_a"), F.col("p.id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
            .where(F.col("n_shared") >= min_shared)
        )
    a = fps.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = fps.select(F.col(id_col).alias("id_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def edit_similarity_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_rel_dist: float = 0.2,
    max_chars: Optional[int] = None,
) -> DataFrame:
    """Edit-distance verification of candidate near-dup pairs: join
    the candidate (id_a, id_b) table back to normalized text and keep
    pairs whose Levenshtein distance is at most ``max_rel_dist`` ×
    max(len_a, len_b) — the character-level confirmation stage that
    token-set measures (Jaccard, MinHash) and fingerprint candidates
    (winnowing) can't provide: it certifies SEQUENCE similarity, not
    just bag overlap, so token-reordered docs no longer pass.

    Never run standalone over a corpus — Levenshtein is O(len_a ·
    len_b) per pair, so total cost is (candidate count) × (doc
    length)², bounded entirely by the upstream candidate generator
    (the same contract as `_jaccard_verify`). ``max_chars`` truncates
    both sides first (the standard practical bound when docs can be
    arbitrarily long: a 1 MB doc pair would otherwise cost 10^12 cell
    updates). Distance is computed JVM-side (``F.levenshtein``), one
    join per side, no UDF.

    Returns (id_a, id_b, edit_dist, rel_dist) with rel_dist =
    dist / greatest(len_a, len_b, 1) rounded to 6dp, filtered to
    rel_dist ≤ ``max_rel_dist``.
    """
    from decision_tree_stuff_spark.functions.text import normalize_text

    norm = normalize_text(F.col(text_col))
    if max_chars is not None:
        norm = F.substring(norm, 1, max_chars)
    texts = docs.select(F.col(id_col), norm.alias("__t"))
    a = texts.select(F.col(id_col).alias("id_a"), F.col("__t").alias("__ta"))
    b = texts.select(F.col(id_col).alias("id_b"), F.col("__t").alias("__tb"))
    dist = F.levenshtein(F.col("__ta"), F.col("__tb"))
    denom = F.greatest(
        F.length("__ta"), F.length("__tb"), F.lit(1)
    ).cast("double")
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn("edit_dist", dist.cast("bigint"))
        .withColumn("rel_dist", F.round(F.col("edit_dist") / denom, 6))
        .where(F.col("rel_dist") <= max_rel_dist)
        .select("id_a", "id_b", "edit_dist", "rel_dist")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot delta between two corpus versions: every id labeled
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` by comparing
    normalized-text fingerprints — the audit step between yesterday's
    and today's crawl that decides what downstream stages re-run.

    Plan: both sides reduce to (id, fingerprint) projections before a
    single full outer join on the id — the 100 TB corpus crosses the
    shuffle as 32-byte digests, never as text. Returns
    (id_col, status).
    """
    from decision_tree_stuff_spark.functions.text import fingerprint

    o = old.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("__fp_old")
    )
    n = new.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("__fp_new")
    )
    return o.join(n, id_col, "full_outer").select(
        F.col(id_col),
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )

def exact_substring_matches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    max_df="auto",
    auto_quantile: float = 0.70,
) -> DataFrame:
    """Suffix-array-STYLE exact-substring duplicate finder (r11; the
    other half of Lee et al. 2022's dedup recipe — ExactSubstr — whose
    reference implementation builds a monolithic suffix array): every
    MAXIMAL verbatim cross-document match of length ≥ ``min_len``
    normalized characters, with exact positions and exact length.
    This is the deterministic complement of the probabilistic family:
    chunk-frequency span dedup (``span_dedup``) only sees duplicates
    that repeat OFTEN and align with its fixed n-gram chunking, and
    MinHash only surfaces them probabilistically — a long verbatim
    quote shared by exactly two documents at different offsets is
    invisible to both, and is exactly what this operator returns.

    No suffix array is built; the same output is reached with three
    bounded dataflow steps (sorted-anchor + diagonal merge):

    1. **Anchors** — a per-doc projection emits md5(L-gram) for EVERY
       position of the normalized text (L = ``min_len``). Any common
       substring of length ≥ L contains an aligned common L-gram, so
       anchor recall is exact, not sampled. O(total chars) md5s,
       shuffle-free, embarrassingly parallel (``spread_small`` guards
       the single-split small-corpus case).
    2. **Candidate pairs** — anchors group by gram hash; each group's
       (id, pos) list is bounded by the ``max_df`` hot-gram cap
       (ubiquitous boilerplate grams — the keys that would square —
       are dropped by a broadcast anti-join FIRST, the same guard as
       ``winnow_pairs``/PPJoin, so no aggregation buffer is
       unbounded), then ordered cross-doc pairs are generated
       array-locally (the capped grouped-pairs pattern: Σ df² rows
       are born map-side of the next aggregate).
    3. **Diagonal merge** — a shared verbatim run of length m places
       its anchors at CONSECUTIVE positions on one alignment diagonal
       (pos_a − pos_b constant), so gaps-and-islands over each
       (id_a, id_b, diagonal) — ``row_number`` window, no per-group
       buffering — merges them: match_len = L + count − 1 recovers m
       EXACTLY, and the run's flanks are guaranteed mismatches
       (maximality) because an extension anchor would have merged.

    The one approximation is the hot-gram cap itself: a maximal run
    whose INTERIOR crosses a dropped boilerplate gram splits into two
    reported sub-runs (still ≥ L each), and runs consisting ONLY of
    over-cap grams are suppressed — the standard df-cap trade
    documented on every banded operator here. ``max_df='auto'``
    derives the cap from the anchor-df distribution (P70, floor 10)
    exactly like ``winnow_pairs``; pass an int for oracle-stable
    plans or ``None`` to disable the guard (unbounded fan-out — only
    for tiny corpora).

    100 TB: two shuffles (gram groupBy, diagonal window+groupBy),
    both on keys whose group sizes are capped (max_df anchors per
    gram; ≤ doc-length anchors per doc-pair diagonal), no driver
    collect (the auto cap is ONE scalar quantile action), no UDFs.
    Raising ``min_len`` (Lee et al. use 50 tokens ≈ 250 chars) makes
    grams rarer and every stage cheaper — the natural scale knob.

    SCALE RECIPE (r12, measured — SCALING_r12.md §4): with a FIXED
    integer ``max_df`` the pair stage is hard-bounded at
    ``max_df × n_anchors`` rows, i.e. LINEAR in corpus size with a
    cap-sized constant; what looks superlinear on high-duplication
    fixtures is replicated grams CLIMBING TOWARD the cap (the
    constant growing to its bound), not asymptotic growth. On a
    heavily duplicated corpus, tune in this order: (1) raise
    ``min_len`` toward the Lee et al. 250-char setting — rarer
    anchors shrink EVERY stage and the e1f slope collapses ~10×;
    (2) lower ``max_df`` — linear cost relief, at the price of
    splitting/suppressing runs made of over-cap boilerplate grams;
    (3) run ``exact_substring_cap_report`` FIRST to see exactly how
    many grams/anchors a candidate cap drops and what the hottest
    dropped gram looks like, so the recall trade is explicit before
    committing a full pass.

    Returns (id_a, id_b, pos_a, pos_b, match_len) with id_a < id_b;
    positions are 1-based offsets into the NORMALIZED text.
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    from decision_tree_stuff_spark.functions.text import normalize_text
    from decision_tree_stuff_spark.operators import spread_small

    L = int(min_len)
    prep = (
        spread_small(docs)
        .select(id_col, normalize_text(F.col(text_col)).alias("__norm"))
        .where(F.length("__norm") >= L)
    )
    anchors = prep.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("__norm") - L + 1),
                lambda i: F.md5(F.substring(F.col("__norm"), i, L)),
            )
        ).alias("__pos0", "__g"),
    ).select(
        "__id", (F.col("__pos0") + 1).cast("int").alias("__pos"), "__g"
    )
    if max_df == "auto":
        q = (
            anchors.groupBy("__g")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.percentile_approx("df", F.lit(auto_quantile), F.lit(10000)))
            .first()[0]
        )
        max_df = max(int(q), 10) if q is not None else None
    if max_df is not None:
        hot = (
            anchors.groupBy("__g")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("__g")
        )
        anchors = anchors.join(F.broadcast(hot), "__g", "left_anti")
    occ = anchors.groupBy("__g").agg(
        F.collect_list(F.struct("__id", "__pos")).alias("occ")
    )
    pairs = occ.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("occ"),
                    lambda a: F.filter(
                        F.transform(
                            F.col("occ"),
                            lambda b: F.struct(
                                a["__id"].alias("id_a"),
                                a["__pos"].alias("pos_a"),
                                b["__id"].alias("id_b"),
                                b["__pos"].alias("pos_b"),
                            ),
                        ),
                        lambda p: p["id_a"] < p["id_b"],
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.pos_a", "p.id_b", "p.pos_b")
    diag = (F.col("pos_a") - F.col("pos_b")).alias("__diag")
    w = Window.partitionBy("id_a", "id_b", "__diag").orderBy("pos_a")
    runs = pairs.select("id_a", "id_b", "pos_a", "pos_b", diag).withColumn(
        "__isl", F.col("pos_a") - F.row_number().over(w)
    )
    return runs.groupBy("id_a", "id_b", "__diag", "__isl").agg(
        F.min("pos_a").alias("pos_a"),
        F.count(F.lit(1)).alias("__n"),
    ).select(
        "id_a",
        "id_b",
        F.col("pos_a").cast("int").alias("pos_a"),
        (F.col("pos_a") - F.col("__diag")).cast("int").alias("pos_b"),
        (F.lit(L) + F.col("__n") - 1).cast("int").alias("match_len"),
    )


def exact_substring_cap_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    max_df="auto",
    auto_quantile: float = 0.70,
) -> DataFrame:
    """Accounting for what ``exact_substring_matches``' hot-gram cap
    DROPS (r12 — the r11 verdict asked for the cap trade to be
    explicit, not implied): one row

      (max_df_used, n_grams, n_dropped_grams, n_anchors,
       n_dropped_anchors, example_gram)

    where ``example_gram`` is the text of the highest-df dropped
    L-gram (ties by hash; null when nothing is dropped). Run this
    next to the dedup/decontam pass when choosing ``max_df`` /
    ``min_len`` for a corpus: dropped grams are exactly the
    boilerplate whose interior can SPLIT a reported run in two and
    whose exclusive runs are suppressed — if ``n_dropped_anchors``
    is a large share of ``n_anchors``, raise ``min_len`` (rarer
    grams) before raising ``max_df`` (quadratic pair cost per gram).

    Cost: the same anchor projection + one df aggregate the operator
    itself runs, plus one broadcast semi-join to recover the example
    gram's text — safe to run at full scale.
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    from decision_tree_stuff_spark.functions.text import normalize_text
    from decision_tree_stuff_spark.operators import spread_small

    L = int(min_len)
    prep = (
        spread_small(docs)
        .select(id_col, normalize_text(F.col(text_col)).alias("__norm"))
        .where(F.length("__norm") >= L)
    )
    anchors = prep.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("__norm") - L + 1),
                lambda i: F.struct(
                    F.md5(F.substring(F.col("__norm"), i, L)).alias("__g"),
                    F.substring(F.col("__norm"), i, L).alias("__t"),
                ),
            )
        ).alias("__pos0", "__gt"),
    ).select(F.col("__gt.__g").alias("__g"), F.col("__gt.__t").alias("__t"))
    df_tbl = anchors.groupBy("__g").agg(
        F.count(F.lit(1)).alias("df"), F.min("__t").alias("__t")
    )
    if max_df == "auto":
        q = df_tbl.agg(
            F.percentile_approx("df", F.lit(auto_quantile), F.lit(10000))
        ).first()[0]
        max_df = max(int(q), 10) if q is not None else None
    cap = F.lit(max_df).cast("bigint") if max_df is not None else None
    dropped = (
        df_tbl.where(F.col("df") > cap)
        if cap is not None
        else df_tbl.where(F.lit(False))
    )
    example = dropped.orderBy(
        F.col("df").desc(), F.col("__g").asc()
    ).limit(1).select(F.col("__t").alias("example_gram"))
    totals = df_tbl.agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("df").alias("n_anchors"),
    )
    drops = dropped.agg(
        F.count(F.lit(1)).alias("n_dropped_grams"),
        F.coalesce(F.sum("df"), F.lit(0)).alias("n_dropped_anchors"),
    )
    example_k = example.select(
        F.lit(1).alias("__k"), "example_gram"
    )
    return (
        totals.crossJoin(F.broadcast(drops))
        .select(F.lit(1).alias("__k"), "*")
        .join(F.broadcast(example_k), "__k", "left")
        .select(
            F.lit(max_df).cast("int").alias("max_df_used"),
            "n_grams",
            "n_dropped_grams",
            "n_anchors",
            "n_dropped_anchors",
            "example_gram",
        )
    )
