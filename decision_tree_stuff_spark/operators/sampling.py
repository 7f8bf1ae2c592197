"""Deterministic sampling, global shuffle, and sequence packing — the
data-selection / data-ordering stages of an LLM training pipeline.

Everything here is *hash-deterministic*: no RNG state, no
``rand()`` — the decision for a row is a pure function of its key and
a seed string, so reruns, retries, and speculative task re-execution
all agree (Spark's ``sample()`` is NOT stable under partition
re-computation), and a DuckDB oracle can reproduce every bit. The
uniform variate is the md5 hex digest of ``"{seed}|{key}"`` compared
lexicographically against a precomputed 32-hex-char threshold
(md5 is the one hash family Spark and DuckDB share byte-for-byte;
both engines compare ASCII hex strings bytewise).

Global-order operators (shuffle position, packing offsets) avoid the
classic scale-killer — ``row_number() OVER (ORDER BY ...)`` with no
partition key collapses onto ONE task — with a two-phase plan:

1. bucket = first 2 hex chars of the shuffle key (256 buckets);
2. per-bucket rank/cumsum via a window PARTITIONED by bucket
   (parallel, each bucket ~N/256 rows);
3. bucket base offsets = one 256-row aggregate, cumulated on the
   driver-sized frame and broadcast back.

Because the bucket is a *prefix* of the shuffle key, ordering by
(bucket, key) equals ordering by key, so phase-2 + phase-3 reproduce
the exact global ``row_number``/prefix-sum — the DuckDB oracle runs
the naive single-node window and values match bit-for-bit.

Reference scope: beyond the reference (training-data-pipeline
extension mandate).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

#: number of hex chars in an md5 digest
_MD5_HEX = 32
#: prefix chars used for the two-phase bucket (256 buckets)
_BUCKET_CHARS = 2


def rate_threshold(rate: float) -> str:
    """The 32-hex-char string t with P[md5 < t] = rate under the
    uniform-digest model. Computed once in Python and embedded in both
    engines' plans, so float rounding of ``rate`` cannot diverge."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate == 1.0:
        # 16**32 formats to 33 chars starting '1', which compares
        # BELOW most 32-char digests bytewise; 'g' sorts above every
        # hex char in both engines
        return "g"
    return format(int(rate * 16**_MD5_HEX), f"0{_MD5_HEX}x")


def hash_key(key_cols: List[str], seed: str) -> Column:
    """md5("{seed}|{k1}|{k2}|...") — the deterministic uniform.

    Caveat (shared deliberately with the DuckDB twins, which use the
    same ``concat_ws`` semantics): NULL key parts are SKIPPED by
    concat_ws, so ('x', NULL) and (NULL, 'x') hash identically. Key
    columns should be non-null identifiers (every gate query keys on
    ids); if a nullable column must participate, wrap it in
    ``coalesce`` with a sentinel on BOTH engines."""
    parts = [F.lit(seed)] + [F.col(c).cast("string") for c in key_cols]
    return F.md5(F.concat_ws("|", *parts))


def deterministic_sample(
    df: DataFrame, rate: float, key_cols: List[str], seed: str = "seed"
) -> DataFrame:
    """Keep rows whose hash-uniform falls below ``rate``. One narrow
    filter — no shuffle, fully pushed into the scan stage; stable
    under retries and across engines."""
    return df.where(hash_key(key_cols, seed) < F.lit(rate_threshold(rate)))


def hash_split(
    df: DataFrame,
    fractions: Dict[str, float],
    key_cols: List[str],
    seed: str = "seed",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic named partitioning (train/val/test): every row is
    assigned exactly one split by which hash interval its uniform
    falls in. Fractions must sum to 1.0 (±1e-9). Shuffle-free, stable
    under retries, disjoint and exhaustive by construction — the
    failure mode this prevents is the classic ``rand() < 0.9`` split
    whose membership changes across job reruns, leaking val rows into
    a later training run.

    Interval edges are cumulative-fraction thresholds in sorted split
    name order, so the assignment is reproducible from (fractions,
    seed) alone.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    hk = hash_key(key_cols, seed)
    acc = 0.0
    expr = None
    # iterate in sorted name order: the edge layout is part of the
    # contract (same fractions+seed → same rows in every engine)
    names = sorted(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = hk < F.lit(rate_threshold(min(acc, 1.0)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def k_fold(
    df: DataFrame,
    k: int,
    key_cols: List[str],
    seed: str = "seed",
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment for cross-validation: fold =
    (60-bit integer prefix of the row's md5 uniform) mod k. Same
    contract as ``hash_split``: shuffle-free, retry-stable, disjoint
    and exhaustive, reproducible from (seed, k) alone — and the
    integer arithmetic is engine-portable (DuckDB twin:
    ``('0x' || substr(md5, 1, 15))::BIGINT % k``). Folds are balanced
    in expectation (hash-uniform), not exactly equal-sized — exact
    balance would need a global rank, which no CV protocol requires.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hk = hash_key(key_cols, seed)
    fold = F.conv(F.substring(hk, 1, 15), 16, 10).cast("bigint") % k
    return df.withColumn(fold_col, fold.cast("int"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Dict[str, float],
    key_cols: List[str],
    seed: str = "seed",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling (e.g. per-language mixture weights in
    a corpus recipe). ``rates`` maps stratum value → keep rate; strata
    not listed use ``default_rate``. Same shuffle-free shape — the
    threshold is a CASE over the stratum column."""
    thr: Column = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(rate_threshold(rate))
        ).otherwise(thr)
    return df.where(hash_key(key_cols, seed) < thr)


def cap_per_group(
    df: DataFrame,
    group_cols: List[str],
    n: int,
    key_cols: List[str],
    seed: str = "cap",
) -> DataFrame:
    """Per-group quota (RefinedWeb's per-domain cap): keep at most
    ``n`` rows per group, chosen deterministically by md5-hash order
    with key tie-break — not first-seen (``dropDuplicates``-style
    partition-order arbitrariness) and not ``rand()`` (unstable under
    task retries). The surviving subset is a pure function of
    (group, keys, seed), so daily reruns keep the SAME representatives
    and downstream caches stay valid.

    Plan: one shuffle keyed on the group; the ``row_number <= n``
    filter is recognized by Catalyst as WindowGroupLimit, so each map
    task pre-prunes to its local top-n per group BEFORE the exchange —
    the shuffle carries O(n · groups-per-task), not the raw rows. A
    pathologically hot group still ranks in a single reduce task;
    when one group can exceed task memory, pre-bound it with
    ``deterministic_sample`` and cap exactly afterwards.

    Returns the input columns of the surviving rows.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    _check_reserved(df)
    w = Window.partitionBy(*group_cols).orderBy(
        hash_key(key_cols, seed).asc(),
        *[F.col(c).asc() for c in key_cols],
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= n)
        .drop("_rank")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: List[str],
    n: int,
    weight_col: str,
    key_cols: List[str],
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weighted k-sample per group — Efraimidis &
    Spirakis (IPL 2006): keep the ``n`` rows maximizing u^(1/w), u
    uniform per row; inclusion probability is then proportional to
    weight, WITHOUT replacement, in one pass. The classic use: sample
    documents per domain proportional to length/quality score while
    keeping reruns byte-stable.

    Determinism: u derives from md5(seed|keys) exactly like the other
    samplers (retry-stable, engine-portable), mapped to (0, 1] via the
    first 15 hex digits; the ranking key is ln(u)/w (monotone in
    u^(1/w)), ordered DESC with the key columns as tie-break. Rows
    with NULL or non-positive weight cannot be sampled (their
    selection key is undefined) and are dropped with the same
    semantics both engines share.

    Plan: identical to ``cap_per_group`` — one group-keyed shuffle,
    row_number window recognized as WindowGroupLimit so map tasks
    pre-prune to local top-n before the exchange.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    _check_reserved(df)
    # (0,1]: (x+1) / 16^15 with x uniform on [0, 16^15)
    u = (
        F.conv(F.substring(hash_key(key_cols, seed), 1, 15), 16, 10).cast(
            "double"
        )
        + F.lit(1.0)
    ) / F.lit(float(16**15))
    sel_key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*group_cols).orderBy(
        sel_key.desc(),
        *[F.col(c).asc() for c in key_cols],
    )
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= n)
        .drop("_rank")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    total_n: int,
    alpha: float,
    key_cols: List[str],
    seed: str = "temp",
    cache_counts: bool = True,
) -> DataFrame:
    """Temperature-scaled mixture sampling — the multilingual-corpus
    recipe (mT5/XLM-R style): group d receives a share of the
    ``total_n`` budget proportional to c_d^alpha, so alpha=1 is
    proportional sampling, alpha→0 approaches uniform-across-groups,
    and 0<alpha<1 up-weights rare groups (the published fix for
    head-language dominance).

    ``cache_counts`` (r14 optimization round, guide §5 caching rule):
    the quota derivation references the group-count table through two
    self-joining branches (shares × its own leftover sum), so without
    a cache the INPUT subtree executes 4× for the quota plus once for
    the ranked stream — 5 full replays of whatever feeds this
    operator (measured: the e12 ingest tail replayed its semantic
    stage's cosine scoring through exactly this multiplier). The
    count table is |groups| rows — bounded model-artifact size — so
    it persists by default (MEMORY_AND_DISK, released when the
    returned frame is dropped), cutting input replays to 2 (counts
    build + ranked stream). Skipped automatically for streaming
    inputs (persist is illegal there; the streaming twin has its own
    stateful fold).

    Allocation is EXACT and deterministic: largest-remainder method
    over the (tiny, bounded) group-count table — floor shares first,
    the leftover seats to the largest fractional remainders (ties by
    group value ASC). A group's allocation is capped at its row count
    (selection is WITHOUT replacement; unfilled quota is not
    redistributed — use ``sample_to_budget`` for exact-fill
    semantics). The ideal share is rounded to 9dp before floor so an
    exactly-integer share cannot straddle an ULP boundary between
    engines.

    Row selection inside each group is the deterministic md5-hash
    order every sampler here uses. Plan: one group-keyed shuffle with
    the WindowGroupLimit-style rank (the per-group limit rides in
    from the broadcast quota table), plus window work over the
    group-count table only (|groups| rows).
    """
    if total_n < 0:
        raise ValueError(f"total_n must be >= 0, got {total_n}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    _check_reserved(df)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_c"))
    cached_counts = None
    if cache_counts and not df.isStreaming:
        from pyspark import StorageLevel

        counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
        cached_counts = counts
    try:
        return _temperature_quota_plan(
            df, counts, cached_counts, total_n, alpha, group_col,
            key_cols, seed,
        )
    except Exception:
        # plan construction failed after the persist: no finalizer is
        # attached yet, so the CacheManager entry would leak for the
        # session (r14 advice).
        if cached_counts is not None:
            cached_counts.unpersist()
        raise


def _temperature_quota_plan(
    df, counts, cached_counts, total_n, alpha, group_col, key_cols, seed
):
    wsum = counts.agg(
        F.sum(F.pow(F.col("_c"), F.lit(float(alpha)))).alias("_wsum")
    )
    ideal = (
        F.lit(float(total_n))
        * F.pow(F.col("_c"), F.lit(float(alpha)))
        / F.col("_wsum")
    )
    base = F.floor(F.round(ideal, 9))
    shares = counts.crossJoin(F.broadcast(wsum)).select(
        group_col,
        "_c",
        base.alias("_base"),
        (F.round(ideal, 9) - base).alias("_rem"),
    )
    leftover = shares.agg(
        (F.lit(total_n) - F.sum("_base")).alias("_left")
    )
    w_rem = Window.orderBy(F.col("_rem").desc(), F.col(group_col).asc())
    quota = (
        shares.crossJoin(F.broadcast(leftover))
        .withColumn("_rrank", F.row_number().over(w_rem))
        .select(
            group_col,
            F.least(
                F.col("_base")
                + F.when(F.col("_rrank") <= F.col("_left"), 1).otherwise(0),
                F.col("_c"),
            ).cast("int").alias("_quota"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        hash_key(key_cols, seed).asc(),
        *[F.col(c).asc() for c in key_cols],
    )
    out = (
        df.withColumn("_rank", F.row_number().over(w))
        .join(F.broadcast(quota), group_col)
        .where(F.col("_rank") <= F.col("_quota"))
        .drop("_rank", "_quota")
    )
    if cached_counts is not None:
        from decision_tree_stuff_spark.utils import unpersist_when_dropped

        out = unpersist_when_dropped(out, cached_counts)
    return out


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: Dict[str, float],
    id_col: str = "doc_id",
    pair_cols: tuple = ("id_a", "id_b"),
    seed: str = "seed",
    split_col: str = "split",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Near-dup-aware train/val/test split: assignment is keyed on the
    document's near-duplicate CLUSTER, not its own id, so two
    near-duplicate documents can never straddle a split boundary — the
    classic eval leak a plain per-doc ``hash_split`` cannot prevent
    (train memorizes a near-copy of a test doc and the benchmark
    inflates; same failure class decontamination guards against, but
    arising WITHIN the corpus).

    Composition: ``connected_components`` labels every doc with its
    cluster's canonical id (``pairs`` from any near-dup family —
    Jaccard, MinHash-LSH, SimHash, embedding); ``hash_split`` then
    assigns whole clusters to splits through the cluster id. Both
    stages keep their own scale story (pointer-doubling propagation;
    shuffle-free interval assignment).

    Returns (id_col, cluster_id, split_col).
    """
    from decision_tree_stuff_spark.operators.clustering import (
        connected_components,
    )

    comp = connected_components(
        docs.select(id_col),
        pairs,
        id_col,
        pair_cols,
        checkpoint_mode=checkpoint_mode,
    )
    return hash_split(comp, fractions, ["cluster_id"], seed, split_col)


#: internal working columns of the two-phase global-order plan —
#: ``withColumn`` silently REPLACES same-named input columns, so a
#: caller frame already carrying one of these would be corrupted and
#: then dropped without error; refuse up front instead
_RESERVED_COLS = (
    "_hk", "_bucket", "_rank", "_base", "_start", "_n", "_toks", "_pos",
    "_piece", "_cum",
)


def _check_reserved(df: DataFrame) -> None:
    clash = [c for c in df.columns if c in _RESERVED_COLS]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with reserved internal names "
            f"{_RESERVED_COLS} — rename them before calling"
        )


def _with_bucketed_key(
    df: DataFrame, key_cols: List[str], seed: str
) -> DataFrame:
    _check_reserved(df)
    hk = hash_key(key_cols, seed)
    return df.withColumn("_hk", hk).withColumn(
        "_bucket", F.substring("_hk", 1, _BUCKET_CHARS)
    )


def _bucket_bases(keyed: DataFrame, value_col: Optional[str]) -> DataFrame:
    """Per-bucket exclusive prefix totals: for each bucket, the sum of
    ``value_col`` (or row count) over all *earlier* buckets. 256 rows —
    the unpartitioned window here is driver-sized by construction."""
    agg = F.count(F.lit(1)) if value_col is None else F.sum(value_col)
    per_bucket = keyed.groupBy("_bucket").agg(agg.cast("bigint").alias("_total"))
    w = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    return per_bucket.select(
        "_bucket", F.coalesce(F.sum("_total").over(w), F.lit(0)).alias("_base")
    )


def sample_to_budget(
    df: DataFrame,
    strata_col: str,
    budgets: Dict,
    key_cols: List[str],
    seed: str = "seed",
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Deterministic budget-filling sample — the mixture-recipe shape
    a pretraining pipeline actually runs ("N tokens of code, M of
    web"): per stratum, keep the hash-first rows whose CUMULATIVE
    weight (``weight_col``; row count when None) stays within
    ``budgets[stratum]``. Strata without a budget are dropped.

    Unlike ``stratified_sample`` (rate-based, shuffle-free, sizes
    only correct in expectation), this hits each budget exactly
    (within one document's weight). Order by hash makes the kept set
    a uniform random subset of the stratum, retry-stable and
    engine-portable (the SQL twin reproduces the cumulative window
    byte-for-byte).

    Weights must be NON-NEGATIVE: a negative weight breaks the
    cumulative sum's monotonicity, so rows past the budget boundary
    could re-qualify and silently overshoot the budget. Rather than
    documenting a silent precondition, the weight expression raises at
    execution time on the first negative (or null) value — one extra
    codegen'd comparison per row, no extra pass.

    Plan — two-phase bucketed prefix sum, same shape as
    ``global_shuffle``: a naive ``Window.partitionBy(strata)`` would
    sort each stratum in ONE task (a multi-TB single-task sort for a
    large domain). Instead rows bucket on the first 2 hex chars of
    their md5 uniform; the running sum windows over (stratum,
    bucket) — 256-way parallel per stratum — and a broadcast
    256×|strata|-row base table adds each bucket's exclusive prefix
    total. Because the bucket is a PREFIX of the hash, (bucket, hash)
    order equals global hash order: the result is identical to the
    single-window formulation at any parallelism.
    """
    if weight_col is None:
        weight = F.lit(1).cast("bigint")
    else:
        w = F.col(weight_col)
        weight = F.when(w >= 0, w).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"sample_to_budget: negative or null weight in "
                        f"{weight_col!r}: "
                    ),
                    F.coalesce(w.cast("string"), F.lit("NULL")),
                )
            )
        )
    budget = F.lit(0).cast("bigint")
    for value, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == value, F.lit(int(b))).otherwise(
            budget
        )
    keyed = _with_bucketed_key(df, key_cols, seed)
    per_bucket = keyed.groupBy(strata_col, "_bucket").agg(
        F.sum(weight).cast("bigint").alias("_total")
    )
    wb = (
        Window.partitionBy(strata_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = per_bucket.select(
        strata_col,
        "_bucket",
        F.coalesce(F.sum("_total").over(wb), F.lit(0)).alias("_base"),
    )
    w = (
        Window.partitionBy(strata_col, "_bucket")
        .orderBy("_hk", *key_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.withColumn("_cum", F.sum(weight).over(w))
        .join(F.broadcast(bases), [strata_col, "_bucket"])
        .where(F.col("_base") + F.col("_cum") <= budget)
        .drop("_hk", "_bucket", "_cum", "_base")
    )


def global_shuffle(
    df: DataFrame, key_cols: List[str], seed: str = "seed"
) -> DataFrame:
    """Deterministic global permutation: every row gets ``shuffle_pos``
    = its 0-based rank under (md5 key, tie-break on key_cols). Output
    ordering is carried by the column, not the partitioning — write it
    bucketed/sorted or sort-on-read downstream."""
    keyed = _with_bucketed_key(df, key_cols, seed)
    w = Window.partitionBy("_bucket").orderBy("_hk", *key_cols)
    bases = _bucket_bases(keyed, None)
    return (
        keyed.withColumn("_rank", F.row_number().over(w).cast("bigint"))
        .join(F.broadcast(bases), "_bucket")
        .withColumn("shuffle_pos", F.col("_base") + F.col("_rank") - 1)
        .drop("_hk", "_bucket", "_rank", "_base")
    )


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str,
    seq_len: int,
    key_cols: List[str],
    seed: str = "seed",
) -> DataFrame:
    """Concat-and-chunk packing metadata (GPT-style): documents are
    laid out in deterministic shuffle order and the token stream is
    cut every ``seq_len`` tokens. Each document gets the pack that
    contains its first token (``pack_id``) and its offset inside that
    pack (``pack_offset``); a document with
    ``pack_offset + n_tokens > seq_len`` straddles into the next
    pack(s) — this operator emits the layout, the byte-level splitter
    consumes it.

    start(doc) = exclusive prefix-sum of token counts in shuffle
    order, computed with the two-phase bucket plan (see module doc) —
    no single-task window at any size."""
    keyed = _with_bucketed_key(df, key_cols, seed)
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_hk", *key_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = _bucket_bases(keyed, n_tokens_col)
    start = F.col("_base") + F.coalesce(
        F.sum(F.col(n_tokens_col).cast("bigint")).over(w), F.lit(0)
    )
    return (
        keyed.join(F.broadcast(bases), "_bucket")
        .withColumn("_start", start)
        # integer DIV, not float division + cast: a double's ulp
        # exceeds 1 once the token stream passes 2^53 (≈9e15 tokens —
        # reachable at 100 TB), shifting pack boundaries
        .withColumn("pack_id", F.expr(f"_start DIV {int(seq_len)}"))
        .withColumn("pack_offset", F.col("_start") % seq_len)
        .drop("_hk", "_bucket", "_base", "_start")
    )


def pack_materialize(
    df: DataFrame,
    tokens_col: str,
    seq_len: int,
    key_cols: List[str],
    seed: str = "seed",
) -> DataFrame:
    """The packed sequences THEMSELVES (not just the layout): documents
    are concatenated in deterministic shuffle order and the token
    stream is cut every ``seq_len`` tokens, straddling documents SPLIT
    across pack boundaries. Returns one row per pack:
    (pack_id, n_tokens, tokens array<...>) — every pack except the
    last holds exactly ``seq_len`` tokens.

    Distributed shape: the same two-phase bucketed prefix-sum as
    ``pack_sequences`` gives each doc its global token start; each doc
    then EXPLODES into one row per pack it overlaps
    (``sequence(start DIV L, (start+n-1) DIV L)`` — a doc touches
    ceil((offset+n)/L) packs, so fan-out is (total_tokens/L) rows
    overall, independent of skew), carrying only the ``slice`` of its
    token array that lands in that pack. One groupBy(pack_id)
    reassembles pieces in offset order. Per-pack state is bounded by
    ``seq_len`` elements — collect_list here is safe at any corpus
    size because a pack, by construction, never exceeds ``seq_len``
    tokens. Zero-token docs are dropped (they occupy no pack space;
    prefix sums are unchanged)."""
    L = int(seq_len)
    keyed = _with_bucketed_key(df, key_cols, seed)
    keyed = keyed.withColumn(
        "_n", F.size(F.col(tokens_col)).cast("bigint")
    ).where(F.col("_n") > 0)
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_hk", *key_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = _bucket_bases(keyed, "_n")
    start = F.col("_base") + F.coalesce(F.sum("_n").over(w), F.lit(0))
    laid = (
        keyed.join(F.broadcast(bases), "_bucket")
        .withColumn("_start", start)
        .select(F.col(tokens_col).alias("_toks"), "_n", "_start")
    )
    pieces = laid.select(
        F.explode(
            F.sequence(
                F.expr(f"_start DIV {L}"), F.expr(f"(_start + _n - 1) DIV {L}")
            )
        ).alias("pack_id"),
        "_toks",
        "_n",
        "_start",
    ).select(
        "pack_id",
        # offset of this piece inside the pack (0 unless the doc
        # starts mid-pack)
        F.greatest(F.col("_start") - F.col("pack_id") * L, F.lit(0)).alias(
            "_pos"
        ),
        F.expr(
            f"slice(_toks, CAST(greatest(pack_id * {L} - _start, 0) + 1 AS INT), "
            f"CAST(least((pack_id + 1) * {L}, _start + _n) "
            f"- greatest(pack_id * {L}, _start) AS INT))"
        ).alias("_piece"),
    )
    return (
        pieces.groupBy("pack_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos"), F.col("_piece")))
                    ),
                    lambda s: s["_piece"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens").cast("bigint"))
        .select("pack_id", "n_tokens", "tokens")
    )


def filter_by_quantile(
    df: DataFrame,
    value_col: str,
    q: float,
    mode: str = "exact",
    keep: str = "top",
) -> DataFrame:
    """Quantile-threshold selection: keep the rows whose ``value_col``
    is >= (``keep='top'``) or <= (``keep='bottom'``) the ``q``-th
    quantile of the column — "train on the top decile by quality
    score" without anyone precomputing the cutoff.

    ``mode='exact'`` uses the exact interpolated percentile (rank
    ``1 + q·(n-1)``, the quantile_cont definition both engines share —
    DuckDB-oracle-checkable). ``mode='approx'`` uses
    ``percentile_approx`` — Spark's Greenwald-Khanna sketch:
    fixed-size state, one pass, no global sort — the 100 TB mode (the
    exact percentile is a full-sort aggregate).

    The threshold stays IN the plan: a 1-row aggregate broadcast into
    a join, so the operator composes lazily — no driver collect, no
    action, retry-safe. Threshold and values are rounded to 6dp before
    comparison so both engines agree on boundary rows.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if keep not in ("top", "bottom"):
        raise ValueError(f"keep must be 'top' or 'bottom', got {keep!r}")
    if "__thr" in df.columns:
        raise ValueError(
            "filter_by_quantile reserves the column name '__thr'; "
            "rename it on the input before calling"
        )
    if mode == "exact":
        thr_agg = F.percentile(F.col(value_col), F.lit(q))
    elif mode == "approx":
        thr_agg = F.percentile_approx(F.col(value_col), F.lit(q), F.lit(10000))
    else:
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    thr = df.agg(F.round(thr_agg, 6).alias("__thr"))
    rounded = F.round(F.col(value_col), 6)
    cond = rounded >= F.col("__thr") if keep == "top" else rounded <= F.col("__thr")
    return df.crossJoin(F.broadcast(thr)).where(cond).drop("__thr")


def filter_by_quantile_grouped(
    df: DataFrame,
    value_col: str,
    q: float,
    group_cols,
    mode: str = "exact",
    keep: str = "top",
) -> DataFrame:
    """Per-group quantile-threshold selection: each group keeps its
    rows at/above (``keep='top'``) or at/below its OWN ``q``-th
    quantile — the CCNet-style per-domain quality floor ("every
    source keeps its top half"), which a single global cutoff gets
    wrong whenever domains have different score distributions (the
    global threshold empties weak domains and waves everything
    through strong ones).

    Same modes and 6dp-rounding contract as ``filter_by_quantile``;
    the thresholds are ONE group-sized aggregate (exact percentile is
    a per-group sort-agg; ``mode='approx'`` keeps GK-sketch state per
    group for the 100 TB path) broadcast back into the scan — domains
    are dimension-cardinality, so the join never reshuffles the
    corpus.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if keep not in ("top", "bottom"):
        raise ValueError(f"keep must be 'top' or 'bottom', got {keep!r}")
    if "__thr" in df.columns:
        raise ValueError(
            "filter_by_quantile_grouped reserves the column name "
            "'__thr'; rename it on the input before calling"
        )
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use "
                         "filter_by_quantile for the global cutoff")
    if mode == "exact":
        thr_agg = F.percentile(F.col(value_col), F.lit(q))
    elif mode == "approx":
        thr_agg = F.percentile_approx(F.col(value_col), F.lit(q), F.lit(10000))
    else:
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    thr = df.groupBy(*group_cols).agg(F.round(thr_agg, 6).alias("__thr"))
    rounded = F.round(F.col(value_col), 6)
    cond = rounded >= F.col("__thr") if keep == "top" else rounded <= F.col("__thr")
    return df.join(F.broadcast(thr), group_cols).where(cond).drop("__thr")
