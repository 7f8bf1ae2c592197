"""Structured Streaming variants of the event-time operators (E-5).

The batch operators in ``operators.sessionize`` are written on the
same primitives (``F.window`` / ``F.session_window``) so the
streaming versions are the identical aggregation with a watermark
bolted on — one definition of window semantics, two execution modes.

Late data: the watermark bounds state and defines the correctness
contract — results equal the batch computation whenever event-time
disorder across micro-batches stays within the watermark horizon
(pinned by tests). Beyond the horizon behavior is output-mode- and
operator-dependent (observed: severely late input may be excluded in
multi-batch runs); deployments that must absorb arbitrary lateness
widen the watermark and pay the state. State store: session windows
use the builtin session-window state operator; at scale configure the
RocksDB state store via the usual confs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from decision_tree_stuff_spark.sources import EVENTS_RAW_SCHEMA

__all__ = [
    "EVENTS_RAW_SCHEMA",
    "read_events_stream",
    "rocksdb_state_store_confs",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_sessionize",
    "stream_exact_dedup",
    "stream_cap_per_group",
    "stream_weighted_sample_per_group",
    "stream_ingest_pipeline",
    "read_capped_state",
    "run_stream_to_memory",
    "run_stream_to_parquet",
]


def rocksdb_state_store_confs(
    changelog_checkpointing: bool = True,
    bounded_memory: bool = True,
) -> dict:
    """Session confs for the RocksDB state store — the 100 TB path for
    stateful streaming.

    The default (HDFS-backed) provider keeps every key in executor
    heap: a windowed agg or dedup whose key space outgrows the heap
    OOMs. RocksDB spills state to local SSD, bounds heap usage, and
    with changelog checkpointing uploads per-batch *deltas* instead of
    full snapshots — state size then scales with disk, not memory, and
    checkpoint cost with churn, not total state.

    Apply before the query starts (``for k, v in
    rocksdb_state_store_confs().items(): spark.conf.set(k, v)``).
    Works against stock PySpark — the provider ships in Spark's JVM
    (verified: stream≡batch under this provider in tests).
    """
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            str(changelog_checkpointing).lower(),
        # one shared block cache across all state store instances on an
        # executor instead of per-instance native allocations
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage":
            str(bounded_memory).lower(),
    }


def read_events_stream(spark, events_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    Same unit-sniffing convention as the batch reader
    (sources.read_events): the parquet footer decides whether `ts` is
    native MICROS (plain typed read) or NANOS (raw INT64 + exact
    integer division to µs). readStream needs an explicit schema
    either way, so the MICROS path derives it from the batch reader's
    analyzed schema instead of hardcoding a unit.

    An initially-EMPTY watch directory (the normal streaming setup —
    files arrive after the query starts) has no footer to sniff: the
    stream then starts under the default MICROS/LTZ schema
    (``sources._events_default_schema``), matching what the driver's
    current data generation stores. A producer that later drops NANOS
    files into the empty dir needs the explicit ns path — pre-seed one
    file or build the stream from EVENTS_RAW_SCHEMA directly.
    """
    from decision_tree_stuff_spark.sources import (
        _events_default_schema,
        events_ts_unit,
        read_events,
    )

    try:
        unit = events_ts_unit(events_dir)
    except FileNotFoundError:
        return (
            spark.readStream.schema(_events_default_schema())
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )
    if unit == "ns":
        raw = (
            spark.readStream.schema(EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    schema = read_events(spark, events_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def stream_tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window counts — same shape as the batch
    ``tumbling_counts``; watermark bounds state and admits late data
    up to its horizon."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sliding-window counts — same aggregation as the batch
    ``sliding_counts`` (each event lands in duration/slide overlapping
    windows); the watermark bounds how long an open window's state
    waits for late events."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming session windows — stateful session-window aggregation
    with watermark-bounded state (merges sessions across micro-batches
    until the watermark passes the session end)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_exact_dedup(
    events: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with
    state bounded by the watermark (``dropDuplicatesWithinWatermark``
    — duplicate arrivals beyond the horizon are not caught, which is
    the standard state/completeness trade at 100 TB/day volumes)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_semantic_decontam(
    stream_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming SEMANTIC decontamination (r9, the stream twin of
    ``decontam.embedding_decontamination``'s drop semantics): remove
    stream rows whose embedding's 6dp-rounded cosine against ANY item
    of the static benchmark set reaches ``threshold``.

    STATELESS by construction — a stream-static LEFT ANTI join
    against the broadcast eval set needs no watermark and no state
    store (contamination is a property of the row and the fixed
    benchmark, not of stream history), so stream ≡ batch for any
    micro-batch slicing, trivially. Per-batch cost is |batch| x
    |bench| cosine folds, the same broadcast nested-loop as the batch
    exact path; a huge benchmark belongs behind the IVF staging
    offline, not in the hot path. Zero-norm rows (null cosine) are
    never flagged — kept, matching the batch contract."""
    from decision_tree_stuff_spark.functions.array_math import dot_product

    def norm(v):
        return F.sqrt(dot_product(v, v))

    bench = bench_emb.select(
        F.col(vec_col).alias("__bvec"),
        norm(F.col(vec_col)).alias("__bn"),
    )
    denom = norm(F.col(vec_col)) * F.col("__bn")
    cos = F.round(
        F.when(
            denom > 0.0,
            dot_product(F.col(vec_col), F.col("__bvec")) / denom,
        ),
        6,
    )
    return stream_emb.join(
        F.broadcast(bench), cos >= F.lit(threshold), "left_anti"
    )


def stream_cap_per_group(
    stream_df: DataFrame,
    state_dir: str,
    group_cols: list,
    n: int,
    key_cols: list,
    seed: str = "cap",
    checkpoint_dir: str = None,
):
    """Streaming per-group quota (E-8c on a stream): maintain, across
    micro-batches, exactly the rows the BATCH ``cap_per_group`` would
    keep over all input seen so far.

    Why this is exact and not an approximation: keep-the-n-hash-lowest
    rows per group is a MERGEABLE selection (same algebra as top-k) —
    ``cap(A ∪ B) = cap(cap(A) ∪ B)`` — so folding
    ``state ← cap_per_group(state ∪ batch)`` over micro-batches
    converges to the batch answer regardless of arrival order. A later
    batch can carry a lower-hash row; the fold then EVICTS a
    previously kept one, which append-only sinks cannot express —
    hence ``foreachBatch`` with compacted state instead of a plain
    streaming write.

    State layout: versioned parquet snapshots ``v{batch_id}`` under
    ``state_dir`` (read the newest with ``read_capped_state``). Batch
    ``b`` always derives from the newest version BELOW ``b`` plus the
    batch rows, and overwrites its own ``v{b}`` — a retried micro-batch
    recomputes from the same inputs, so the write is idempotent and
    the query keeps exactly-once semantics through restarts.

    Scale: each snapshot holds at most ``n × |groups|`` rows — the
    OUTPUT size, independent of corpus size — so the per-batch rewrite
    cost tracks the quota table, not the stream volume. Version
    listing uses the local filesystem (os.listdir); on an object store
    swap in the Hadoop FileSystem API.

    Runs with ``availableNow`` and blocks until input is drained;
    returns the finished StreamingQuery.
    """
    from decision_tree_stuff_spark.operators.sampling import cap_per_group

    return _stream_mergeable_fold(
        stream_df,
        state_dir,
        lambda df: cap_per_group(df, group_cols, n, key_cols, seed),
        checkpoint_dir,
    )


def stream_weighted_sample_per_group(
    stream_df: DataFrame,
    state_dir: str,
    group_cols: list,
    n: int,
    weight_col: str,
    key_cols: list,
    seed: str = "ws",
    checkpoint_dir: str = None,
):
    """Streaming Efraimidis-Spirakis weighted sample (E-8w on a
    stream): maintain, across micro-batches, exactly the rows the
    batch ``weighted_sample_per_group`` would keep over all input
    seen so far.

    Exactness argument, same algebra as ``stream_cap_per_group``: the
    ES selection key ln(u)/w is a PURE function of the row (u from
    md5(seed|keys), w from the weight column), so keep-the-n-largest-
    keys is a mergeable selection — sample(A ∪ B) =
    sample(sample(A) ∪ B) — and the fold over micro-batches equals
    the batch answer including evictions (a later batch carrying a
    better-keyed row displaces an earlier keeper). State layout,
    retry idempotence, and snapshot retention are shared with the cap
    fold (``_stream_mergeable_fold``).
    """
    from decision_tree_stuff_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    return _stream_mergeable_fold(
        stream_df,
        state_dir,
        lambda df: weighted_sample_per_group(
            df, group_cols, n, weight_col, key_cols, seed
        ),
        checkpoint_dir,
    )


def stream_cms(
    stream_df: DataFrame,
    state_dir: str,
    key_col: str = "token",
    d: int = None,
    w: int = None,
    checkpoint_dir: str = None,
):
    """Streaming count-min sketch (E-4cm on a stream): maintain,
    across micro-batches, exactly the cell table the batch
    ``cms_cells`` would produce over all input seen so far.

    Exactness argument: CMS cells are COUNTERS, so the merge is
    addition — associative and commutative — and the fold
    ``state ← sum(state ∪ cells(batch))`` equals the batch sketch
    regardless of arrival order. State is ≤ d×w rows forever (the
    whole point of the sketch: unbounded stream, constant state);
    layout, retry idempotence, and snapshot retention are shared
    with the cap/sample folds (``_stream_mergeable_fold``). Read the
    newest snapshot with ``read_capped_state`` and query it with
    ``sketch.cms_estimate``."""
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.sketch import (
        CMS_D,
        CMS_W,
        cms_cells,
    )

    d, w = d or CMS_D, w or CMS_W
    return _stream_mergeable_fold(
        stream_df,
        state_dir,
        lambda cells: cells.groupBy("row", "col").agg(
            F.sum("cnt").alias("cnt")
        ),
        checkpoint_dir,
        prep_fn=lambda batch: cms_cells(batch, key_col, d, w),
    )


def stream_hll(
    stream_df: DataFrame,
    state_dir: str,
    key_col: str = "token",
    group_cols: list = None,
    b: int = None,
    checkpoint_dir: str = None,
):
    """Streaming HyperLogLog (r10): maintain, across micro-batches,
    exactly the register table the batch ``sketch.hll_registers``
    would produce over all input seen so far — distinct counting on
    an unbounded stream with ≤ groups × 2^b rows of state, forever.

    Exactness argument: registers are MAXIMA, so the merge is ``max``
    — associative, commutative, and idempotent (retried batches
    cannot inflate the count, unlike an additive fold) — hence
    ``state ← max(state ∪ registers(batch))`` equals the batch
    register table regardless of batch boundaries. Layout, retry
    idempotence and snapshot retention are shared with the other
    mergeable folds (``_stream_mergeable_fold``). Read the newest
    snapshot with ``read_capped_state`` and estimate with
    ``sketch.hll_estimate``."""
    from decision_tree_stuff_spark.operators.sketch import (
        HLL_B,
        hll_registers,
    )

    gcols = list(group_cols or [])
    b = b or HLL_B
    return _stream_mergeable_fold(
        stream_df,
        state_dir,
        lambda regs: regs.groupBy(*gcols, "bucket").agg(
            F.max("maxrho").alias("maxrho")
        ),
        checkpoint_dir,
        prep_fn=lambda batch: hll_registers(batch, key_col, gcols, b),
    )


def stream_hist(
    stream_df: DataFrame,
    state_dir: str,
    value_col: str = "v",
    group_cols: list = None,
    lo: float = 0.0,
    hi: float = 1024.0,
    n_buckets: int = None,
    checkpoint_dir: str = None,
):
    """Streaming histogram-quantile sketch (r11): maintain, across
    micro-batches, exactly the bucket table the batch
    ``sketch.hist_buckets`` would produce — quantile estimates on an
    unbounded stream with ≤ groups × (n_buckets+2) rows of state,
    forever (``sketch.hist_quantiles`` reads the snapshot). Counts
    are ADDITIVE, so the fold is the ``stream_cms`` shape: exact
    regardless of batch boundaries."""
    from decision_tree_stuff_spark.operators.sketch import (
        HIST_BUCKETS,
        hist_buckets,
    )

    gcols = list(group_cols or [])
    n_buckets = n_buckets or HIST_BUCKETS
    return _stream_mergeable_fold(
        stream_df,
        state_dir,
        lambda cells: cells.groupBy(*gcols, "bucket").agg(
            F.sum("cnt").alias("cnt")
        ),
        checkpoint_dir,
        prep_fn=lambda batch: hist_buckets(
            batch, value_col, gcols, lo, hi, n_buckets
        ),
    )


def stream_hist_rebucket(
    stream_df: DataFrame,
    state_dir: str,
    value_col: str = "v",
    group_cols: list = None,
    lo: float = 0.0,
    hi: float = 1024.0,
    n_buckets: int = None,
    src_n_buckets: int = None,
    checkpoint_dir: str = None,
):
    """Streaming AUTO-GRID histogram via cross-grid rebucket (r14 —
    the sketch family's last stream≡batch gap): each micro-batch
    builds an auto-range sketch on its OWN min/max grid
    (``hist_buckets_auto``), ``hist_rebucket`` maps it onto the
    caller's FIXED [lo, hi) target grid, and the additive fold sums
    counts per target cell — so the maintained state is exactly the
    batch cross-shard program (per-shard auto sketch → rebucket →
    ``hist_merge``) with shards = micro-batches, in ≤ groups ×
    (n_buckets+2) rows of state forever; ``hist_quantiles`` reads
    the snapshot unchanged. NOTE the semantics are the rebucket
    program's, not the one-shot global-bounds sketch: per-batch
    grids differ, so each batch's mass lands within the documented
    ≤ 1 target cell of its true cell (midpoint assignment) — the
    price of folding auto-gridded shards without a second global
    bounds pass over the stream's history."""
    from decision_tree_stuff_spark.operators.sketch import (
        HIST_BUCKETS,
        hist_buckets_auto,
        hist_buckets_auto_grouped,
        hist_rebucket,
    )

    gcols = list(group_cols or [])
    n_buckets = n_buckets or HIST_BUCKETS
    src_n_buckets = src_n_buckets or HIST_BUCKETS

    def _prep(batch: DataFrame) -> DataFrame:
        if gcols:
            sk = hist_buckets_auto_grouped(
                batch, value_col, gcols, src_n_buckets
            )
        else:
            sk = hist_buckets_auto(batch, value_col, (), src_n_buckets)
        return hist_rebucket(
            sk, lo, hi, n_buckets, gcols, src_n_buckets
        )

    return _stream_mergeable_fold(
        stream_df,
        state_dir,
        lambda cells: cells.groupBy(*gcols, "bucket").agg(
            F.sum("cnt").alias("cnt")
        ),
        checkpoint_dir,
        prep_fn=_prep,
    )


def stream_kmv(
    stream_df: DataFrame,
    state_dir: str,
    key_col: str = "token",
    k: int = None,
    checkpoint_dir: str = None,
):
    """Streaming KMV / theta sketch (r11): maintain, across
    micro-batches, exactly the k-minimum-hash table the batch
    ``sketch.kmv_sketch`` would produce over all input seen so far —
    a coordinated distinct-sample of an unbounded stream in ≤ k rows
    of state, forever, from which ``kmv_estimate`` answers distinct
    counts and ``kmv_set_estimates`` answers overlap against any
    other sketch (the question the HLL fold can't).

    Exactness argument: the k smallest of a union of k-smallest sets
    IS the k-smallest of the union (min-selection is associative,
    commutative, and idempotent — retried batches re-contribute the
    same hashes, which dedup away), hence
    ``state ← topk(distinct(state ∪ sketch(batch)))`` equals the
    batch sketch regardless of batch boundaries. Layout, retry
    idempotence and snapshot retention are shared with the other
    mergeable folds (``_stream_mergeable_fold``)."""
    from pyspark.sql import Window

    from decision_tree_stuff_spark.operators.sketch import (
        KMV_K,
        kmv_sketch,
    )

    k = k or KMV_K
    w = Window.orderBy("h")

    def _fold(rows: DataFrame) -> DataFrame:
        return (
            rows.select("h")
            .groupBy("h")
            .agg(F.lit(1).alias("_one"))
            .drop("_one")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("rank", "h")
        )

    return _stream_mergeable_fold(
        stream_df,
        state_dir,
        _fold,
        checkpoint_dir,
        prep_fn=lambda batch: kmv_sketch(batch, key_col, k=k),
    )


def _stream_mergeable_fold(
    stream_df: DataFrame,
    state_dir: str,
    select_fn,
    checkpoint_dir: str = None,
    prep_fn=None,
):
    """Shared foreachBatch fold for MERGEABLE selections (cap,
    weighted sample) and MERGEABLE summaries (count-min cells):
    state ← select(state ∪ prep(batch)) over versioned compacted
    parquet snapshots. Batch b derives from the newest version BELOW
    b and overwrites its own v{b} (idempotent under retry); snapshots
    older than the direct predecessor are pruned. ``prep_fn`` maps a
    raw micro-batch into state-schema rows (identity when the state
    rows ARE input rows, as for cap/sample)."""
    import os
    import shutil

    def _latest_version(below=None):
        try:
            versions = [
                int(d[1:])
                for d in os.listdir(state_dir)
                if d.startswith("v") and d[1:].isdigit()
            ]
        except FileNotFoundError:
            return None
        if below is not None:
            versions = [v for v in versions if v < below]
        return max(versions) if versions else None

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        prev = _latest_version(below=batch_id)
        merged = prep_fn(batch_df) if prep_fn is not None else batch_df
        if prev is not None:
            old = sp.read.parquet(os.path.join(state_dir, f"v{prev}"))
            merged = old.unionByName(merged.select(*old.columns))
        kept = select_fn(merged)
        kept.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )
        for v in [
            int(d[1:])
            for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit()
        ]:
            if v != batch_id and (prev is None or v != prev):
                shutil.rmtree(
                    os.path.join(state_dir, f"v{v}"), ignore_errors=True
                )

    q = (
        stream_df.writeStream.foreachBatch(_upsert)
        .option(
            "checkpointLocation",
            checkpoint_dir or state_dir.rstrip("/") + "_chk",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_ingest_pipeline(
    stream_df: DataFrame,
    state_dir: str,
    frequent: DataFrame,
    lm_model: DataFrame,
    group_cols: list,
    n: int,
    key_cols: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_n: int = 10,
    min_logprob: float = -20.0,
    seed: str = "cap",
    checkpoint_dir: str = None,
    audit_log: list = None,
    bloom_bench: DataFrame = None,
    bloom_n: int = 3,
    bloom_threshold: float = 0.5,
    emb_lookup: DataFrame = None,
    bench_emb: DataFrame = None,
    sem_threshold: float = 0.8,
    vec_col: str = "embedding",
    dedup_corpus: DataFrame = None,
    dedup_mode: str = "minhash",
    dedup_bands: int = 8,
    dedup_hash_fn: str = "md5km",
):
    """The 100 TB ingest story as ONE stream (round-7 task; r10 adds
    incremental dedup + the Bloom + semantic decontamination stages so
    the stream covers the batch flagship ``e12_batch_ingest``'s full
    stage ladder): per micro-batch,

      0. (``dedup_corpus`` given) incremental dedup against the
         MATERIALIZED historical corpus
         (``dedup.dedup_against_corpus`` — exact fingerprint or
         minhash band anti-join; the streaming answer to the batch
         flagship's within-corpus CC dedup, which is not
         micro-batch-expressible: a growing dataset dedups each new
         batch against what it already keeps),
      1. span-strip against the MATERIALIZED corpus boilerplate table
         (``frequent_spans`` output — learned offline, static here),
      2. LM-quality filter against the MATERIALIZED unigram model
         (docs scoring below ``min_logprob`` on their STRIPPED text
         are dropped — score after boilerplate removal, the order a
         production pipeline wants),
      3. (``bloom_bench`` given) Bloom n-gram decontamination: the
         bitset is built ONCE at pipeline setup — a bounded driver
         artifact, exactly the batch ``bloom_decontaminate`` filter —
         and each batch is a stateless scan→projection→filter probe
         of the binary literal (e12's s5 stage),
      4. (``bench_emb`` given) semantic decontamination: batch ids
         joined to the static ``emb_lookup`` embedding table, then
         the stateless broadcast anti-join of
         ``stream_semantic_decontam`` (e12's s6 stage; docs without
         an embedding and zero-norm vectors are kept, the batch
         contract),
      5. fold into the per-group quota state exactly as
         ``stream_cap_per_group`` does (versioned compacted snapshots,
         predecessor retained for retry idempotence, older pruned),

    with the per-stage funnel audit observed by the SAME action that
    writes the state (``run_with_audit`` — zero extra passes;
    per-batch funnels appended to ``audit_log`` as (batch_id, rows)).

    Stream ≡ batch by construction: stages 1-4 are pure per-document
    functions of (row, static tables/artifacts) — micro-batch-
    invariant — and the quota fold is the mergeable
    cap(A ∪ B) = cap(cap(A) ∪ B) selection, so the final state equals
    ``cap_per_group(sem(bloom(quality(strip(all input)))))``
    regardless of batch boundaries (pinned in
    tests/test_ingest_pipeline.py and
    tests/test_stream_semantic_decontam.py, including cross-batch
    evictions and the stage-for-stage e12 equality).

    Extra input columns (language tags, lengths — anything the quota
    groups on) ride through: the strip output is re-joined to the
    batch row by id, replacing only the text.
    """
    import os
    import shutil

    from decision_tree_stuff_spark.operators.audit import (
        audit_counts,
        run_with_audit,
    )
    from decision_tree_stuff_spark.operators.decontam import (
        bloom_bitset,
        bloom_decontaminate,
    )
    from decision_tree_stuff_spark.operators.dedup import (
        span_dedup_against_corpus,
    )
    from decision_tree_stuff_spark.operators.sampling import cap_per_group
    from decision_tree_stuff_spark.operators.textstats import unigram_logprob

    def _strip(d: DataFrame) -> DataFrame:
        stripped = span_dedup_against_corpus(
            d, frequent, id_col=id_col, text_col=text_col, n=span_n
        ).select(id_col, text_col)
        return d.drop(text_col).join(stripped, id_col)

    def _quality(d: DataFrame) -> DataFrame:
        keep = (
            unigram_logprob(
                d, id_col=id_col, text_col=text_col, model=lm_model
            )
            .where(F.col("mean_logprob") >= min_logprob)
            .select(id_col)
        )
        return d.join(keep, id_col)

    # the Bloom bitset is a bounded model artifact (k x |distinct
    # bench grams| positions): build it once here, NOT per micro-batch
    bloom_bits = (
        bloom_bitset(bloom_bench, id_col, text_col, bloom_n)
        if bloom_bench is not None
        else None
    )

    def _bloom(d: DataFrame) -> DataFrame:
        return bloom_decontaminate(
            d,
            n=bloom_n,
            threshold=bloom_threshold,
            train_id=id_col,
            text_col=text_col,
            bits=bloom_bits,
        )

    def _semantic(d: DataFrame) -> DataFrame:
        embd = d.select(id_col).join(emb_lookup, id_col)
        kept_ids = stream_semantic_decontam(
            embd,
            bench_emb,
            threshold=sem_threshold,
            id_col=id_col,
            vec_col=vec_col,
        ).select(id_col)
        # rows WITHOUT an embedding are kept (batch contract): drop
        # only ids that had an embedding and were anti-joined away
        flagged = embd.select(id_col).join(kept_ids, id_col, "left_anti")
        return d.join(flagged, id_col, "left_anti")

    def _dedup(d: DataFrame) -> DataFrame:
        from decision_tree_stuff_spark.operators.dedup import (
            dedup_against_corpus,
        )

        return dedup_against_corpus(
            d,
            dedup_corpus,
            id_col=id_col,
            text_col=text_col,
            mode=dedup_mode,
            bands=dedup_bands,
            hash_fn=dedup_hash_fn,
        )

    stage_fns = []
    if dedup_corpus is not None:
        stage_fns.append(("incremental_dedup", _dedup))
    stage_fns += [("span_strip", _strip), ("lm_quality", _quality)]
    if bloom_bench is not None:
        stage_fns.append(("bloom_decontam", _bloom))
    if bench_emb is not None:
        if emb_lookup is None:
            raise ValueError("bench_emb requires emb_lookup")
        stage_fns.append(("semantic_decontam", _semantic))

    def _latest_version(below=None):
        try:
            versions = [
                int(v[1:])
                for v in os.listdir(state_dir)
                if v.startswith("v") and v[1:].isdigit()
            ]
        except FileNotFoundError:
            return None
        if below is not None:
            versions = [v for v in versions if v < below]
        return max(versions) if versions else None

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        staged, obs = run_with_audit(batch_df, stage_fns)
        prev = _latest_version(below=batch_id)
        merged = staged
        if prev is not None:
            old = sp.read.parquet(os.path.join(state_dir, f"v{prev}"))
            merged = old.unionByName(staged.select(*old.columns))
        kept = cap_per_group(merged, group_cols, n, key_cols, seed)
        kept.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )
        if audit_log is not None:
            audit_log.append((batch_id, audit_counts(obs)))
        for v in [
            int(d[1:])
            for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit()
        ]:
            if v != batch_id and (prev is None or v != prev):
                shutil.rmtree(
                    os.path.join(state_dir, f"v{v}"), ignore_errors=True
                )

    q = (
        stream_df.writeStream.foreachBatch(_upsert)
        .option(
            "checkpointLocation",
            checkpoint_dir or state_dir.rstrip("/") + "_chk",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_capped_state(spark, state_dir: str) -> DataFrame:
    """The current quota table maintained by ``stream_cap_per_group``:
    the newest ``v{batch_id}`` snapshot (empty-input edge: raises if
    no snapshot exists yet)."""
    import os

    versions = [
        int(d[1:])
        for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]
    if not versions:
        raise FileNotFoundError(f"no capped-state snapshots in {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, f"v{max(versions)}"))


def stream_validate(
    stream_df: "DataFrame",
    state_dir: str,
    checks,
    checkpoint_dir: str = None,
):
    """Streaming E-13 validation: maintain, across micro-batches, the
    accumulator row the batch ``validate`` would compute over all
    input seen so far — quality metrics on an UNBOUNDED ingest stream
    with one-row state.

    Exactness argument: every supported metric is mergeable — counts
    and conditional counts add, min/max fold — so
    ``state <- merge(state UNION batch_accumulators)`` equals the
    batch aggregate regardless of batch boundaries (``uniqueness`` is
    rejected up front: distinct does not fold; see
    ``operators.validate``). Layout, retry idempotence and snapshot
    retention are shared with the other mergeable folds
    (``_stream_mergeable_fold``). Read the verdicts with
    ``read_validation_state``.
    """
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.validate import (
        _MERGE,
        compile_checks,
    )

    specs = compile_checks(checks, mergeable_only=True)

    def _prep(batch):
        return batch.agg(*[expr.alias(a) for a, expr, _ in specs])

    def _merge(merged):
        return merged.agg(
            *[_MERGE[kind](a).alias(a) for a, _, kind in specs]
        )

    return _stream_mergeable_fold(
        stream_df, state_dir, _merge, checkpoint_dir, prep_fn=_prep
    )


def read_validation_state(spark, state_dir: str, checks) -> "DataFrame":
    """The suite verdicts from the newest ``stream_validate``
    snapshot — the exact frame batch ``validate`` returns over the
    union of every micro-batch seen so far."""
    from decision_tree_stuff_spark.operators.validate import (
        _RESULT_SCHEMA,
        assemble_results,
    )

    m = read_capped_state(spark, state_dir).first().asDict()
    return spark.createDataFrame(
        assemble_results(checks, m), _RESULT_SCHEMA
    )


def run_stream_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    mode: str = "append",
    partition_by: list = None,
):
    """Execute a stream into a parquet file sink with a checkpoint —
    the durable path: exactly-once via the checkpoint's WAL + file
    manifest, restart-safe (a new query with the same checkpoint
    resumes from the last committed batch instead of reprocessing).
    File sinks only support append mode, so the upstream aggregation
    must be watermarked for Spark to know when a window is final.
    ``partition_by`` maps event-time windows to hive partitions so
    downstream reads prune by time."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(mode)
        .trigger(availableNow=True)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    q = w.start()
    q.awaitTermination()
    return q


def run_stream_to_memory(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Execute a streaming aggregation to completion over currently
    available input (availableNow trigger) into an in-memory table;
    returns the finished StreamingQuery. Test/debug harness — real
    deployments write to kafka/delta with checkpointing."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
