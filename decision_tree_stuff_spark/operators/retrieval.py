"""Sparse retrieval scoring over ``documents`` (E-4bm): Okapi BM25
query→document top-k.

The member of the E-4 text family that data-curation pipelines use to
mine targeted subsets ("find the documents most relevant to these
probe queries") and that RAG evaluation uses as the lexical baseline.
Robertson et al.'s Okapi BM25 in the k1/b parameterization everybody
ships, with Lucene's non-negative idf:

    score(q, d) = sum over t in q of
        idf(t) * tf(t,d) * (k1 + 1)
                 / (tf(t,d) + k1 * (1 - b + b * dl(d) / avgdl))
    idf(t) = ln((N - df(t) + 0.5) / (df(t) + 0.5) + 1)

Scale design (the plan, in order):
  * document length is the size of the token array, projected BEFORE
    the explode — it rides the occurrence rows for free, so there is
    no separate corpus-sized dl join;
  * one explode + one (doc, token) groupBy builds term frequencies —
    the only corpus-sized shuffle, keyed high-cardinality/unskewed;
  * df aggregates the tf frame map-side-combinably to vocab size;
    (N, avgdl) is a 1-row scalar aggregate over the pre-explode base;
  * the query side is tiny by construction (a probe set, not a second
    corpus) — query terms with their df join in as BROADCASTS against
    tf, immediately shrinking the corpus side to query-term rows;
  * per-query top-k is a rank window partitioned by query_id —
    WindowGroupLimit prunes to k rows per group map-side before the
    final exchange.

At 100 TB: corpus cost = 1 scan + 2 linear groupBys; the query set's
size never touches the shuffle plan. Sum-of-double scores are rounded
to 6 dp (order-of-addition ulps) and ranked on the ROUNDED value with
doc-id tie-breaks, so top-k is deterministic and engine-portable;
avgdl itself is exact in both engines (bigint sum / count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from decision_tree_stuff_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    cache_tf: bool = False,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    ``queries`` is a small probe table (query_id, query_text) — it is
    broadcast; only the corpus-side term-frequency build shuffles. N
    counts ALL documents (token-less docs contribute dl=0 to avgdl but
    can never score). Returns (query_id, doc_id, score, rank), rank
    1-based by (rounded score desc, doc_id asc).

    ``cache_tf`` (r14 optimization round, guide §5 caching rule): the
    term-frequency table feeds TWO consumers — the per-query scoring
    join and the document-frequency aggregate behind the broadcast
    idf side — and without a cache each consumer replays the full
    corpus tokenize + explode + groupBy (the plan shows the documents
    scan twice per call through this subtree). ``tf`` is query-
    vocabulary-pruned (only (doc, query-term) rows survive the
    broadcast semi-join), four narrow columns, so persisting it
    trades one full tokenize pass for a small materialization. The
    same-session A/B at sf0.1 split exactly like the KMV
    ``cache_sketches`` story: with only two consumers the lazy
    replays overlap across cores inside one job and the persist's
    materialization barrier LOSES on the standalone rows
    (e4_bm25_topk 1.9-2.1 s lazy vs 2.1-2.2 s persisted;
    e4_hybrid_rrf 2.7-3.1 vs 3.0-3.5), while inside the composed
    retrieval pipeline (decontam stages downstream) it measures a
    wash-to-win (6.2/5.1/4.8 vs 5.7/4.8/4.7). Default stays lazy;
    composed or corpus-scale callers opt in (the retrieval-pipeline
    query does). MEMORY_AND_DISK, released when the returned frame
    is dropped (keep the RETURNED wrapper alive until execution —
    see ``utils.keepalive``); skipped for streaming inputs.
    """
    from decision_tree_stuff_spark.operators import spread_small

    base = spread_small(docs).select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("__toks"),
    )
    occ = base.select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("token"),
    )
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(tokens(F.col(query_text_col))).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    # prune BEFORE the corpus shuffle: a broadcast semi-join against
    # the query vocabulary drops every non-query token map-side, so
    # the tf exchange carries O(docs × |query vocab|) rows, not every
    # token occurrence in the corpus — the difference between a
    # query-sized shuffle and a corpus-sized one at 100 TB. df for
    # query terms still counts over the WHOLE corpus (the semi-join
    # only removes tokens no query asked about).
    occ_q = occ.join(
        F.broadcast(qterms.select("token").distinct()), "token", "semi"
    )
    tf = occ_q.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.max("dl").alias("dl"),  # constant per doc; max = deterministic pick
    )
    cached_tf = None
    if cache_tf and not docs.isStreaming:
        from pyspark import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
        cached_tf = tf
    try:
        return _bm25_score(
            base, tf, qterms, cached_tf, k, k1, b, id_col, query_id_col
        )
    except Exception:
        # plan construction failed after the persist (e.g. an
        # AnalysisException from a bad downstream column): without
        # this, the CacheManager registration has no finalizer yet
        # and leaks for the session (r14 advice).
        if cached_tf is not None:
            cached_tf.unpersist()
        raise


def _bm25_score(base, tf, qterms, cached_tf, k, k1, b, id_col, query_id_col):
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = base.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg(F.size("__toks")).alias("__avgdl"),  # exact: bigint sum / count
    )
    # df rows for query tokens only — a query-sized frame; broadcast
    # so scoring adds no exchange beyond tf's own.
    qdf = qterms.join(dfreq, "token")

    idf = F.log(
        (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl")))
    )
    scored = (
        tf.join(F.broadcast(qdf), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )
    if cached_tf is not None:
        from decision_tree_stuff_spark.utils import unpersist_when_dropped

        out = unpersist_when_dropped(out, cached_tf)
    return out


def rrf_fuse(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 10,
    c: float = 60.0,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    of two per-query rankings — the standard lexical+dense hybrid
    combiner in production retrieval (score = Σ 1/(c + rank), c=60
    per the paper).

    Inputs are (query_col, id_col, rank_col) frames — the top-k
    outputs of ``bm25_topk`` / ``similarity.cosine_topk``; a doc
    absent from one list simply contributes 0 from it (full outer
    join). Returns (query_col, id_col, rrf_score, rank) — the fused
    top-``k``, rank by (6dp-rounded score desc, id asc).

    Determinism: each contribution is ``1.0/(c + integer rank)`` —
    the identical IEEE double in any engine — and the fused score
    adds exactly two terms in a fixed order, so the 6dp round is
    cosmetic, not load-bearing. Scale: both inputs are already
    query×k-sized — fusion never touches the corpus.
    """
    a = rank_a.select(
        F.col(query_col), F.col(id_col), F.col(rank_col).alias("__ra")
    )
    b = rank_b.select(
        F.col(query_col), F.col(id_col), F.col(rank_col).alias("__rb")
    )
    fused = (
        a.join(b, [query_col, id_col], "full_outer")
        .select(
            query_col,
            id_col,
            F.round(
                F.coalesce(1.0 / (F.lit(c) + F.col("__ra")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(c) + F.col("__rb")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_col, id_col, "rrf_score", "rank")
    )
