"""Okapi BM25 retrieval (operators/retrieval.py): hand-computed
scores on a tiny corpus, ranking semantics (rare term wins), N/avgdl
accounting for token-less docs, and the scale-plan pins (broadcast
query side, WindowGroupLimit top-k pruning).
"""

from __future__ import annotations

import math

from decision_tree_stuff_spark.operators.retrieval import bm25_topk


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _bm25(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)))


def test_bm25_hand_math(spark):
    """4-doc corpus, every quantity small enough to check by hand."""
    docs = spark.createDataFrame(
        [
            (0, "cat cat dog"),        # dl 3
            (1, "dog bird"),           # dl 2
            (2, "cat fish fish fish"), # dl 4
            (3, "bird bird bird"),     # dl 3
        ],
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame(
        [(1, "cat"), (2, "cat dog")], "query_id int, query_text string"
    )
    out = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(docs, queries, k=10).collect()
    }
    avgdl = 3.0  # (3 + 2 + 4 + 3) / 4
    # q1 "cat": df(cat)=2; matches docs 0 (tf 2, dl 3) and 2 (tf 1, dl 4)
    s0 = round(_bm25(2, 2, 4, 3, avgdl), 6)
    s2 = round(_bm25(1, 2, 4, 4, avgdl), 6)
    assert out[(1, 0)] == (s0, 1)
    assert out[(1, 2)] == (s2, 2)
    assert s0 > s2
    # q2 "cat dog": doc 0 matches both terms -> contributions add
    s0q2 = round(_bm25(2, 2, 4, 3, avgdl) + _bm25(1, 2, 4, 3, avgdl), 6)
    assert out[(2, 0)][0] == s0q2
    assert out[(2, 0)][1] == 1
    # doc 1 matches only "dog"; doc 3 matches nothing -> absent
    assert (2, 1) in out and (2, 3) not in out
    assert (1, 1) not in out and (1, 3) not in out


def test_bm25_rare_term_outranks_common(spark):
    """idf must put the one rare-term doc above common-term docs for a
    mixed query, regardless of tf."""
    rows = [(i, "common words here") for i in range(20)]
    rows.append((100, "rare common"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    queries = spark.createDataFrame(
        [(1, "rare common")], "query_id int, query_text string"
    )
    top = (
        bm25_topk(docs, queries, k=3)
        .where("rank = 1")
        .collect()
    )
    assert [r["doc_id"] for r in top] == [100]


def test_bm25_tokenless_docs_count_in_stats(spark):
    """Empty/whitespace docs never score but DO enter N and avgdl
    (dl=0) — the corpus-statistics convention the docstring pins."""
    docs = spark.createDataFrame(
        [(0, "cat cat"), (1, "   "), (2, "cat")],
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame(
        [(1, "cat")], "query_id int, query_text string"
    )
    out = {r["doc_id"]: r["score"] for r in bm25_topk(docs, queries).collect()}
    assert set(out) == {0, 2}
    # N=3 (not 2), avgdl = (2 + 0 + 1) / 3
    avgdl = 1.0
    assert out[0] == round(_bm25(2, 2, 3, 2, avgdl), 6)
    assert out[2] == round(_bm25(1, 2, 3, 1, avgdl), 6)


def test_bm25_ties_break_by_doc_id(spark):
    """Identical docs give identical rounded scores — rank must order
    them by doc_id ascending, deterministically."""
    docs = spark.createDataFrame(
        [(7, "x y"), (3, "x y"), (5, "x y")], "doc_id bigint, text string"
    )
    queries = spark.createDataFrame(
        [(1, "x")], "query_id int, query_text string"
    )
    got = [
        (r["doc_id"], r["rank"])
        for r in bm25_topk(docs, queries, k=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(3, 1), (5, 2)]


def test_bm25_plan_broadcasts_query_side_and_prunes_topk(spark, sf_dir):
    """Scale pins: the query-term/df and stats frames reach the corpus
    as broadcasts (no corpus reshuffle for scoring) and the per-query
    top-k is a WindowGroupLimit (k rows per group kept map-side)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = spark.createDataFrame(
        [(1, "fast hash join")], "query_id int, query_text string"
    )
    plan = _plan(bm25_topk(docs, queries, k=5))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    # corpus side: exactly the tf / df / final-agg exchanges, plus the
    # rank window's — no join-driven corpus reshuffle sneaks in
    assert "SortMergeJoin" not in plan


def test_rrf_hand_math(spark):
    from decision_tree_stuff_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 30, 2)], "query_id long, doc_id long, rank int"
    )
    got = [
        (r["doc_id"], r["rrf_score"], r["rank"])
        for r in rrf_fuse(a, b, k=10).orderBy("rank").collect()
    ]
    # doc 20: 1/62 + 1/61; doc 10: 1/61; doc 30: 1/62
    assert got == [
        (20, round(1 / 62 + 1 / 61, 6), 1),
        (10, round(1 / 61, 6), 2),
        (30, round(1 / 62, 6), 3),
    ]


def test_rrf_tie_breaks_on_id_and_cuts_k(spark):
    from decision_tree_stuff_spark.operators.retrieval import rrf_fuse

    # docs 7 and 3 each rank 1 in exactly one list -> equal score;
    # the lower id must win the tie, and k=1 keeps only it
    a = spark.createDataFrame(
        [(1, 7, 1)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 3, 1)], "query_id long, doc_id long, rank int"
    )
    got = rrf_fuse(a, b, k=1).collect()
    assert [(r["doc_id"], r["rank"]) for r in got] == [(3, 1)]


def test_rrf_multiple_queries_fuse_independently(spark):
    from decision_tree_stuff_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (2, 30, 1)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 10, 2), (2, 40, 1)], "query_id long, doc_id long, rank int"
    )
    out = rrf_fuse(a, b, k=5)
    byq = {}
    for r in out.collect():
        byq.setdefault(r["query_id"], []).append((r["doc_id"], r["rank"]))
    assert sorted(byq[1]) == [(10, 1)]
    assert sorted(byq[2]) == [(30, 1), (40, 2)]
