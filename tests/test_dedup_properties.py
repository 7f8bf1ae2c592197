"""Property-based differential test for the blocked token-Jaccard
dedup: the DataFrame join program must equal brute-force Python set
math on random corpora (catches join/blocking/size-accounting bugs
the fixed synthetic corpus can't)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from decision_tree_stuff_spark.operators.dedup import ngram_jaccard_pairs

WORDS = ["spark", "join", "scan", "hash", "sort", "agg", "row", "col"]


@st.composite
def corpora(draw):
    n = draw(st.integers(3, 10))
    docs = []
    for i in range(n):
        k = draw(st.integers(1, 8))
        words = [draw(st.sampled_from(WORDS)) for _ in range(k)]
        lang = draw(st.sampled_from(["en", "fr"]))
        docs.append((i, " ".join(words), lang))
    return docs


def py_jaccard_pairs(docs, threshold):
    out = {}
    toks = {i: set(t.split()) for i, t, _ in docs}
    lang = {i: g for i, _, g in docs}
    for (a, _, _), (b, _, _) in itertools.combinations(docs, 2):
        if lang[a] != lang[b]:
            continue
        inter = len(toks[a] & toks[b])
        if inter == 0:
            continue
        j = round(inter / len(toks[a] | toks[b]), 6)
        if j >= threshold:
            out[(a, b)] = j
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora(), threshold=st.sampled_from([0.3, 0.5, 0.8]))
def test_jaccard_pairs_match_brute_force(spark, docs, threshold):
    df = spark.createDataFrame(docs, "doc_id bigint, text string, lang string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, block_cols=["lang"], threshold=threshold
        ).collect()
    }
    want = py_jaccard_pairs(docs, threshold)
    assert got == want, f"\ndocs={docs}\ngot={got}\nwant={want}"
