"""exact_substring_matches (r11): suffix-array-style exact-substring
dedup — sorted-anchor + diagonal merge. Differential-tested against a
brute-force Python maximal-common-substring scan, plus the planted
boundary-straddling-duplicate scenario that chunk-frequency span
dedup misses BY DESIGN (the operator's reason to exist)."""

import pytest

from decision_tree_stuff_spark.operators.dedup import (
    exact_substring_matches,
    span_dedup,
)


def _brute_maximal(ta: str, tb: str, L: int):
    """All maximal common substrings of length >= L between two
    normalized strings, as (pos_a, pos_b, match_len) 1-based — the
    diagonal-walk definition the operator implements."""
    out = set()
    for diag in range(-len(tb) + 1, len(ta)):
        i = max(0, diag)
        j = i - diag
        run = 0
        while i < len(ta) and j < len(tb):
            if ta[i] == tb[j]:
                run += 1
            else:
                if run >= L:
                    out.add((i - run + 1, j - run + 1, run))
                run = 0
            i += 1
            j += 1
        if run >= L:
            out.add((i - run + 1, j - run + 1, run))
    return out


def _norm(s: str) -> str:
    import re

    return re.sub(r"\s+", " ", s.lower()).strip()


def _collect(df):
    return {
        (r["id_a"], r["id_b"], r["pos_a"], r["pos_b"], r["match_len"])
        for r in df.collect()
    }


def test_differential_vs_bruteforce_two_docs(spark):
    """Uncapped operator output == the brute-force maximal-match set,
    on texts engineered with shared runs at unaligned offsets,
    repeats, and near-misses."""
    shared = "the quick brown fox jumps over the lazy dog near the river"
    docs = [
        (1, f"alpha beta {shared} gamma delta epsilon zeta"),
        (2, f"one two three four {shared} and then something else"),
    ]
    L = 12
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = _collect(exact_substring_matches(df, min_len=L, max_df=None))
    ta, tb = _norm(docs[0][1]), _norm(docs[1][1])
    want = {(1, 2, pa, pb, m) for pa, pb, m in _brute_maximal(ta, tb, L)}
    assert got == want
    assert len(got) >= 1  # the planted run is found
    # the longest reported match is the shared run INCLUDING its
    # matching flank spaces (maximality extends through them)
    top = max(got, key=lambda t: t[4])
    assert top[4] == len(shared) + 2
    assert ta[top[2] - 1 : top[2] - 1 + top[4]] == f" {shared} "


def test_differential_vs_bruteforce_multi_docs(spark):
    """Three docs with pairwise and three-way shared material: the
    operator must equal the brute force on EVERY ordered pair."""
    quote = "to be or not to be that is the question"
    boiler = "all rights reserved worldwide"
    docs = [
        (10, f"intro text {quote} middle {boiler} outro one"),
        (20, f"{boiler} preface {quote} closing remarks here"),
        (30, f"unrelated body {quote} and also {quote} twice"),
    ]
    L = 10
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = _collect(exact_substring_matches(df, min_len=L, max_df=None))
    texts = {d: _norm(t) for d, t in docs}
    want = set()
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            want |= {
                (a, b, pa, pb, m)
                for pa, pb, m in _brute_maximal(texts[a], texts[b], L)
            }
    assert got == want


def test_boundary_straddling_low_frequency_duplicate(spark):
    """The reason this operator exists (r10 verdict, missing #1): a
    long verbatim duplicate shared by EXACTLY TWO documents at
    different token offsets straddles span_dedup's fixed n-token
    chunk grid, so chunk-frequency dedup keeps both copies untouched
    — exact_substring_matches reports it with exact span + length."""
    dup = (
        "this exact licence paragraph appears verbatim in both "
        "documents and must be caught"
    )
    docs = [
        # different leading token counts => chunk grids misalign
        (1, f"x {dup} trailing words here to fill the first document"),
        (2, f"a b c d e f g {dup} and a completely different tail text"),
        (3, "an unrelated third document with no shared material at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    # span_dedup at n=5: no 5-token chunk is shared on-grid, so every
    # doc survives with all chunks kept (the documented miss)
    sd = {r["doc_id"]: r for r in span_dedup(df, n=5).collect()}
    assert all(sd[d]["n_kept"] == sd[d]["n_chunks"] for d in (1, 2, 3))

    got = _collect(exact_substring_matches(df, min_len=20, max_df=None))
    ta, tb = _norm(docs[0][1]), _norm(docs[1][1])
    # maximality extends through the matching flank spaces
    pa, pb = ta.index(dup), tb.index(dup)  # 1-based pos of ' <dup>'
    planted = [t for t in got if t[0] == 1 and t[1] == 2 and t[4] >= len(dup)]
    assert planted == [(1, 2, pa, pb, len(dup) + 2)]
    assert ta[pa - 1 : pa - 1 + len(dup) + 2] == f" {dup} "
    # and nothing involves the unrelated doc
    assert not [t for t in got if 3 in (t[0], t[1])]


def test_hot_gram_cap_suppresses_boilerplate(spark):
    """With a finite max_df, a gram occurring in MANY docs (the
    squaring boilerplate key) is dropped: pairs supported only by
    over-cap grams vanish while rare long matches survive."""
    boiler = "standard footer text repeated everywhere in the corpus"
    rare = "a genuinely rare shared sentence that links two documents"
    docs = [(i, f"doc number {i} body {boiler}") for i in range(1, 9)]
    docs += [(100, f"left {rare} tail"), (101, f"right side {rare} end")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = _collect(exact_substring_matches(df, min_len=25, max_df=5))
    # every anchor inside the 8x-repeated boilerplate exceeds df=5
    assert not [t for t in got if t[0] < 100]
    rare_hits = [t for t in got if t[0] == 100 and t[1] == 101]
    assert len(rare_hits) == 1 and rare_hits[0][4] == len(rare) + 2


def test_short_and_empty_docs_yield_nothing(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "  "), (3, None), (4, "also tiny")],
        "doc_id bigint, text string",
    )
    assert exact_substring_matches(df, min_len=20).count() == 0


def test_min_len_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        exact_substring_matches(df, min_len=0)


# --- corpus-vs-bench decontam wrapper (E-9e, r11) --------------------------


def test_substring_decontam_planted_leak(spark):
    from decision_tree_stuff_spark.operators.decontam import (
        exact_substring_decontam,
    )

    # boundary chars around the quote differ between the two sides
    # (no shared space), so the MAXIMAL match is exactly the quote
    quote = "the quick brown fox jumps over the lazy dog tonight"
    corpus = spark.createDataFrame(
        [
            (1, f"aaa{quote}bbb filler of corpus words"),
            (2, "completely unrelated corpus document body here"),
            # corpus-corpus duplicate: must NOT be reported
            (3, f"aaa{quote}bbb filler of corpus words"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(7, f"ccc {quote} ddd benchmark tail")],
        "doc_id bigint, text string",
    )
    got = exact_substring_decontam(
        corpus, bench, min_len=25, max_df=50
    ).collect()
    assert {r["doc_id"] for r in got} == {1, 3}
    assert all(r["bench_id"] == 7 for r in got)
    for r in got:
        assert r["match_len"] == len(quote), r
        assert r["pos"] == 4, r           # after 'aaa', 1-based
        assert r["bench_pos"] == 5, r     # after 'ccc ', 1-based


def test_substring_decontam_rejects_out_of_range_ids(spark):
    import pytest as _pytest

    from decision_tree_stuff_spark.operators.decontam import (
        exact_substring_decontam,
    )

    corpus = spark.createDataFrame(
        [(1 << 41, "x" * 40)], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame(
        [(1, "y" * 40)], "doc_id bigint, text string"
    )
    with _pytest.raises(Exception, match="out of"):
        exact_substring_decontam(corpus, bench, min_len=25).collect()


def test_cap_report_accounts_dropped_grams(spark):
    """r12: the cap report must name exactly what a max_df drops —
    counts AND the hottest dropped gram's text — and report zero
    drops when the cap is above every df."""
    from decision_tree_stuff_spark.operators.dedup import (
        exact_substring_cap_report,
    )

    boiler = "x" * 30  # one 30-char run shared by ALL docs
    rows = [(i, boiler + f" unique tail {i} " + "q" * i) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    r = exact_substring_cap_report(
        docs, min_len=25, max_df=4
    ).first()
    assert r["max_df_used"] == 4
    # the boilerplate 25-grams inside the shared 30-char run have
    # df = 8 > 4 -> dropped; they are the all-'x' grams
    assert r["n_dropped_grams"] >= 1
    assert r["n_dropped_anchors"] >= 8
    assert set(r["example_gram"]) == {"x"}
    assert r["n_grams"] > r["n_dropped_grams"]
    assert r["n_anchors"] > r["n_dropped_anchors"]

    r2 = exact_substring_cap_report(docs, min_len=25, max_df=1000).first()
    assert r2["n_dropped_grams"] == 0 and r2["n_dropped_anchors"] == 0
    assert r2["example_gram"] is None
