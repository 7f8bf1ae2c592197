"""BPE trainer/encoder (operators/bpe.py) vs a pure-Python canonical
reference: merge sequence on hand corpora, greedy application
semantics on adjacent-repetition words (the case the double-space
replace convention exists for), null/empty handling, and the
shuffle-free encode plan pin.
"""

from __future__ import annotations

from collections import Counter

from decision_tree_stuff_spark.operators.bpe import (
    bpe_encode,
    bpe_merge_table,
    bpe_train,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- pure-Python canonical BPE (Sennrich et al. 2016 reference) ----

def _ref_apply(symbols, left, right, merged):
    out = []
    i = 0
    while i < len(symbols):
        if (
            i + 1 < len(symbols)
            and symbols[i] == left
            and symbols[i + 1] == right
        ):
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _ref_train(words_freq, n_merges):
    segs = {w: list(w) for w in words_freq}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, f in words_freq.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        # max count, tie-break on the 'a  b' pair STRING (the operator
        # orders by the double-space-joined representation)
        best = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}  {kv[0][1]}")
        )[0]
        merged = best[0] + best[1]
        merges.append((best[0], best[1], merged))
        segs = {w: _ref_apply(s, *best, merged) for w, s in segs.items()}
    return merges, segs


def _ref_encode(text, merges):
    toks = []
    for w in text.lower().split():
        s = list(w)
        for left, right, merged in merges:
            s = _ref_apply(s, left, right, merged)
        toks.extend(s)
    return toks


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_bpe_train_matches_reference_on_hand_corpus(spark):
    texts = ["low lower lowest", "new newer newest", "low low new"]
    docs = _corpus(spark, texts)
    words = Counter(w for t in texts for w in t.split())
    ref_merges, _ = _ref_train(words, 8)
    got = bpe_train(docs, n_merges=8)
    assert [(l, r, m) for _, l, r, m in got] == ref_merges


def _ref_train_wordpiece(words_freq, n_merges):
    """WordPiece criterion: argmax count(a,b)/(count(a)*count(b)),
    tie-break on the double-space pair string."""
    segs = {w: list(w) for w in words_freq}
    merges = []
    for _ in range(n_merges):
        pair_counts = Counter()
        sym_counts = Counter()
        for w, f in words_freq.items():
            s = segs[w]
            for sym in s:
                sym_counts[sym] += f
            for i in range(len(s) - 1):
                pair_counts[(s[i], s[i + 1])] += f
        if not pair_counts:
            break
        best = min(
            pair_counts.items(),
            key=lambda kv: (
                -(float(kv[1]) / (sym_counts[kv[0][0]] * sym_counts[kv[0][1]])),
                f"{kv[0][0]}  {kv[0][1]}",
            ),
        )[0]
        merged = best[0] + best[1]
        merges.append((best[0], best[1], merged))
        segs = {w: _ref_apply(s, *best, merged) for w, s in segs.items()}
    return merges


def test_wordpiece_train_matches_reference(spark):
    """Likelihood scoring must pick DIFFERENT merges than raw counts
    where a frequent pair is made of very frequent symbols, matching
    the pure-Python WordPiece reference exactly."""
    texts = ["low lower lowest", "new newer newest", "low low new"]
    docs = _corpus(spark, texts)
    words = Counter(w for t in texts for w in t.split())
    ref = _ref_train_wordpiece(words, 8)
    got = bpe_train(docs, n_merges=8, score="likelihood")
    assert [(l, r, m) for _, l, r, m in got] == ref
    # and it is genuinely a different criterion than count-BPE here
    count_ref, _ = _ref_train(words, 8)
    assert ref != count_ref


def test_bpe_greedy_application_on_repeated_pairs(spark):
    """'aaaa' under merge (a,a) must give [aa, aa] (canonical greedy),
    'aaaaa' -> [aa, aa, a], and an adjacent pair repetition 'abab'
    under (a,b) -> [ab, ab]. A single-space replace scheme fails all
    three (the trailing space of one match is the leading space of
    the next) — this test is the reason for the double-space
    convention."""
    docs = _corpus(spark, ["aaaa aaaaa abab"])
    out = bpe_encode(docs, [(1, "a", "a", "aa"), (2, "a", "b", "ab")])
    enc = out.collect()[0]["encoded"].split(" ")
    assert enc == ["aa", "aa", "aa", "aa", "a", "ab", "ab"]


def test_bpe_encode_matches_reference_on_real_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = bpe_train(docs, n_merges=10)
    rows = bpe_encode(docs, merges).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    ref = [(l, r, m) for _, l, r, m in merges]
    for row in rows:
        expect = _ref_encode(texts[row["doc_id"]], ref)
        assert row["encoded"].split(" ") == expect or (
            expect == [] and row["encoded"] == ""
        ), row["doc_id"]
        assert row["n_tokens_bpe"] == len(expect)


def test_bpe_merges_cannot_cross_word_boundaries(spark):
    """'ab' is frequent inside words; 'a b' as separate words must NOT
    merge across the guard."""
    docs = _corpus(spark, ["ab ab ab a b"])
    merges = bpe_train(docs, n_merges=1)
    assert [(m[1], m[2]) for m in merges] == [("a", "b")]
    enc = bpe_encode(docs, merges).collect()[0]["encoded"]
    assert enc == "ab ab ab a b"  # the lone 'a' 'b' words stay single


def test_bpe_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "  ")], "doc_id bigint, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in bpe_encode(docs, [(1, "a", "b", "ab")]).collect()
    }
    assert rows[0]["n_tokens_bpe"] is None and rows[0]["encoded"] is None
    assert rows[1]["n_tokens_bpe"] == 0 and rows[1]["encoded"] == ""
    assert rows[2]["n_tokens_bpe"] == 0


def test_bpe_early_stop_when_no_pairs_remain(spark):
    docs = _corpus(spark, ["a b c"])  # single-char words: zero pairs
    assert bpe_train(docs, n_merges=5) == []


def test_bpe_merge_table_roundtrip(spark):
    merges = [(1, "a", "b", "ab"), (2, "ab", "c", "abc")]
    t = bpe_merge_table(spark, merges)
    assert [tuple(r) for r in t.orderBy("rank").collect()] == merges


def test_bpe_encode_is_shuffle_free(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(bpe_encode(docs, [(1, "a", "b", "ab")]))
    assert "Exchange" not in plan, "encode must be a pure projection"


def test_bpe_encode_distinct_types_mode_identical(spark, sf_dir):
    """r12: the distinct-word-types replace-chain (per TYPE +
    broadcast join back) must equal the per-document projection —
    sound because merges never cross the '|' word guard."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    extra = docs.sparkSession.createDataFrame(
        [(90001, None), (90002, ""), (90003, "ab ab a b")],
        "doc_id bigint, text string",
    )
    docs = docs.unionByName(extra)
    merges = bpe_train(docs, n_merges=8)
    a = {
        r["doc_id"]: (r["n_tokens_bpe"], r["encoded"])
        for r in bpe_encode(docs, merges).collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens_bpe"], r["encoded"])
        for r in bpe_encode(docs, merges, distinct_types=True).collect()
    }
    assert a == b and len(a) > 100
    assert b[90001] == (None, None) and b[90002] == (0, "")
