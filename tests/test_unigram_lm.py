"""Unigram-LM (SentencePiece-style) trainer vs a pure-Python
reference implementing the IDENTICAL quantized soft-EM (fixed fold
orders, micro-unit expected counts) — the bpe/wordpiece differential
pattern. Bit-equality is asserted, not approximate closeness: the
operator's portability contract is IEEE +,*,/ with fixed order, so
the twin must reproduce every micro count exactly."""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import re

from decision_tree_stuff_spark.operators.bpe import (
    unigram_lm_train,
    unigram_table,
)


def _round_away0(x: float) -> int:
    # exact twin of Spark F.round(x, 0) = BigDecimal(x) HALF_UP:
    # Decimal(float) is the exact binary expansion
    return int(Decimal(x).quantize(Decimal("1"), ROUND_HALF_UP))


def _ref_unigram(
    word_freqs: dict,
    vocab_size: int,
    seed_size: int,
    P: int,
    W: int,
    em_iters: int,
):
    words = Counter()
    for w, f in word_freqs.items():
        if w:
            words[w[:W]] += f
    seed = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for k in range(1, min(P, len(w) - i) + 1):
                seed[w[i : i + k]] += f
    vocab = {g: c for g, c in seed.items() if len(g) == 1}
    for g in sorted(
        (g for g in seed if len(g) >= 2), key=lambda g: (-seed[g], g)
    )[:seed_size]:
        vocab[g] = seed[g]
    total = sum(vocab.values())
    if total == 0:
        return []
    probs = {g: c / total for g, c in vocab.items()}
    counts: dict = {}
    for _ in range(em_iters):
        em: Counter = Counter()
        for w, f in words.items():
            n = len(w)
            a = [1.0]
            for i in range(1, n + 1):
                s = 0.0
                for k in range(1, P + 1):
                    t = (
                        a[i - k] * probs.get(w[i - k : i], 0.0)
                        if i - k >= 0
                        else 0.0
                    )
                    s = s + t
                a.append(s)
            b = [0.0] * (n + 1)
            b[n] = 1.0
            for j in range(n - 1, -1, -1):
                s = 0.0
                for k in range(1, P + 1):
                    t = (
                        probs.get(w[j : j + k], 0.0) * b[j + k]
                        if j + k <= n
                        else 0.0
                    )
                    s = s + t
                b[j] = s
            z = a[n]
            if not z > 0.0:
                continue
            for j in range(n):
                for k in range(1, min(P, n - j) + 1):
                    g = w[j : j + k]
                    if g in probs:
                        x = (
                            (((a[j] * probs[g]) * b[j + k]) / z)
                            * float(f)
                        ) * 1e6
                        em[g] += _round_away0(x)
        counts = {g: em.get(g, 0) for g in probs}
        t = sum(counts.values())
        if t <= 0:
            break
        probs = {g: c / t for g, c in counts.items()}
    ranked = sorted(
        (g for g, c in counts.items() if c > 0),
        key=lambda g: (-counts[g], g),
    )[:vocab_size]
    return [(r + 1, g, counts[g]) for r, g in enumerate(ranked)]


def _word_freqs(texts) -> dict:
    wf: Counter = Counter()
    for t in texts:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        for tok in norm.split(" "):
            if tok:
                wf[tok] += 1
    return wf


CORPUS = [
    "the theatre bathes in the warm light of the evening",
    "warm warmth warms the theatre the theme repeats",
    "light lighting lights the bath in warm water",
    "repeat the theme of light and warmth in the evening",
    "bathing in warm light the evening theatre repeats its theme",
]


def test_differential_vs_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id bigint, text string",
    )
    got = unigram_lm_train(
        df,
        vocab_size=15,
        seed_size=20,
        max_piece_len=3,
        max_word_len=8,
        em_iters=2,
    )
    want = _ref_unigram(
        _word_freqs(CORPUS),
        vocab_size=15,
        seed_size=20,
        P=3,
        W=8,
        em_iters=2,
    )
    assert got == want  # bit-exact micro counts, same ranks


def test_differential_second_config(spark):
    """Different lattice bounds + more EM rounds: the equality must
    hold at any configuration, not one lucky setting."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id bigint, text string",
    )
    got = unigram_lm_train(
        df,
        vocab_size=25,
        seed_size=40,
        max_piece_len=4,
        max_word_len=6,
        em_iters=3,
    )
    want = _ref_unigram(
        _word_freqs(CORPUS),
        vocab_size=25,
        seed_size=40,
        P=4,
        W=6,
        em_iters=3,
    )
    assert got == want


def test_training_signal_is_sensible(spark):
    """The trainer must behave like a unigram trainer: multi-char
    pieces of genuinely repeated morphemes survive pruning and rank
    above junk, and every rank/count is positive and ordered."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id bigint, text string",
    )
    out = unigram_lm_train(
        df,
        vocab_size=20,
        seed_size=30,
        max_piece_len=3,
        max_word_len=8,
        em_iters=2,
    )
    assert 0 < len(out) <= 20
    ranks = [r for r, _, _ in out]
    assert ranks == list(range(1, len(out) + 1))
    cnts = [c for _, _, c in out]
    assert cnts == sorted(cnts, reverse=True) and cnts[-1] > 0
    pieces = {g for _, g, _ in out}
    # 'the' dominates this corpus (word + prefix of theatre/theme):
    # a unigram EM must keep it as a piece
    assert "the" in pieces
    tab = unigram_table(spark, out)
    assert tab.count() == len(out)
    assert [f.name for f in tab.schema.fields] == [
        "rank",
        "piece",
        "count_micro",
    ]


def test_empty_and_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert unigram_lm_train(empty) == []
    ws = spark.createDataFrame(
        [(1, "   "), (2, None)], "doc_id bigint, text string"
    )
    assert unigram_lm_train(ws) == []


def test_repeated_call_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id bigint, text string",
    )
    kw = dict(
        vocab_size=15,
        seed_size=20,
        max_piece_len=3,
        max_word_len=8,
        em_iters=2,
    )
    assert unigram_lm_train(df, **kw) == unigram_lm_train(df, **kw)


# --- Viterbi encode (r11, the apply path) ---------------------------------


def _brute_best_seg(word, probs, P):
    """Exhaustive segmentation argmax with the operator's tie rule:
    max score, then lexicographically-largest REVERSED piece-length
    sequence (longer last piece first) — independent of the DP."""
    from decision_tree_stuff_spark.operators.bpe import UNIGRAM_UNK_P

    def plook(s):
        if s in probs:
            return probs[s]
        return UNIGRAM_UNK_P if len(s) == 1 else 0.0

    def segs(w):
        if not w:
            yield []
            return
        for k in range(1, min(P, len(w)) + 1):
            for rest in segs(w[k:]):
                yield [w[:k]] + rest

    best, best_key = None, None
    for seg in segs(word):
        score = plook(seg[0])
        for piece in seg[1:]:
            score = score * plook(piece)  # left-nested, like the DP
        key = (score, tuple(len(p) for p in reversed(seg)))
        if best_key is None or key > best_key:
            best, best_key = seg, key
    return best


def test_encode_differential_vs_python_and_brute_force(spark):
    from decision_tree_stuff_spark.operators.bpe import (
        unigram_encode,
        unigram_encode_py,
        unigram_lm_train,
    )

    texts = [
        "lowest newer low lower newest wide widely news",
        "low low lower newest wide news widely",
        "the newest of the new lows",
        "wid wid wid lo lo lo we we we",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    pieces = unigram_lm_train(
        docs, vocab_size=20, seed_size=30, max_piece_len=3,
        max_word_len=8, em_iters=2,
    )
    assert pieces
    got = {
        r["doc_id"]: (r["n_pieces"], r["encoded"])
        for r in unigram_encode(docs, pieces).collect()
    }
    total = float(sum(c for _, _, c in pieces))
    probs = {g: c / total for _, g, c in pieces}
    for i, t in enumerate(texts):
        # Python twin of the DP
        want = unigram_encode_py(t, pieces)
        assert got[i] == (len(want), " ".join(want)), (i, got[i], want)
        # and the DP result IS the exhaustive argmax, word by word
        for w in t.split():
            enc = unigram_encode_py(w, pieces)
            assert enc == _brute_best_seg(w[:8], probs, 3), w


def test_encode_oov_chars_fall_back_to_singles(spark):
    from decision_tree_stuff_spark.operators.bpe import (
        unigram_encode,
        unigram_lm_train,
    )

    docs = spark.createDataFrame(
        [(0, "aaa bbb aaa")], "doc_id bigint, text string"
    )
    pieces = unigram_lm_train(docs, vocab_size=8, seed_size=10)
    probe = spark.createDataFrame(
        [(1, "aaa zzz")], "doc_id bigint, text string"
    )
    r = unigram_encode(probe, pieces).collect()[0]
    # 'zzz' has no in-vocab pieces: segments as UNK singles z z z
    assert "z z z" in r["encoded"]
    assert r["n_pieces"] >= 4


def test_encode_null_and_empty_text(spark):
    from decision_tree_stuff_spark.operators.bpe import (
        unigram_encode,
        unigram_lm_train,
    )

    train = spark.createDataFrame(
        [(0, "ab ab ba")], "doc_id bigint, text string"
    )
    pieces = unigram_lm_train(train, vocab_size=6, seed_size=8)
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_pieces"], r["encoded"])
        for r in unigram_encode(docs, pieces).collect()
    }
    assert got[1] == (None, None)
    assert got[2] == (0, "")
    assert got[3][0] >= 1


def test_encode_distinct_types_mode_identical(spark, sf_dir):
    """r12: the distinct-word-types encode (DP per TYPE + broadcast
    join back) must produce byte-identical output to the shuffle-free
    per-occurrence projection, including null/empty text."""
    from decision_tree_stuff_spark.operators.bpe import (
        unigram_encode,
        unigram_lm_train,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [(90001, None), (90002, ""), (90003, "ab ab xyzzy")],
        "doc_id bigint, text string",
    )
    docs = docs.unionByName(extra)
    pieces = unigram_lm_train(docs, vocab_size=40, seed_size=60)
    a = {
        r["doc_id"]: (r["n_pieces"], r["encoded"])
        for r in unigram_encode(docs, pieces).collect()
    }
    b = {
        r["doc_id"]: (r["n_pieces"], r["encoded"])
        for r in unigram_encode(
            docs, pieces, distinct_types=True
        ).collect()
    }
    assert a == b and len(a) > 100
    assert b[90001] == (None, None) and b[90002] == (0, "")
