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
