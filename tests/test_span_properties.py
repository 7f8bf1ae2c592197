"""Differential property test for contamination_spans (E-9d): the
Spark gaps-and-islands span reporter must equal an independent
pure-Python reference (flagging + positional grams + interval merge
reimplemented from the definitions, not from the operator's code) on
hypothesis-generated corpora.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from decision_tree_stuff_spark.operators.decontam import (
    contamination_spans,
)

VOCAB = ["aa", "bb", "cc", "dd", "ee"]


def _doc():
    return st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(
        " ".join
    )


def corpora():
    return st.tuples(
        st.lists(_doc(), min_size=1, max_size=4),  # train texts
        st.lists(_doc(), min_size=1, max_size=2),  # bench texts
    )


def _ref_spans(train, bench, n, threshold):
    """Pure-Python reference: containment flagging + every-occurrence
    positions + merge of [pos, pos+n-1] intervals with adjacency."""
    def toks(s):
        return [t for t in s.lower().split() if t]

    def gramset(s):
        ts = toks(s)
        return {
            " ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)
        }

    def positions(s):
        ts = toks(s)
        return [
            (i + 1, " ".join(ts[i : i + n]))
            for i in range(len(ts) - n + 1)
        ]

    out = set()
    for tid, ttext in train:
        for bid, btext in bench:
            bg = gramset(btext)
            if not bg:
                continue
            matched = len(gramset(ttext) & bg)
            if round(matched / len(bg), 6) < threshold:
                continue
            ivals = sorted(
                (p, p + n - 1) for p, g in positions(ttext) if g in bg
            )
            cur = None
            for s, e in ivals:
                if cur is None or s > cur[1] + 1:
                    if cur:
                        out.add((tid, bid) + cur)
                    cur = (s, e)
                else:
                    cur = (cur[0], max(cur[1], e))
            if cur:
                out.add((tid, bid) + cur)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora(), threshold=st.sampled_from([0.25, 0.5, 0.9]))
def test_spans_match_python_reference(spark, docs, threshold):
    train_texts, bench_texts = docs
    n = 2
    train = [(i + 1, t) for i, t in enumerate(train_texts)]
    bench = [(100 + i, t) for i, t in enumerate(bench_texts)]
    got = {
        (r["train_id"], r["bench_id"], r["start_tok"], r["end_tok"])
        for r in contamination_spans(
            spark.createDataFrame(train, "doc_id bigint, text string"),
            spark.createDataFrame(bench, "doc_id bigint, text string"),
            n=n,
            threshold=threshold,
        ).collect()
    }
    assert got == _ref_spans(train, bench, n, threshold), (train, bench)
