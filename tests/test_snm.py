"""Sorted-neighborhood blocking: rank machinery vs driver-side sort,
pair set vs brute-force windows, parallelism invariance, multi-pass
union."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.snm import (
    global_rank,
    snm_key,
    sorted_neighborhood_pairs,
)


def _brute_pairs(rows, keyfn, w):
    order = sorted(rows, key=lambda r: (keyfn(r), r[0]))
    ids = [r[0] for r in order]
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, min(i + w, len(ids))):
            out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_global_rank_matches_driver_sort(spark):
    """Two-phase ranks == row_number over the global (key, id) order,
    including heavy key duplication across range boundaries."""
    rng = random.Random(7)
    rows = [(i, f"k{rng.randrange(5)}") for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, k string").repartition(11)
    got = {
        r["id"]: r["_rank"]
        for r in global_rank(df, "k", "id", n_partitions=13).collect()
    }
    want = {
        rid: pos
        for pos, (rid, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    assert got == want


def test_rank_is_parallelism_invariant(spark):
    rows = [(i, f"key{i % 17}") for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    a = sorted(global_rank(df, "k", "id", n_partitions=1).collect())
    b = sorted(global_rank(df, "k", "id", n_partitions=23).collect())
    assert [(r["id"], r["_rank"]) for r in a] == [
        (r["id"], r["_rank"]) for r in b
    ]


def test_pairs_match_brute_force(spark):
    rng = random.Random(3)
    rows = [
        (i, " ".join(rng.choice("abcdef") for _ in range(6)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in sorted_neighborhood_pairs(
            df, window=4, key_length=5, n_partitions=9
        ).collect()
    }

    def keyfn(r):
        norm = " ".join(r[1].lower().split())
        return norm[:5]

    assert got == _brute_pairs(rows, keyfn, 4)


def test_pair_count_is_hard_linear_bound(spark):
    """(w-1)*n - w*(w-1)/2 pairs, independent of key skew — the
    property that distinguishes SNM from key-bucketed blockers."""
    df = spark.createDataFrame(
        [(i, "identical text every row") for i in range(50)],
        "doc_id bigint, text string",
    )
    n = sorted_neighborhood_pairs(df, window=5).count()
    assert n == 4 * 50 - 5 * 4 // 2


def test_multi_pass_unions_distinct(spark):
    """A duplicate pair found by both passes appears once; a pair only
    the suffix key finds is present."""
    df = spark.createDataFrame(
        [
            (1, "aaaa zzz1"),
            (2, "aaaa zzz2"),
            (3, "bbbb zzz1"),
            (4, "cccc yyyy"),
        ],
        "doc_id bigint, text string",
    )
    both = sorted_neighborhood_pairs(
        df,
        window=2,
        keys=[
            snm_key(F.col("text"), 4),
            F.substring(F.reverse(F.col("text")), 1, 4),
        ],
    )
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in both.collect()}
    # prefix pass (w=2) chains 1-2, 2-3, 3-4; reversed-suffix pass
    # sorts 1zzz/3zzz adjacent -> adds (1,3); (1,2) dedups across
    # passes' windows
    assert (1, 3) in got
    assert len(got) == len(set(got))


def test_null_text_participates(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "aaa")], "doc_id bigint, text string"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in sorted_neighborhood_pairs(df, window=2).collect()
    }
    # null and '' share the empty key -> adjacent; 'aaa' follows
    assert got == {(1, 2), (2, 3)}
