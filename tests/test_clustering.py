"""Connected-components / dedup-cluster tests (operators/clustering.py).

Hand-built graphs pin the semantics (transitive closure, min-id
canonical, isolated nodes); the corpus-level path is value-checked
against the DuckDB recursive-CTE oracle via test_oracle_parity
(e7_dedup_clusters).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from decision_tree_stuff_spark.operators.clustering import (
    connected_components,
    dedup_clusters,
    dedup_keep,
)


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


def _pairs(spark, pairs):
    return spark.createDataFrame(
        list(pairs) or [(None, None)], "id_a bigint, id_b bigint"
    ).where("id_a IS NOT NULL")


def test_chain_merges_transitively(spark):
    # 1-2, 2-3, 3-4 is one component even though 1 and 4 never pair
    out = connected_components(
        _nodes(spark, [1, 2, 3, 4, 9]), _pairs(spark, [(1, 2), (2, 3), (3, 4)])
    )
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_result_keyed_on_nodes_frame(spark):
    # precondition violation (ids in pairs missing from nodes) must not
    # leak invented rows: the result stays keyed on the caller's nodes
    # frame, while the out-of-nodes id still transitively connects its
    # in-nodes neighbors (r4 regression: touched ∪ isolated emitted
    # edge-endpoint ids that nodes never contained)
    out = connected_components(
        _nodes(spark, [1, 3]), _pairs(spark, [(1, 2), (2, 3)])
    )
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == {1: 1, 3: 1}


def test_two_components_and_isolates(spark):
    out = connected_components(
        _nodes(spark, [1, 2, 3, 10, 11, 20]),
        _pairs(spark, [(2, 3), (10, 11), (11, 10)]),
    )
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 2, 10: 10, 11: 10, 20: 20}


def test_long_chain_converges(spark):
    # adversarial diameter: 0-1-2-...-11 (propagation needs ~log
    # rounds via doubling of the min label along the chain)
    n = 12
    out = connected_components(
        _nodes(spark, range(n)), _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    )
    assert {r.cluster_id for r in out.collect()} == {0}


def test_adversarial_chain_converges_in_log_rounds(spark):
    # 200-node path, diameter 199: plain propagation would need ~200
    # rounds; pointer doubling must land well inside 10
    n = 200
    out = connected_components(
        _nodes(spark, range(n)),
        _pairs(spark, [(i, i + 1) for i in range(n - 1)]),
        max_rounds=10,
    )
    assert {r.cluster_id for r in out.collect()} == {0}


def test_no_pairs_all_kept(spark):
    out = dedup_clusters(_nodes(spark, [5, 6]), _pairs(spark, []))
    rows = {(r.doc_id, r.cluster_id, r.is_kept) for r in out.collect()}
    assert rows == {(5, 5, True), (6, 6, True)}


def test_dedup_keep_semi_join_preserves_columns(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id bigint, text string"
    )
    kept = dedup_keep(docs, _pairs(spark, [(1, 2)]))
    assert sorted(kept.columns) == ["doc_id", "text"]
    assert {r.doc_id for r in kept.collect()} == {1, 3}


def _py_union_find(n, pairs):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component min = min over members (roots are not min by
    # construction here, so resolve then min-reduce)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    out = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            out[i] = m
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_components_match_union_find(spark, data):
    """Differential: the distributed propagation (with pointer
    doubling) must equal a pure-Python union-find on random graphs —
    catches wrong-direction propagation, missed symmetrization, and
    premature-convergence bugs that hand-built graphs can't."""
    n = data.draw(st.integers(2, 14))
    pairs = data.draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)).filter(
                lambda p: p[0] != p[1]
            ),
            max_size=12,
        )
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            _nodes(spark, range(n)), _pairs(spark, pairs)
        ).collect()
    }
    assert got == _py_union_find(n, pairs), f"n={n} pairs={pairs}"


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(
            _nodes(spark, range(9)),
            _pairs(spark, [(i, i + 1) for i in range(8)]),
            max_rounds=2,
        )


def test_connected_components_reliable_checkpoint_mode(spark, tmp_path):
    """checkpoint_mode='reliable' runs the same propagation through
    checkpoint() files (executor-loss-safe on a real cluster) and
    produces identical labels; without a checkpoint dir it errors
    up front instead of dying mid-round."""
    import pytest

    from decision_tree_stuff_spark.operators.clustering import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (6, 7)], "id_a bigint, id_b bigint"
    )

    old_dir = spark.sparkContext._jsc.sc().getCheckpointDir()
    assert not old_dir.isDefined() or True  # snapshot only
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(
            nodes, pairs, checkpoint_mode="reliable"
        ).collect()
    }
    want = {(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5), (6, 6), (7, 6)}
    assert got == want

    with pytest.raises(ValueError):
        connected_components(nodes, pairs, checkpoint_mode="nope")


def test_dedup_keep_best_prefers_high_score_then_min_id(spark):
    from decision_tree_stuff_spark.operators.clustering import dedup_keep_best

    docs = spark.createDataFrame(
        [(0, 10), (1, 99), (2, 99), (3, 5), (7, 1)],
        "doc_id bigint, n_chars bigint",
    )
    # cluster {0,1,2}: 1 and 2 tie on score 99 -> keep 1 (smaller id);
    # cluster {3}: isolated, kept; {7}: isolated, kept
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a bigint, id_b bigint")
    kept = {r.doc_id for r in dedup_keep_best(docs, pairs, "n_chars").collect()}
    assert kept == {1, 3, 7}
