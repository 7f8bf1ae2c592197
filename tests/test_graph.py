"""PageRank (fixed-point micro-units) and degree-oriented triangle
counting (E-7d/E-7e): hand-math, pure-Python differentials,
partitioning bit-invariance, structure sanity."""

from __future__ import annotations

import math
from collections import defaultdict
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.graph import (
    MICRO,
    pagerank,
    triangle_counts,
)


def _ref_pagerank(node_ids, edge_pairs, iters, d=0.85):
    """Pure-Python mirror of the exact integer recipe: truncating
    div contributions, exact bigint sums, one half-away-rounded
    damping multiply per node per iteration."""
    adj = defaultdict(list)
    for a, b in edge_pairs:
        adj[a].append(b)
        adj[b].append(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    rank = {v: MICRO for v in node_ids}
    base = float(round((1.0 - d) * MICRO))
    for _ in range(iters):
        sums = {v: 0 for v in node_ids}
        for u, ns in adj.items():
            c = rank[u] // deg[u]
            for v in ns:
                sums[v] += c
        rank = {
            v: int(base + math.floor(d * sums[v] + 0.5))
            for v in node_ids
        }
    return rank


def _ref_triangles(edge_pairs):
    adj = defaultdict(set)
    for a, b in edge_pairs:
        adj[a].add(b)
        adj[b].add(a)
    rank = {v: (len(adj[v]), v) for v in adj}
    out = defaultdict(int)
    nodes = sorted(adj, key=lambda v: rank[v])
    for u, v, w in combinations(nodes, 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            apex = min((u, v, w), key=lambda x: rank[x])
            out[apex] += 1
    return dict(out)


NODES = list(range(12))
# two near-dup-ish clusters (one clique-y, one chainy) + bridge + isolate
EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 3),          # triangle + tail
    (4, 5), (5, 6), (6, 7), (4, 7), (4, 6),  # 4-cycle + chord
    (3, 4),                                  # bridge
    (8, 9), (9, 10),                         # path, no triangles
]  # node 11 isolated


@pytest.fixture(scope="module")
def graph_dfs(spark):
    nodes = spark.createDataFrame([(i,) for i in NODES], "doc_id long")
    pairs = spark.createDataFrame(EDGES, "id_a long, id_b long")
    return nodes, pairs


def test_pagerank_matches_pure_python(graph_dfs):
    nodes, pairs = graph_dfs
    got = {
        r["doc_id"]: r["rank_micro"]
        for r in pagerank(nodes, pairs, iterations=4).collect()
    }
    assert got == _ref_pagerank(NODES, EDGES, 4)


def test_pagerank_isolated_node_settles_at_base(graph_dfs):
    nodes, pairs = graph_dfs
    got = {
        r["doc_id"]: r["rank_micro"]
        for r in pagerank(nodes, pairs, iterations=3).collect()
    }
    assert got[11] == 150000


def test_pagerank_star_center_dominates(spark):
    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["rank_micro"]
        for r in pagerank(nodes, pairs, iterations=3).collect()
    }
    assert all(got[0] > got[i] for i in range(1, 7))


def test_pagerank_partitioning_bit_invariance(graph_dfs):
    nodes, pairs = graph_dfs
    a = sorted(
        tuple(r)
        for r in pagerank(
            nodes.repartition(1), pairs.repartition(1), iterations=3
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in pagerank(
            nodes.repartition(5, "doc_id"),
            pairs.repartition(7, "id_b"),
            iterations=3,
        ).collect()
    )
    assert a == b


def test_pagerank_rank_column_is_micro_rendering(graph_dfs):
    nodes, pairs = graph_dfs
    for r in pagerank(nodes, pairs, iterations=2).collect():
        assert r["rank"] == r["rank_micro"] / 1_000_000.0


def test_triangles_k4(spark):
    pairs = spark.createDataFrame(
        list(combinations(range(4), 2)), "id_a long, id_b long"
    )
    got = {
        r["apex_id"]: r["n_triangles"]
        for r in triangle_counts(pairs).collect()
    }
    assert got == {0: 3, 1: 1}
    assert sum(got.values()) == 4  # C(4,3)


def test_triangles_match_brute_force(graph_dfs):
    _, pairs = graph_dfs
    got = {
        r["apex_id"]: r["n_triangles"]
        for r in triangle_counts(pairs).collect()
    }
    assert got == _ref_triangles(EDGES)


def test_triangles_none_on_path(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    assert triangle_counts(pairs).count() == 0


def test_triangles_skewed_hub_differential(spark):
    # hub of degree 20 with a few closed fans — the orientation must
    # count at the LOW-degree apexes, never enumerating hub wedges
    edges = [(100, i) for i in range(20)] + [(0, 1), (2, 3), (4, 5)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["apex_id"]: r["n_triangles"]
        for r in triangle_counts(pairs).collect()
    }
    assert got == _ref_triangles(edges)
    assert sum(got.values()) == 3


# --- label propagation (E-7f, r11) ----------------------------------------


def _ref_label_prop(node_ids, edge_pairs, iters):
    """Pure-Python mirror: synchronous rounds, most-frequent neighbor
    label, ties to the smallest label, isolated nodes keep theirs."""
    adj = defaultdict(list)
    for a, b in edge_pairs:
        adj[a].append(b)
        adj[b].append(a)
    labels = {v: v for v in node_ids}
    for _ in range(iters):
        new = {}
        for v in node_ids:
            if not adj[v]:
                new[v] = labels[v]
                continue
            cnt = defaultdict(int)
            for u in adj[v]:
                cnt[labels[u]] += 1
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new
    return labels


def test_label_prop_matches_pure_python(graph_dfs):
    from decision_tree_stuff_spark.operators.graph import label_propagation

    nodes, pairs = graph_dfs
    for iters in (1, 3):
        got = {
            r["doc_id"]: r["label"]
            for r in label_propagation(nodes, pairs, iterations=iters).collect()
        }
        assert got == _ref_label_prop(NODES, EDGES, iters), iters


def test_label_prop_communities_structure(spark):
    """Two 4-cliques joined by ONE bridge edge: CC would merge them;
    LPA keeps two communities (each clique converges to its min id)."""
    from decision_tree_stuff_spark.operators.graph import label_propagation

    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = clique1 + clique2 + [(3, 10)]
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(4)) + list(range(10, 14))], "doc_id long"
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["label"]
        for r in label_propagation(nodes, pairs, iterations=4).collect()
    }
    # the two cliques form distinct communities despite the bridge
    labels1 = {got[i] for i in range(4)}
    labels2 = {got[i] for i in range(10, 14)}
    assert labels1 == {0}
    assert labels2 == {10}


def test_label_prop_isolated_node_keeps_own_label(graph_dfs):
    from decision_tree_stuff_spark.operators.graph import label_propagation

    nodes, pairs = graph_dfs
    got = {
        r["doc_id"]: r["label"]
        for r in label_propagation(nodes, pairs, iterations=3).collect()
    }
    assert got[11] == 11


def test_label_prop_convergence_counts_and_early_stop(spark):
    """r12: track_convergence rides the round's one existing action
    (observe on the eager checkpoint) and reports per-round label
    changes; early_stop ends at the fixed point with IDENTICAL labels
    to the full run (a zero-change round reproduces itself)."""
    from decision_tree_stuff_spark.operators.graph import label_propagation

    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = clique1 + clique2 + [(3, 10)]
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(4)) + list(range(10, 14))], "doc_id long"
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    out, changes = label_propagation(
        nodes, pairs, iterations=6, track_convergence=True
    )
    got = {r["doc_id"]: r["label"] for r in out.collect()}
    assert {got[i] for i in range(4)} == {0}
    assert {got[i] for i in range(10, 14)} == {10}
    # round 1 flips every non-minimum node; later rounds settle to 0
    assert len(changes) == 6
    assert changes[0] > 0
    assert changes[-1] == 0
    # monotone tail: once a round changes nothing, so do all later ones
    first_zero = changes.index(0)
    assert all(c == 0 for c in changes[first_zero:])

    stopped, changes_es = label_propagation(
        nodes, pairs, iterations=6, track_convergence=True,
        early_stop=True,
    )
    got_es = {r["doc_id"]: r["label"] for r in stopped.collect()}
    assert got_es == got
    assert len(changes_es) == first_zero + 1  # stopped AT the fixed point
    assert changes_es == changes[: first_zero + 1]

    # default return shape unchanged (the oracle row's contract)
    plain = label_propagation(nodes, pairs, iterations=3)
    assert hasattr(plain, "collect")


def _ref_pagerank_deltas(node_ids, edge_pairs, iters, d=0.85):
    """Per-round total |delta| in micro-units from the pure-Python
    mirror — the expected ``track_convergence`` trace."""
    adj = defaultdict(list)
    for a, b in edge_pairs:
        adj[a].append(b)
        adj[b].append(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    rank = {v: MICRO for v in node_ids}
    base = float(round((1.0 - d) * MICRO))
    deltas = []
    for _ in range(iters):
        sums = {v: 0 for v in node_ids}
        for u, ns in adj.items():
            c = rank[u] // deg[u]
            for v in ns:
                sums[v] += c
        new = {
            v: int(base + math.floor(d * sums[v] + 0.5))
            for v in node_ids
        }
        deltas.append(sum(abs(new[v] - rank[v]) for v in node_ids))
        rank = new
    return deltas


def test_pagerank_convergence_deltas_match_reference(graph_dfs):
    """r13: track_convergence reports each round's total absolute
    rank movement (micro-units) via observe on the round's existing
    checkpoint action; the trace matches the pure-Python mirror and
    tracking does not perturb the ranks."""
    nodes, pairs = graph_dfs
    out, deltas = pagerank(
        nodes, pairs, iterations=4, track_convergence=True
    )
    got = {r["doc_id"]: r["rank_micro"] for r in out.collect()}
    assert got == _ref_pagerank(NODES, EDGES, 4)
    assert deltas == _ref_pagerank_deltas(NODES, EDGES, 4)
    assert len(deltas) == 4 and deltas[0] > 0


def test_pagerank_early_stop_identity_on_converged_graph(spark):
    """r13: two disjoint 4-cliques are 3-regular — every node's rank
    stays exactly at MICRO (sum of MICRO div 3 over 3 edges = MICRO
    - 2, damped back to within rounding of MICRO... pinned below by
    the delta trace itself), so the integer fixed point is reached
    immediately and early_stop skips the dead rounds with IDENTICAL
    output to the full run."""
    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    node_ids = list(range(4)) + list(range(10, 14))
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id long")
    pairs = spark.createDataFrame(
        clique1 + clique2, "id_a long, id_b long"
    )

    full, deltas_full = pagerank(
        nodes, pairs, iterations=6, track_convergence=True
    )
    got_full = sorted(tuple(r) for r in full.collect())
    ref_deltas = _ref_pagerank_deltas(node_ids, clique1 + clique2, 6)
    assert deltas_full == ref_deltas
    first_zero = deltas_full.index(0)
    assert all(d == 0 for d in deltas_full[first_zero:])

    stopped, deltas_es = pagerank(
        nodes, pairs, iterations=6, track_convergence=True,
        early_stop=True,
    )
    got_es = sorted(tuple(r) for r in stopped.collect())
    assert got_es == got_full
    assert len(deltas_es) == first_zero + 1  # stopped AT the fixed point
    assert deltas_es == deltas_full[: first_zero + 1]

    # fixed-iteration contract preserved: default call shape unchanged
    plain = pagerank(nodes, pairs, iterations=2)
    assert hasattr(plain, "collect")
