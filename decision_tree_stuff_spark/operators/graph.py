"""Graph analytics over the near-dup pair graph (E-7d/E-7e):
PageRank and triangle counting — the structural complements to the
connected-components resolver (``clustering.py``). CC tells you
*which* docs form a duplication cluster; PageRank ranks the most
central copies inside the similarity graph (a keep-best signal that
degree alone misses), and triangle counts measure how clique-like a
cluster is (near-dup clusters are cliques; chains of borderline
matches are not — a cheap cluster-quality audit).

Determinism contracts (what makes iterative/float graph ops
oracle-able bit-for-bit):

* PageRank runs in **micro-units fixed point**: ranks are BIGINTs in
  1e-6 units; per-edge contributions use truncating integer division
  (``rank div deg`` — exact, partial-sum-order independent); the
  damping multiply is the only float op, applied once per node per
  iteration to an exact integer (identical IEEE double in any engine)
  and immediately re-quantized with half-away ``round``. No float
  ever enters a SUM, so any partitioning and any engine produce the
  same integers. The quantization loses < 1 micro-unit of mass per
  edge per iteration (truncation) — documented, monotone, and
  irrelevant to ranking use.
* Triangle counting is all-integer.

Scale notes (100 TB pair graph):
* PageRank: the degree-annotated edge list is built once and
  persisted partitioned on ``src``; each iteration is ONE
  co-partitioned join (ranks come out of the previous iteration's
  groupBy already hash-partitioned on the id) + ONE map-side-combined
  sum — the Pregel shape without per-node state.
* Triangle counting orients every edge from its lower-(degree, id)
  endpoint to the higher one, so wedge fan-out at a hub of degree Δ
  collapses from Δ² to the number of its *higher-degree* neighbor
  pairs — the O(m^1.5) bound of Schank & Wagner '05 / Suri &
  Vassilvitskii's "curse of the last reducer" (WWW'11) mitigation.
  No hot-key cap needed: the orientation IS the skew bound.

Beyond the reference (its graph story ends at exact dedup); included
per the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from decision_tree_stuff_spark.utils import release_local_checkpoint

MICRO = 1_000_000


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple = ("id_a", "id_b"),
    iterations: int = 3,
    damping: float = 0.85,
    track_convergence: bool = False,
    early_stop: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank on the undirected pair graph.

    ``nodes`` must contain every id (isolated nodes settle at
    ``1 − damping``). Returns ``(id_col, rank_micro, rank)`` —
    ``rank_micro`` is the exact BIGINT fixed-point state, ``rank``
    its double rendering. Deterministic under any partitioning; a
    DuckDB twin unrolling the same ``iterations`` reproduces
    ``rank_micro`` exactly.

    Convergence signal (r13 — the LPA pattern from r12,
    ``label_propagation`` below): with ``track_convergence=True`` the
    per-round TOTAL ABSOLUTE RANK DELTA in micro-units
    (``sum(abs(new − old))``) rides the round's one existing action
    (the eager checkpoint) via ``DataFrame.observe`` — zero extra
    passes — and the return becomes ``(ranks_df, [delta_round_1,
    ...])``. ``early_stop=True`` ends the loop once a round moves
    nothing: the update is a deterministic integer function of
    ``rank_micro`` (truncating div, one quantized multiply), so a
    zero-delta round is an exact fixed point and every further round
    reproduces the same integers — results are IDENTICAL to running
    the full ``iterations`` (the fixed-iteration oracle contract is
    untouched when ``early_stop=False``), and converged graphs skip
    the dead rounds' join+shuffle.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    from pyspark.sql import Observation
    a, b = pair_cols
    src, dst = F.col(a).alias("src"), F.col(b).alias("dst")
    edges = pairs.select(src, dst).union(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    # materialize the edge list ONCE: the pair emitter upstream is
    # the expensive part (an LSH/PPJoin pipeline), and it would
    # otherwise re-run on BOTH sides of the degree join (measured 2x
    # at sf0.1) and once more per iteration through the lineage
    edges = edges.localCheckpoint(eager=True)
    # r15 (guide §3.1): the checkpointed edge list has no size stats,
    # so joins against frames derived from it never auto-broadcast;
    # hint from the MEASURED block size instead (see triangle_counts)
    from decision_tree_stuff_spark.utils import broadcast_if_small

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # built once, partitioned on the per-iteration join key, reused
    ew = edges.join(broadcast_if_small(deg, size_hint_of=edges), "src").persist()

    ranks = nodes.select(
        F.col(id_col).alias("src"), F.lit(MICRO).cast("bigint").alias("rank_micro")
    )
    base = float(round((1.0 - damping) * MICRO))
    track = track_convergence or early_stop
    deltas = []
    prev = None
    for it in range(iterations):
        # ranks is checkpoint-backed from round 2 on — broadcast it
        # (when measurably small) so the persisted ew side streams
        # without a sort; round 1's ranks is a plain projection of
        # the caller's nodes (no measured size -> hint is a no-op)
        contribs = ew.join(broadcast_if_small(ranks), "src").select(
            F.col("dst").alias("src"),
            F.expr("rank_micro div deg").alias("c"),
        )
        sums = contribs.groupBy("src").agg(F.sum("c").alias("s"))
        # the node universe rides on the previous ranks frame (all
        # node ids by construction, and localCheckpointed after
        # iteration 1) instead of re-scanning the caller's nodes
        # source once per iteration
        stepped = (
            ranks.select("src", F.col("rank_micro").alias("__old"))
            .join(sums, "src", "left")
            .select(
                "src",
                F.col("__old"),
                (
                    F.lit(base)
                    + F.round(
                        F.lit(damping) * F.coalesce(F.col("s"), F.lit(0)), 0
                    )
                )
                .cast("bigint")
                .alias("rank_micro"),
            )
        )
        obs = None
        if track:
            obs = Observation(f"pagerank_round_{it + 1}")
            stepped = stepped.observe(
                obs,
                F.sum(
                    F.abs(F.col("rank_micro") - F.col("__old"))
                ).alias("delta_micro"),
            )
        new_ranks = stepped.drop("__old")
        new_ranks = new_ranks.localCheckpoint(eager=True)
        if prev is not None:
            release_local_checkpoint(prev)
        prev, ranks = new_ranks, new_ranks
        if track:
            delta = int(obs.get["delta_micro"] or 0)
            deltas.append(delta)
            if early_stop and delta == 0:
                break
    ew.unpersist()
    # ew (persisted) was materialized by iteration 1, so the edge
    # checkpoint blocks can go now; the final ranks checkpoint is
    # lineage-independent of both
    release_local_checkpoint(edges)
    out = ranks.select(
        F.col("src").alias(id_col),
        "rank_micro",
        (F.col("rank_micro").cast("double") / F.lit(float(MICRO))).alias(
            "rank"
        ),
    )
    return (out, deltas) if track_convergence else out


def label_propagation(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple = ("id_a", "id_b"),
    iterations: int = 3,
    track_convergence: bool = False,
    early_stop: bool = False,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    undirected pair graph — community detection one notch softer than
    connected components: CC merges everything reachable, LPA keeps
    weakly-bridged clusters apart (a chain of borderline near-dup
    matches does not absorb two dense clusters into one), which is
    the right granularity for "which docs are versions of the same
    underlying document" when the pair graph has noisy bridges.

    Determinism contract (the oracle-ability recipe shared by
    ``pagerank``): labels start as the node id; every iteration each
    node adopts the MOST FREQUENT label among its neighbors with ties
    broken by SMALLEST label — an all-integer argmax (implemented as
    ``min(struct(-count, label))``, order-free under any
    partitioning) — and isolated nodes keep their label. Synchronous
    updates + fixed ``iterations`` (asynchronous LPA is
    schedule-dependent, so it can never value-oracle), so a DuckDB
    twin unrolling the same rounds reproduces every label exactly.

    Scale: one edge-list materialization, then per iteration ONE
    co-partitioned join (labels leave the previous groupBy hash-
    partitioned on the id) + ONE map-side-combined count + the argmax
    — the Pregel shape; no per-node state, no driver collects.
    Returns ``(id_col, label)``.

    Convergence signal (r12 — a fixed ``iterations`` gave users no
    way to pick the number): with ``track_convergence=True`` the
    per-round LABEL-CHANGE COUNT rides the round's one existing
    action (the eager checkpoint) via ``DataFrame.observe`` — the
    E-11 pattern, zero extra passes — and the return becomes
    ``(labels_df, [n_changed_round_1, ...])``. ``early_stop=True``
    ends the loop once a round changes nothing: a zero-change round
    is a fixed point of the synchronous update, so every further
    round reproduces the same labels — results are IDENTICAL to
    running the full ``iterations``, the oracle's synchronous
    contract is untouched, and converged graphs skip the dead
    rounds' shuffles.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    from pyspark.sql import Observation
    a, b = pair_cols
    edges = pairs.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).union(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    # the pair emitter (an LSH/PPJoin pipeline) runs once, not once
    # per iteration through the lineage — the pagerank lesson
    edges = edges.localCheckpoint(eager=True)
    from decision_tree_stuff_spark.utils import broadcast_if_small

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    )
    track = track_convergence or early_stop
    changes = []
    prev = None
    for it in range(iterations):
        # labels is checkpoint-backed from round 2 on: broadcasting
        # it (when measurably small — see triangle_counts note) lets
        # the checkpointed edge list stream map-side instead of being
        # re-shuffled every round (guide §2.4/§3.1)
        votes = (
            edges.join(
                broadcast_if_small(
                    labels.select(F.col("id").alias("src"), "label"),
                    size_hint_of=labels,
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = votes.groupBy("id").agg(
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("label"))
            )["label"].alias("new_label")
        )
        stepped = labels.join(winner, "id", "left").select(
            "id",
            F.col("label").alias("__old"),
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
        )
        obs = None
        if track:
            obs = Observation(f"lpa_round_{it + 1}")
            stepped = stepped.observe(
                obs,
                F.sum(
                    (F.col("label") != F.col("__old")).cast("bigint")
                ).alias("n_changed"),
            )
        new_labels = stepped.drop("__old")
        new_labels = new_labels.localCheckpoint(eager=True)
        if prev is not None:
            release_local_checkpoint(prev)
        prev, labels = new_labels, new_labels
        if track:
            n_changed = int(obs.get["n_changed"] or 0)
            changes.append(n_changed)
            if early_stop and n_changed == 0:
                break
    release_local_checkpoint(edges)
    out = labels.select(F.col("id").alias(id_col), "label")
    return (out, changes) if track_convergence else out


def triangle_counts(
    pairs: DataFrame,
    pair_cols: tuple = ("id_a", "id_b"),
) -> DataFrame:
    """Per-apex triangle counts of the undirected pair graph.

    Edges are oriented low→high by ``(degree, id)``; a triangle
    {u, v, w} is found exactly once, at its lowest-(degree, id)
    vertex (the apex) as a wedge (u→v, u→w) closed by the oriented
    edge v→w. Returns ``(apex_id, n_triangles)`` for apexes in ≥ 1
    triangle — all-integer, exactly oracle-able.
    """
    a, b = pair_cols
    edges = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).union(
        pairs.select(F.col(b).alias("u"), F.col(a).alias("v"))
    )
    # the pair emitter runs once, not once per degree-join branch
    # (edges feeds deg twice + the wedge join; measured 15.5 -> 6.5 s
    # at sf0.1 with both materializations)
    edges = edges.localCheckpoint(eager=True)
    # r15 (guide §3.1): every frame below derives from the checkpointed
    # edge list, whose LogicalRDD plan has no size stats — the planner
    # estimates it as infinite and sort-merges every join. The blocks
    # ARE materialized, so their true size is known: broadcast the
    # small side when it measurably fits (threshold = the session's
    # autoBroadcastJoinThreshold; a 100 TB edge list keeps its
    # shuffle joins because the measured bytes gate the hint).
    from decision_tree_stuff_spark.utils import broadcast_if_small

    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    deg = broadcast_if_small(deg, size_hint_of=edges)
    # orientation rank: (degree, id) lexicographic
    ranked = (
        edges.join(deg, "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v")),
            "v",
        )
        .where(
            (F.col("deg") < F.col("deg_v"))
            | ((F.col("deg") == F.col("deg_v")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v", "deg_v")
    )
    # ranked is referenced three times (both wedge sides + the
    # closure semi-join) — materialize it once too; edges is then
    # fully consumed (ranked checkpointed eagerly) and can be freed.
    # ranked's own blocks live until the ContextCleaner collects the
    # returned frame — O(edges) rows, the price of a lazy return.
    ranked = ranked.localCheckpoint(eager=True)
    release_local_checkpoint(edges)
    # wedges at apex u: two out-edges ordered by the same total order
    e2 = ranked.select(
        F.col("u").alias("u2"),
        F.col("v").alias("w"),
        F.col("deg_v").alias("deg_w"),
    )
    wedges = ranked.join(
        broadcast_if_small(e2, size_hint_of=ranked),
        F.col("u") == F.col("u2"),
    ).where(
        (F.col("deg_v") < F.col("deg_w"))
        | ((F.col("deg_v") == F.col("deg_w")) & (F.col("v") < F.col("w")))
    )
    # the semi-join probe side is the oriented edge list again —
    # broadcasting it (when measurably small) keeps the wedge stream,
    # which can be orders of magnitude larger, from being shuffled
    closed = wedges.join(
        broadcast_if_small(
            ranked.select(F.col("u").alias("v"), F.col("v").alias("w")),
            size_hint_of=ranked,
        ),
        ["v", "w"],
        "leftsemi",
    )
    return closed.groupBy(F.col("u").alias("apex_id")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
