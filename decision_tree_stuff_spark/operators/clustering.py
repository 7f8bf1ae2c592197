"""Near-dup cluster resolution: pairs → connected components → keep-set.

Pair emitters (``ngram_jaccard_pairs``, ``minhash_lsh_pairs``,
``simhash_near_dups``, ``embedding_near_dup_pairs``) tell you *which*
documents are near-duplicates; actually deduplicating a corpus needs
the transitive closure — if A≈B and B≈C, exactly one of {A, B, C}
survives. This module computes connected components of the near-dup
graph with iterative min-label propagation and derives the canonical
keep-set (smallest id per component — deterministic, like
``exact_dedup``'s min-id rule).

Scale notes (100 TB):
* Each round is three shuffles (edge×label join + min-combine +
  pointer-doubling self-join), all map-side combinable; rounds needed
  = O(log diameter) thanks to the doubling step (cf. Shiloach-Vishkin
  and the large-star/small-star family — Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14). Near-dup components
  are star/clique-shaped (diameter ≲ 3-4) so 2-4 rounds in practice;
  an adversarial 10⁶-node path still finishes in ~20.
* Lineage is truncated every round with ``localCheckpoint`` —
  without it the iterated join plan nests one level per round and
  the optimizer re-analyzes O(rounds²) nodes. On a production
  cluster prefer ``spark.sparkContext.setCheckpointDir`` + reliable
  ``checkpoint()`` (localCheckpoint blocks die with an executor).
* Convergence is detected by the monotone label-sum invariant:
  labels only ever decrease, so the sum (exact DECIMAL(38,0) — a
  bigint sum overflows once Σid exceeds 9.2e18, reachable at
  10-figure ids × 10-figure rows) strictly decreases until fixpoint.
  One tiny scalar action per round, no old×new anti-join.

Reference scope: beyond the reference (its dedup story ends at exact
groupBy); included per the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from decision_tree_stuff_spark.utils import (
    broadcast_if_small,
    release_local_checkpoint,
)


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple = ("id_a", "id_b"),
    max_rounds: int = 25,
    checkpoint_mode: str = "local",
    contract: bool = True,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it in
    the undirected graph given by ``pairs``.

    ``contract=True`` (default) runs ONE min-neighbor contraction
    before the propagation loop: M(u) = min(u, Γ(u)), every edge
    (u, v) is rewritten to (M(u), M(v)), self-loops dropped,
    duplicates collapsed — the star-rewriting move of Kiveris et
    al.'s large-star (SoCC'14), applied once as a pre-pass. On the
    clone-adversarial near-dup graphs that motivated it (exact-clone
    groups = CLIQUES), a clique contracts to a single node in this
    one pass, so the per-round edge join shrinks from |E| (quadratic
    in clone multiplicity) to the tiny residual cross-edge graph —
    measured at sf1, e7_dedup_clusters 165 s → the contracted loop's
    residual rounds, and the e7b composition no longer DNFs. Cost on
    graphs with nothing to contract: two |E| joins + a distinct, about
    one loop round. Correctness: contraction preserves connectivity,
    the component minimum m has M(m) = m so it survives as a
    contracted node, and final labels compose as
    label(u) = cc_label(M(u)).

    ``nodes`` must contain every id (isolated nodes label themselves).
    Returns (id_col, cluster_id). Deterministic; raises if the
    propagation has not converged after ``max_rounds``.

    ``checkpoint_mode``: ``'local'`` (default) truncates per-round
    lineage with ``localCheckpoint`` — fastest, but blocks live on
    executors and die with one, so a lost executor kills the job.
    ``'reliable'`` uses ``checkpoint()`` to the session's checkpoint
    dir (``spark.sparkContext.setCheckpointDir`` — required, checked
    up front): rounds survive executor loss, the right trade on a
    real cluster where a multi-hour CC job outliving one preemption
    matters more than the per-round write. Checkpoint FILES are
    reclaimed by the ContextCleaner only with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``, else
    by checkpoint-dir retention policy.

    Each round does neighbor-min propagation AND pointer doubling
    (``label ← label[label]`` — Shiloach-Vishkin-style shortcutting):
    the min label travels ≥ 2× the distance per round, so convergence
    is O(log diameter) rounds, not O(diameter) — a path graph of 10⁶
    nodes converges in ~20 rounds instead of 10⁶. Cost: one extra
    |nodes|-sized self-join per round, cheap next to the edge join.
    The shortcut lookup is always defined (a label is the min of
    reachable node ids, hence itself a node) and monotone (labels
    only decrease), so the decimal label-sum convergence test is
    unaffected.
    """
    if checkpoint_mode not in ("local", "reliable"):
        raise ValueError(
            f"checkpoint_mode must be 'local' or 'reliable', got "
            f"{checkpoint_mode!r}"
        )
    if checkpoint_mode == "reliable":
        sc = nodes.sparkSession.sparkContext
        if not sc._jsc.sc().getCheckpointDir().isDefined():
            raise ValueError(
                "checkpoint_mode='reliable' requires "
                "spark.sparkContext.setCheckpointDir(...) to be set"
            )

    def ckpt(df: DataFrame) -> DataFrame:
        if checkpoint_mode == "reliable":
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    ca, cb = pair_cols
    # materialize the pair source ONCE before symmetrizing: the
    # union's two branches are separate consumers, and an expensive
    # emitter (the Jaccard verify join) would otherwise execute twice
    # (measured 15.7 s → 5.5 s for edge build at sf0.1)
    pairs = ckpt(pairs.select(F.col(ca).alias("src"), F.col(cb).alias("dst")))

    mmap = None
    if contract:
        # M(u) = min(u, Γ(u)) over the (lazy) symmetric pair view,
        # then the edge rewrite (u,v) → (M(u),M(v)) minus self-loops
        # and duplicates. Cliques vanish entirely; the loop below
        # runs on the residue. Deliberately NOTHING corpus-pair-sized
        # is checkpointed here: the full symmetric+distinct edge list
        # of a clone-dense graph is exactly the thing that blew
        # executor storage at sf1 (AGGREGATE_OUT_OF_MEMORY with both
        # the raw and contracted checkpoints alive) — the symmetric
        # view recomputes from the small checkpointed pair list, and
        # only the post-contraction residue (tiny on dense graphs) is
        # pinned. M IS checkpointed: the final composition join needs
        # it after the pair blocks are released.
        sym = pairs.union(pairs.select(F.col("dst"), F.col("src")))
        mmap = ckpt(
            sym.groupBy("src")
            .agg(F.min("dst").alias("__mn"))
            .select(
                F.col("src").alias("node"),
                F.least(F.col("src"), F.col("__mn")).alias("m"),
            )
        )
        # r15 (guide §3.1): mmap is checkpoint-backed, so its measured
        # block size is known — broadcast the rewrite map (when it
        # fits) instead of sort-merging the symmetric edge stream
        # against a stats-less LogicalRDD; at 100 TB the measured-size
        # gate keeps these as shuffle joins
        msrc = broadcast_if_small(
            mmap.select(F.col("node").alias("src"), F.col("m").alias("ms")),
            size_hint_of=mmap,
        )
        mdst = broadcast_if_small(
            mmap.select(F.col("node").alias("dst"), F.col("m").alias("md")),
            size_hint_of=mmap,
        )
        edges = ckpt(
            sym.join(msrc, "src")
            .join(mdst, "dst")
            .where(F.col("ms") != F.col("md"))
            .select(F.col("ms").alias("src"), F.col("md").alias("dst"))
            .distinct()
        )
    else:
        edges = ckpt(
            pairs.union(pairs.select(F.col("dst"), F.col("src"))).distinct()
        )
    release_local_checkpoint(pairs)
    # r4: iterate ONLY over edge-incident nodes. A near-dup graph is
    # sparse — the overwhelming majority of a corpus is isolated — so
    # every per-round join/shuffle shrinks from |corpus| to |touched
    # nodes| (3-6x at the bench SFs, more at 100 TB). Isolated nodes
    # join back self-labeled at the end via an anti-join against the
    # FINAL labels checkpoint (never against edges, whose blocks are
    # released in the finally below).
    labels = ckpt(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )

    def label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    prev = label_sum(labels)
    # try/finally: on the non-convergence raise (or any mid-round
    # error) the checkpointed edges + current labels blocks must not
    # outlive the call — a caller that catches and retries with a
    # higher max_rounds would otherwise accumulate executor storage
    try:
        for _ in range(max_rounds):
            # labels is checkpoint-backed every round: broadcast it
            # (and the frames it bounds) when measurably small, so the
            # edge stream joins map-side instead of re-shuffling each
            # round (guide §2.4/§3.1; the size gate keeps 100 TB label
            # frames on the shuffle path)
            nbr_min = (
                edges.join(
                    broadcast_if_small(labels, size_hint_of=labels),
                    edges["src"] == labels["node"],
                )
                .groupBy("dst")
                .agg(F.min("label").alias("nbr_label"))
            )
            stepped = labels.join(
                broadcast_if_small(nbr_min, size_hint_of=labels),
                labels["node"] == nbr_min["dst"],
                "left",
            ).select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
            )
            # pointer doubling: jump to the label's own label
            hop = stepped.select(
                F.col("node").alias("h_node"), F.col("label").alias("h_label")
            )
            new_labels = (
                stepped.join(
                    broadcast_if_small(hop, size_hint_of=labels),
                    stepped["label"] == hop["h_node"],
                    "left",
                )
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("h_label", "label")
                    ).alias("label"),
                )
            )
            new_labels = ckpt(new_labels)
            cur = label_sum(new_labels)
            old_labels, labels = labels, new_labels
            release_local_checkpoint(old_labels)
            if cur == prev:
                # labels is checkpointed — safe to drop the edge
                # blocks. ONE left join from the caller's nodes frame
                # keys the result strictly on nodes: isolated nodes
                # (no label row) self-label via coalesce, and an id
                # that appears in pairs but not in nodes (a violated
                # precondition) is dropped, not invented — labels for
                # its in-nodes neighbors still account for it
                # transitively. (r5: replaces a semi-join + anti-join
                # + union over the same two inputs.)
                if mmap is not None:
                    # compose through the contraction: u's label is
                    # the contracted component label of M(u); a
                    # contracted node whose edges all collapsed
                    # (pure clique) has no loop row and self-labels
                    # as M(u) via the coalesce
                    clabels = labels.select(
                        F.col("node").alias("m"),
                        F.col("label").alias("__cl"),
                    )
                    touched = (
                        mmap.join(clabels, "m", "left")
                        .select(
                            F.col("node").alias(id_col),
                            F.coalesce("__cl", "m").alias("cluster_id"),
                        )
                    )
                else:
                    touched = labels.select(
                        F.col("node").alias(id_col),
                        F.col("label").alias("cluster_id"),
                    )
                out = nodes.select(F.col(id_col)).join(
                    touched, id_col, "left"
                ).select(
                    F.col(id_col),
                    F.coalesce("cluster_id", id_col).alias("cluster_id"),
                )
                # deterministic-release hook (see release_components):
                # the final labels (+ contraction map) checkpoints'
                # blocks are otherwise reaped only when the JVM GCs
                # the RDD and the ContextCleaner notices — unbounded
                # later
                out._dts_final_checkpoint = (
                    [labels, mmap] if mmap is not None else [labels]
                )
                return out
            prev = cur
        release_local_checkpoint(labels)
        if mmap is not None:
            release_local_checkpoint(mmap)
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_rounds} rounds "
            "(diameter > 2^max_rounds — raise max_rounds)"
        )
    finally:
        release_local_checkpoint(edges)


def release_components(labeled: DataFrame) -> bool:
    """Eagerly free the final labels checkpoint behind a
    ``connected_components`` / ``dedup_clusters`` result.

    Optional: without it the blocks are still reclaimed, but only via
    the nondeterministic CPython-GC → py4j → JVM-GC → ContextCleaner
    chain. Call it when the result (and every plan derived from it)
    is fully consumed — the checkpoint has no lineage, so the frame
    must not be evaluated again afterwards. Returns True if blocks
    were released."""
    ckpt = getattr(labeled, "_dts_final_checkpoint", None)
    if ckpt is None:
        return False
    del labeled._dts_final_checkpoint
    frames = ckpt if isinstance(ckpt, list) else [ckpt]
    done = [release_local_checkpoint(f) for f in frames]
    return all(done)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple = ("id_a", "id_b"),
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Full cluster assignment for a corpus: every document labeled
    with its near-dup component's canonical id and whether it is the
    kept (canonical) copy. Returns (id_col, cluster_id, is_kept)."""
    comp = connected_components(
        docs, pairs, id_col, pair_cols, checkpoint_mode=checkpoint_mode
    )
    out = comp.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_kept"),
    )
    # propagate the deterministic-release hook (release_components)
    out._dts_final_checkpoint = comp._dts_final_checkpoint
    return out


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    pair_cols: tuple = ("id_a", "id_b"),
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Deduplicated corpus keeping the HIGHEST-``score_col`` document
    per near-dup cluster (ties → smallest id) — what a quality-aware
    pipeline actually wants: when near-duplicates differ (one clean,
    one boilerplate-ridden), min-id keep is arbitrary; keep-best
    preserves the best copy.

    Plan: components as usual, then one per-cluster max-struct
    aggregate — ``max(struct(score, -id))`` picks the winner without a
    rank window (map-side combinable, one shuffle keyed by
    cluster_id). Returns the kept rows of ``docs`` (all columns).
    """
    comp = connected_components(
        docs, pairs, id_col, pair_cols, checkpoint_mode=checkpoint_mode
    )
    scored = comp.join(
        docs.select(F.col(id_col), F.col(score_col).alias("_score")), id_col
    )
    winners = (
        scored.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("_score"), (-F.col(id_col)).alias("_negid"))
            ).alias("w")
        )
        .select((-F.col("w._negid")).alias(id_col))
    )
    return docs.join(winners, id_col, "semi")


def dedup_keep(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple = ("id_a", "id_b"),
    checkpoint_mode: str = "local",
) -> DataFrame:
    """The deduplicated corpus itself: one canonical document per
    near-dup component (all original columns preserved). The join is
    on the id — at scale both sides are pre-partitioned by ``id_col``
    from the propagation's final shuffle, so AQE plans a cheap
    sort-merge; the kept-set is a semi-join, not a filter on a
    collected list."""
    kept = dedup_clusters(
        docs, pairs, id_col, pair_cols, checkpoint_mode=checkpoint_mode
    ).where("is_kept")
    return docs.join(kept.select(id_col), id_col, "semi")


def exact_collapse(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Collapse byte-identical texts to one representative BEFORE a
    fuzzy-dedup pair emitter — the standard production staging
    (Dolma/RefinedWeb run exact dedup ahead of MinHash) and the move
    that tames clone-heavy corpora: a group of c identical docs
    otherwise lands in every LSH band bucket together and the bucket
    self-join pays c² per band.

    Returns ``(rep_docs, membership)``: ``rep_docs`` = the docs whose
    id is the MINIMUM of their exact-text group (plus every
    non-collapsible doc), ``membership`` = (id_col, rep_id) for ALL
    docs. Equivalence to running the fuzzy pipeline on the full
    corpus, for MIN-ID canonical selection: identical texts have
    identical signatures, so a clone pairs with exactly the partners
    its representative pairs with, every clone group is internally
    connected at est_jaccard = 1, and the component minimum over all
    members equals the minimum over representatives (each rep IS its
    group's min). NOT equivalence-preserving for keep-BEST selection
    (clones can differ on non-text score columns) — use it only with
    min-id keep semantics.

    Token-less docs (null/empty/punctuation-only text) are NOT
    collapsed: the MinHash pipeline emits no pairs for them (their
    est_jaccard is null), so byte-identical empty docs are distinct
    singletons there, and collapsing them would change the result.
    """
    from decision_tree_stuff_spark.functions.text import tokens

    has_tok = (
        F.size(F.filter(tokens(F.col(text_col)), lambda t: t != "")) > 0
    )
    keyed = docs.select(
        F.col(id_col),
        F.when(has_tok, F.md5(F.col(text_col)))
        .otherwise(F.concat(F.lit("S|"), F.col(id_col).cast("string")))
        .alias("__th"),
    )
    reps = keyed.groupBy("__th").agg(F.min(id_col).alias("rep_id"))
    membership = keyed.join(reps, "__th").select(F.col(id_col), "rep_id")
    rep_docs = docs.join(
        reps.select(F.col("rep_id").alias(id_col)), id_col, "semi"
    )
    return rep_docs, membership


def dedup_keep_collapsed(
    docs: DataFrame,
    pairs_fn,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """``dedup_keep`` with the exact-collapse staging: build candidate
    pairs with ``pairs_fn(rep_docs)`` over the exact-text
    representatives only, resolve components there, then attach every
    clone to its representative's cluster. Same kept set as running
    ``pairs_fn`` + ``dedup_keep`` over the full corpus (see
    ``exact_collapse`` for the argument), at 1/c² of the bucket-join
    cost on clone-heavy data."""
    rep_docs, membership = exact_collapse(docs, id_col, text_col)
    pairs = pairs_fn(rep_docs)
    comp = connected_components(
        rep_docs, pairs, id_col, checkpoint_mode=checkpoint_mode
    )
    kept = (
        membership.join(
            comp.select(
                F.col(id_col).alias("rep_id"), "cluster_id"
            ),
            "rep_id",
        )
        .where(F.col(id_col) == F.col("cluster_id"))
        .select(id_col)
    )
    out = docs.join(kept, id_col, "semi")
    out._dts_final_checkpoint = comp._dts_final_checkpoint
    return out
