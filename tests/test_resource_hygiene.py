"""Storage-hygiene assertions: operators must not pin executor blocks
past their own plan (VERDICT r2 'What's wrong' #3 and ADVICE r2 on
clustering's error path).

``DataFrame.persist()`` registers in the session CacheManager and is
pinned until an explicit unpersist; ``localCheckpoint`` blocks are
RDD-level and reaped by the ContextCleaner with the frame. The tests
assert (a) the CacheManager stays empty across the fuzzy-dedup ops and
(b) explicit RDD-level unpersists bring persistentRDDs back to
baseline on both success and error paths.
"""

from __future__ import annotations

import gc

import pytest
from pyspark.sql import functions as F

from decision_tree_stuff_spark.operators.clustering import (
    connected_components,
    release_components,
)
from decision_tree_stuff_spark.operators.dedup import minhash_lsh_pairs


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _docs(spark):
    rows = [(i, f"tok{i} alpha beta gamma delta common text body") for i in range(40)]
    rows += [(100 + i, "alpha beta gamma delta common text body extra") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_cache_released_when_result_dropped(spark):
    """r2 leaked one persisted signature frame per call (CacheManager
    pin for session lifetime). The r4 design persists the signature
    frame for the plan's duration but releases it via a
    weakref.finalize the moment the caller drops the result — no JVM
    GC involved, the unpersist is an explicit py4j call fired by
    CPython refcounting."""
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)
    before = _persistent_rdd_count(spark)
    out = minhash_lsh_pairs(_docs(spark), threshold=0.5)
    out.collect()
    del out
    gc.collect()
    assert _cache_manager_empty(spark)
    # <=, not ==: the leak signal is an INCREASE. The shared-session
    # ContextCleaner reaps other tests' dropped localCheckpoint blocks
    # asynchronously, so the count can legitimately FALL between the
    # 'before' capture and here (observed in-suite: 4 -> 2).
    assert _persistent_rdd_count(spark) <= before


def _persistent_rdd_ids(spark):
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.keysIterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def test_minhash_result_still_valid_after_sibling_release(spark):
    """unpersist keeps lineage: a plan derived from the pairs frame
    must still execute correctly (recompute, not fail) even after the
    original result object was dropped and its cache released."""
    ids_before = _persistent_rdd_ids(spark)
    out = minhash_lsh_pairs(_docs(spark), threshold=0.5)
    derived = out.where(F.col("est_jaccard") >= 0.9)
    n_first = derived.count()
    del out
    gc.collect()
    assert derived.count() == n_first
    # the recompute re-materialized the derived plan's InMemoryRelation
    # outside the CacheManager — unpersist those orphan blocks so this
    # test does not pollute later baselines
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    for rid in _persistent_rdd_ids(spark) - ids_before:
        m.apply(rid).unpersist(False)


def test_connected_components_unpersists_on_nonconvergence(spark):
    """Error path: edges + labels blocks must be released before the
    RuntimeError propagates (caller may catch and retry)."""
    nodes = spark.createDataFrame([(i,) for i in range(9)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a bigint, id_b bigint"
    )
    before = _persistent_rdd_count(spark)
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(nodes, pairs, max_rounds=2)
    assert _persistent_rdd_count(spark) <= before


def test_connected_components_success_path_releases_edges(spark):
    """Success path: only the returned labels checkpoint may remain,
    and release_components must free it deterministically — no
    GC/ContextCleaner timing involved (the previous GC-deadline
    version of this test was intermittently red on a loaded box: the
    CPython-GC -> py4j -> JVM-GC -> ContextCleaner chain has no
    latency bound)."""
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a bigint, id_b bigint"
    )
    before = _persistent_rdd_count(spark)
    out = connected_components(nodes, pairs)
    out.collect()
    assert release_components(out) is True
    assert _persistent_rdd_count(spark) <= before
    # idempotent: the hook detaches itself on first call
    assert release_components(out) is False
