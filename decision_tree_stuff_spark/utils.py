"""Storage-hygiene helpers shared by the iterative operators.

The trap this module exists for: ``DataFrame.unpersist()`` does NOT
release the blocks behind ``DataFrame.localCheckpoint()``.
``unpersist`` goes through the session CacheManager, which only knows
about ``persist()``/``cache()`` entries; a local checkpoint persists
the *internal RDD* directly (MEMORY_AND_DISK), leaving nothing in the
CacheManager to uncache. The blocks are otherwise reclaimed only when
the JVM garbage-collects the RDD and the ContextCleaner notices —
i.e. at some unbounded later time, and never while the caller's frame
(or a raised traceback) still references the DataFrame. Iterative
algorithms that checkpoint per round therefore accumulate dead blocks
across rounds unless they release them explicitly at the RDD level.

``release_local_checkpoint`` reaches the checkpointed RDD through the
analyzed plan (a checkpointed frame's plan is a single ``LogicalRDD``
node wrapping exactly that RDD) and unpersists it directly — precise,
no id-diffing against ``getPersistentRDDs`` (which would race with
concurrent persists from e.g. parallel sibling tree fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def unpersist_when_dropped(result: DataFrame, cached: DataFrame) -> DataFrame:
    """Free ``cached``'s storage when the caller drops ``result``.

    For operators that persist an intermediate feeding multiple
    branches of the RETURNED lazy plan: the function cannot unpersist
    before returning (the plan still reads the cache), and leaving the
    entry forever pins it in the session CacheManager (the r2 minhash
    leak). A ``weakref.finalize`` on the returned DataFrame unpersists
    the intermediate as soon as the result object is garbage-collected
    — prompt under CPython refcounting, and SAFE at any time because
    ``unpersist`` (unlike releasing a localCheckpoint's blocks) keeps
    lineage: a derived plan executed after release silently recomputes
    instead of failing. Holds only the java-side DataFrame ref, so the
    Python ``cached`` wrapper itself can die earlier.
    """
    import weakref

    jdf = cached._jdf

    def _release(jdf=jdf):
        try:
            jdf.unpersist(False)
        except Exception:  # JVM already gone at interpreter exit
            pass

    weakref.finalize(result, _release)
    return result


def keepalive(df: DataFrame, *holders) -> DataFrame:
    """Pin ``holders`` (Python DataFrame wrappers) to ``df``'s
    lifetime and return ``df``.

    Counterpart to ``unpersist_when_dropped``: that helper frees a
    persisted intermediate when the RETURNED frame is dropped — but a
    caller that immediately wraps the result (``op(...).select(...)``,
    or a stage-composition loop that rebinds ``out = fn(out)``) drops
    the returned wrapper long before execution, so the weakref fires
    and the cache silently unpersists while the derived plan still
    wants it (unpersist keeps lineage, so the plan recomputes instead
    of failing — correct, but the replay the cache existed to prevent
    comes back; found via plan diffs in the r14 optimization round).
    Attaching the wrapped frames to the final result keeps their
    finalizers — and therefore their caches — alive exactly until the
    consumer drops the result.

    Accumulates: a second ``keepalive`` call on the same frame (query
    composition pinning at two levels) must not drop the first call's
    holders — overwriting the attribute would let those caches
    unpersist before execution, the exact silent regression this
    helper exists to prevent (r14 advice)."""
    df._dts_keepalive = getattr(df, "_dts_keepalive", ()) + tuple(holders)
    return df


def release_local_checkpoint(df: DataFrame) -> bool:
    """Eagerly free the storage blocks behind a ``localCheckpoint``-ed
    DataFrame. Returns True if blocks were released, False if the
    frame is not a plain checkpoint scan (best-effort no-op).

    The frame must not be evaluated again afterwards: a local
    checkpoint truncates lineage, so once unpersisted it cannot be
    recomputed.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:  # py4j hiccup — leave it to the ContextCleaner
        return False
