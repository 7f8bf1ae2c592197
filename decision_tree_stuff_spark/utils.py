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
