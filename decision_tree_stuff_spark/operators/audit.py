"""Pipeline funnel audit — per-stage row accounting with ZERO extra
passes over the data.

A production corpus pipeline is a funnel (quality gate → dedup →
decontamination → sampling), and the first operational question is
always "which stage dropped how much?". The naive answer —
``.count()`` after every stage — re-executes the prefix of the
pipeline once per stage: O(stages²) scans, unusable at 100 TB.

Spark-first answer: ``DataFrame.observe`` attaches named metric
aggregates to plan nodes; they are computed BY the one action that
executes the final plan (metrics ride along with each task and merge
on the driver, like SQL metrics in the UI). ``run_with_audit`` wraps a
stage list so every stage boundary carries an observation, and
``audit_counts`` reads the funnel back after any single action
(write, noop, count, collect) has run.

Caveats, stated rather than hidden:
* Metrics fire only for plan regions the action actually executes —
  a stage whose output is pruned away entirely (e.g. its columns
  unused AND its rows unneeded) could in principle be elided by the
  optimizer; observe nodes act as barriers for this purpose in
  practice, and the stream path (``foreachBatch``) executes stages
  unconditionally.
* Each observation is one extra map-side aggregate per task —
  measured noise-level cost, no shuffle, no extra job.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

Stage = Tuple[str, Callable[[DataFrame], DataFrame]]


def run_with_audit(
    docs: DataFrame, stages: List[Stage]
) -> Tuple[DataFrame, List[Tuple[str, Observation]]]:
    """Compose ``stages`` (ordered ``(name, DataFrame -> DataFrame)``
    pairs) over ``docs`` with an observation at the input and after
    every stage. Returns (final DataFrame, observations). Run ONE
    action on the result, then pass the observations to
    ``audit_counts`` for the funnel table.

    Stage names must be unique (they key the audit rows); 'input' is
    reserved for the pre-pipeline row count.
    """
    names = [n for n, _ in stages]
    if len(set(names)) != len(names) or "input" in names:
        raise ValueError(
            "stage names must be unique and must not use the reserved "
            f"name 'input'; got {names}"
        )
    obs: List[Tuple[str, Observation]] = []

    def tap(df: DataFrame, name: str) -> DataFrame:
        o = Observation(name)
        obs.append((name, o))
        return df.observe(o, F.count(F.lit(1)).alias("rows"))

    out = tap(docs, "input")
    for name, fn in stages:
        out = tap(fn(out), name)
    return out, obs


def audit_counts(
    observations: List[Tuple[str, Observation]]
) -> List[Dict]:
    """The funnel table, after one action has executed the audited
    frame: one dict per boundary with (stage, rows, dropped,
    kept_frac) relative to the previous boundary. Call only after the
    action — ``Observation.get`` blocks until its metrics arrive."""
    rows: List[Dict] = []
    prev = None
    for name, o in observations:
        n = int(o.get["rows"])
        rows.append(
            {
                "stage": name,
                "rows": n,
                "dropped": (prev - n) if prev is not None else 0,
                "kept_frac": round(n / prev, 6) if prev else None,
            }
        )
        prev = n
    return rows
