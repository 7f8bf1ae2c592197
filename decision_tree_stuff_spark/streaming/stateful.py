"""Custom stateful streaming operators via ``applyInPandasWithState``.

For stateful logic the built-in window/session operators can't
express, Structured Streaming exposes per-key arbitrary state with
Arrow-batched Python hooks. The operator here — a per-user running
profile (event count, value sum, distinct event types seen) emitted
per micro-batch — is the canonical shape: key-partitioned state,
update-per-batch, append output. State lives in the state store
(per-key, fault-tolerant via checkpointing); the Python function sees
Arrow batches, never single rows.

Scale notes: state size is O(keys); bound it with timeouts
(``GroupStateTimeout.ProcessingTimeTimeout``/EventTime) in production
— the no-timeout variant here suits the bounded test corpus. The
shuffle is one exchange on the key, identical to a streaming groupBy.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

PROFILE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_so_far", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("distinct_types", IntegerType()),
    ]
)

# state: (event_count, value_sum, comma-joined seen types)
PROFILE_STATE = "count BIGINT, value_sum DOUBLE, seen STRING"


def _update_profile(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        count, value_sum, seen_csv = state.get
        seen = set(seen_csv.split(",")) if seen_csv else set()
    else:
        count, value_sum, seen = 0, 0.0, set()
    for pdf in pdfs:
        count += len(pdf)
        value_sum += float(pdf["value"].sum())
        seen.update(pdf["event_type"].unique().tolist())
    state.update((count, value_sum, ",".join(sorted(seen))))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "events_so_far": [count],
            "value_sum": [round(value_sum, 6)],
            "distinct_types": [len(seen)],
        }
    )


def stream_user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile, one emitted row per user per
    micro-batch in which the user appears; the latest row is the
    complete profile."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_OUTPUT,
        stateStructType=PROFILE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
