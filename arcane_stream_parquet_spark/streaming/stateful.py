"""Custom stateful streaming operators via Arrow-batched
``applyInPandasWithState`` (SURVEY.md §2.9 ST5 — the reference's only
state is the watermark; this is the engine's extension surface for
user-defined streaming state, per the task brief).

``running_aggregate`` keeps one state row per key across micro-batches:
cumulative event count, cumulative value sum, and last-seen version —
the canonical "running profile" shape (a sessionizer, a dedup cache, or
a feature accumulator swap in the same skeleton).

Scale posture: state lives in Spark's per-key state store, partitioned
by the grouping key — no driver state, no cross-key coupling; Arrow
moves each group's rows to Python in batches. State size is O(keys),
the same envelope as any streaming dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_version", LongType()),
    ]
)

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_version", LongType()),
    ]
)


def _update_running(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, max_v = state.get
    else:
        n, total, max_v = 0, 0.0, 0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            max_v = max(max_v, int(pdf["version"].max()))
    state.update((n, total, max_v))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [total],
            "max_version": [max_v],
        }
    )


def running_aggregate(stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value, max_version) across ALL
    micro-batches — state persists in the checkpoint, so a restarted
    query resumes its counts exactly (exactly-once state semantics).

    Input columns: user_id (long), value (double), version (long).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
