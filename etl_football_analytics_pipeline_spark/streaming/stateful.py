"""Custom stateful streaming operator via `applyInPandasWithState`.

The built-in windowed/session operators (streaming/windowed.py) cover
the declarative surface; this is the ESCAPE HATCH the driver mandate
names for operators Spark lacks: arbitrary per-key state maintained
across micro-batches with an Arrow-batched pandas kernel.

`running_user_stats` keeps (n_events, total_value) per user and emits
the updated running totals every micro-batch a user appears in — the
incremental form of `groupBy(user).agg(count, sum)`, and the skeleton
any custom accumulating operator (feature aggregation, fraud counters,
rate limiters) plugs into. State is hash-partitioned by the grouping
key across executors; at scale each executor holds only its keys'
state, bounded here by NoTimeout (swap for ProcessingTimeTimeout to
expire idle keys — the state-size guard a 100 TB/day stream needs).

Batch parity: on a plain DataFrame the same function degrades to the
equivalent one-shot aggregate, keeping the batch/stream-unified
contract of streaming/windowed.py; equality of the two paths is
asserted in tests/test_streaming_stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) — stateful on a stream,
    one-shot aggregate on a batch frame (same output schema)."""
    if events.isStreaming:
        return events.groupBy("user_id").applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).cast("double").alias("total_value"),
    )
