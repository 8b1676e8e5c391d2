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


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 native stateful API)
# ---------------------------------------------------------------------------

FIRST_SEEN_SCHEMA = "user_id long, first_event_id long"


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class FirstSeenProcessor(StatefulProcessor):
    """StatefulProcessor emitting each key's FIRST-seen row only —
    keyed exactly-once emission with typed ValueState, the
    streaming-native form of the keep-first dedup (A10) and the LLM
    pipeline's online exact-dedup gate. Implemented against Spark 4's
    `transformWithStateInPandas` (typed per-key state objects +
    optional TTL — the evolution of applyInPandasWithState's single
    state tuple; requires the RocksDB state store provider)."""

    def init(self, handle) -> None:
        # TTL would bound state for unbounded key spaces (fingerprint
        # dedup); first-seen semantics here keep state forever.
        self._seen = handle.getValueState("seen", "seen boolean")

    def handleInputRows(self, key, rows, timer_values):
        if self._seen.exists():
            for _ in rows:  # drain
                pass
            return
        first_event = None
        for pdf in rows:
            if len(pdf) and first_event is None:
                # deterministic pick within the micro-batch
                first_event = int(pdf["event_id"].min())
            elif len(pdf) and first_event is not None:
                first_event = min(first_event, int(pdf["event_id"].min()))
        if first_event is None:
            return
        self._seen.update((True,))
        yield pd.DataFrame({"user_id": [int(key[0])], "first_event_id": [first_event]})

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter([])

    def handleInitialState(self, key, initial_state, timer_values) -> None:
        pass

    def close(self) -> None:
        pass


def first_seen_per_user(events: DataFrame) -> DataFrame:
    """One row per user with a first-seen event_id — stateful keyed
    first-emission on a stream (transformWithState), plain
    min-aggregate on a batch frame (same output schema).

    SEMANTICS DIFFER BY TIER, deliberately: the streaming path emits
    ONCE per key — the min event_id within the key's FIRST micro-batch
    (first-sight semantics; the state marks the key emitted and later
    batches are ignored) — while the batch path emits the GLOBAL min.
    They agree exactly when each key's minimum arrives in its first
    batch (e.g. in-order sources); under late arrivals the streaming
    answer is the first-sight one. tests/test_streaming_stateful.py
    asserts precisely this divergence."""
    if events.isStreaming:
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=FirstSeenProcessor(),
            outputStructType=FIRST_SEEN_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    return events.groupBy("user_id").agg(F.min("event_id").alias("first_event_id"))
