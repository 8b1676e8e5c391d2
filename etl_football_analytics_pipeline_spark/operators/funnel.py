"""Funnel analysis: ordered-step conversion per entity.

The standard product-analytics question — of the users who did step 1,
how many went on to do step 2 AFTER it, then step 3 after that —
expressed relationally: step k's timestamp is the MIN event time of
step k's type at-or-after step k-1's timestamp. Earliest-entry
semantics (the canonical greedy funnel): each step anchors to the
earliest possible occurrence, which maximizes the time available for
later steps when no horizon is set and is deterministic (MIN, no
order-dependence).

Reference scope: generalizes the reference's per-match aggregation
queries (`scr/ui.py` result summaries) to ordered event sequences; no
direct reference counterpart.

100 TB shape: one filtered aggregate + one broadcast-or-hash join PER
STEP, every pass keyed on the entity — state per key is ONE timestamp
per step, never a per-user event array (the collect_list form blows up
on hot users; this one cannot). Steps are few (funnels are 3-6 deep),
so the chain is a handful of key-partitioned passes over successively
SMALLER frames (only entities that reached step k-1 are joined at
step k).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps"]


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """One row per entity that entered the funnel (did step 1):
    (``user_col``, steps_completed, t_first, t_last, converted).

    - step k (k >= 2) counts only at-or-after step k-1's anchor time
      (``>=`` — simultaneous events may satisfy consecutive steps, the
      common logging reality; tighten upstream if exact ordering
      matters);
    - ``within`` (e.g. "7 days") bounds the WHOLE funnel: every later
      step must land inside [t1, t1 + within];
    - t_last is the anchor of the deepest step reached;
    - converted = reached the final step.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    u = F.col(user_col)
    anchors = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    if within is not None:
        anchors = anchors.withColumn(
            "__deadline", F.col("t1") + F.expr(f"INTERVAL {within}")
        )
    cur = anchors
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            u.alias("__u"), F.col(ts_col).alias("__ts")
        )
        cond = (cur[user_col] == nxt["__u"]) & (nxt["__ts"] >= cur[f"t{i - 1}"])
        if within is not None:
            cond = cond & (nxt["__ts"] <= cur["__deadline"])
        cur = (
            cur.join(nxt, cond, "left")
            .groupBy(*cur.columns)
            .agg(F.min("__ts").alias(f"t{i}"))
        )
    n = len(steps)
    completed = F.lit(1)
    t_last = F.col("t1")
    for i in range(2, n + 1):
        reached = F.col(f"t{i}").isNotNull()
        completed = completed + F.when(reached, 1).otherwise(0)
        t_last = F.when(reached, F.col(f"t{i}")).otherwise(t_last)
    # a later step can only anchor if every earlier one did (the join
    # chain guarantees it: t_k is NULL whenever t_{k-1} is), so the
    # additive count equals the contiguous depth
    return cur.select(
        user_col,
        completed.alias("steps_completed"),
        F.col("t1").alias("t_first"),
        t_last.alias("t_last"),
        F.col(f"t{n}").isNotNull().alias("converted"),
    )
