"""Stream-stream joins.

The reference has no streams (SURVEY.md §2.10); this is part of the
driver-mandated streaming extension surface. The canonical use is
event attribution at ingest time — pair each impression with the
conversions that follow it within a bounded horizon — without landing
either stream first.

Batch/stream unification contract: the same function body runs on two
batch DataFrames (watermarks are a no-op in batch) and produces the
identical rows, which is how the tests value-check it and how the
registered `range` leg of events_enrich_suite states the semantics.

100 TB shape: Spark executes this as a StreamingSymmetricHashJoin —
both sides hash-partitioned on the equi-keys, per-key state stores on
each side, and the time-range condition plus the watermarks bound the
state: a buffered left row is evicted once the right watermark passes
`left_ts + within`, a right row once the left watermark passes its
own event time. Without the range condition the state would grow
forever; this helper therefore REQUIRES it.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALLOWED = {"inner", "leftOuter", "left_outer", "left"}


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Equi-key + bounded-time-range join of two (watermarked) frames:
    keep (l, r) pairs with matching ``on`` keys and

        l[left_ts] <= r[right_ts] <= l[left_ts] + within

    ``how`` may be 'inner' or a left-outer spelling; for streaming
    left-outer Spark emits the NULL-padded row only after the right
    watermark proves no match can still arrive — both sides must carry
    `withWatermark` (stream_events applies one).

    Right-side columns whose names collide with the left (including
    ``right_ts`` when it equals ``left_ts``) come back suffixed with
    ``right_suffix``; join keys appear once. The rename happens AFTER
    the watermark is applied upstream — watermark tags ride in column
    metadata, so a projection rename preserves them.
    """
    if how not in _ALLOWED:
        raise ValueError(f"how must be one of {sorted(_ALLOWED)}, got {how!r}")
    keys = list(on)
    collisions = [
        c for c in right.columns if c not in keys and c in set(left.columns)
    ]
    # the rename target must be FREE on the right side: renaming 'ts'
    # to 'ts_r' when the right already carries a 'ts_r' would produce
    # two identically-named columns (ambiguous downstream, or a
    # silently doubled output column) — fail loudly instead
    taken = set(right.columns)
    clash = [c for c in collisions if c + right_suffix in taken]
    if clash:
        raise ValueError(
            f"right side already has {[c + right_suffix for c in clash]}; "
            f"pass a right_suffix that does not collide"
        )
    r = right
    for c in collisions:
        r = r.withColumnRenamed(c, c + right_suffix)
    r_ts = right_ts + right_suffix if right_ts in collisions else right_ts
    lhs, rhs = left.alias("__ssl"), r.alias("__ssr")
    cond: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"__ssl.{k}") == F.col(f"__ssr.{k}") for k in keys],
    )
    cond = cond & (F.col(f"__ssr.{r_ts}") >= F.col(f"__ssl.{left_ts}"))
    cond = cond & (
        F.col(f"__ssr.{r_ts}")
        <= F.col(f"__ssl.{left_ts}") + F.expr(f"INTERVAL {within}")
    )
    joined = lhs.join(rhs, cond, "left_outer" if how in _ALLOWED - {"inner"} else how)
    # keys once (from the left), then every non-key column of each side
    out = [F.col(f"__ssl.{k}").alias(k) for k in keys]
    out += [F.col(f"__ssl.{c}").alias(c) for c in left.columns if c not in keys]
    out += [F.col(f"__ssr.{c}").alias(c) for c in r.columns if c not in keys]
    return joined.select(*out)
