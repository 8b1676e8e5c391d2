"""Range (interval) join — the second temporal-join operator Spark
lacks natively (the first, the as-of join, lives in operators/asof.py).

Emit every (left, right) pair whose time intervals overlap, optionally
restricted to equal join keys: clicks ⋈ promotion windows, trades ⋈
outage intervals, training examples ⋈ labeling campaigns. The
reference has no temporal joins; this covers the extension tables'
event stream.

Physical strategy (the shape that survives 100 TB): quantize time into
fixed-width bins, explode each interval onto the bins it touches, and
equi-join on (keys…, bin). Spark's own planner would execute a raw
`l.start <= r.end AND r.start <= l.end` predicate as a
BroadcastNestedLoopJoin (a per-key cartesian) — the binned form is a
plain hash shuffle join whose cost is |L'|+|R'| where each side grows
only by (interval_length / bin_width + 1). A pair overlapping several
shared bins would surface once per bin, so instead of a distinct
(which would shuffle the whole output again) each pair is emitted ONLY
from the bin containing the overlap's start — an O(1) filter, making
the join exactly-once by construction (bin-width invariance is
property-tested in tests/test_interval.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_of(ts: Column, bin_seconds: int) -> Column:
    # timestamp → double is epoch seconds with microseconds as the
    # fraction; 2024-era epochs carry ~52 significant bits at µs
    # precision, inside double's 53, so the floor is exact.
    return F.floor(ts.cast("double") / F.lit(float(bin_seconds))).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_start: str,
    left_end: str | None = None,
    right_start: str = "start",
    right_end: str | None = None,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner overlap join: rows pair when their `on` keys are equal and
    `left_start <= right_end AND right_start <= left_end` (closed
    intervals, the ANSI OVERLAPS-with-boundaries semantics a BETWEEN
    predicate expresses).

    `left_end=None` treats the left side as points (point-in-interval
    join: left_end := left_start); likewise `right_end`. Rows with
    end < start describe empty intervals and are dropped. Output
    columns are left.* followed by right.* minus the shared keys —
    non-key column names must be disjoint (callers rename first).

    `bin_seconds` trades replication for join selectivity: each row is
    exploded onto length/bin_seconds + 1 bins, so pick it near the
    typical interval length. Correctness is bin-width independent
    (property-tested); only the shuffle volume changes.
    """
    on = list(on)
    le = left_end or left_start
    re_ = right_end or right_start
    l_ts = F.col(left_start).cast("timestamp")
    l_te = F.col(le).cast("timestamp")

    lb = (
        left.filter(F.col(le) >= F.col(left_start))
        .withColumn(
            "__bin",
            F.explode(F.sequence(_bin_of(l_ts, bin_seconds), _bin_of(l_te, bin_seconds))),
        )
    )
    r_ts = F.col(right_start).cast("timestamp")
    r_te = F.col(re_).cast("timestamp")
    rb = (
        right.filter(F.col(re_) >= F.col(right_start))
        .withColumn(
            "__bin",
            F.explode(F.sequence(_bin_of(r_ts, bin_seconds), _bin_of(r_te, bin_seconds))),
        )
    )

    joined = lb.join(rb, on + ["__bin"])
    overlap = (F.col(left_start) <= F.col(re_)) & (F.col(right_start) <= F.col(le))
    # emit each pair only from the bin holding the overlap's start —
    # exactly-once without a distinct
    anchor = _bin_of(
        F.greatest(F.col(left_start), F.col(right_start)).cast("timestamp"), bin_seconds
    )
    out_cols = list(left.columns) + [c for c in right.columns if c not in on]
    return joined.filter(overlap & (F.col("__bin") == anchor)).select(*out_cols)
