"""As-of (point-in-time) join — the event-enrichment operator Spark
lacks natively.

For each left row, attach the single most recent right row whose
timestamp is ≤ the left timestamp (optionally within a tolerance),
per join key: events ⋈ latest-dimension-snapshot, trades ⋈ quotes,
training examples ⋈ latest label revision. The reference has no
temporal joins; this covers the extension tables' event stream.

Physical strategy (the shape that survives 100 TB): UNION the two
inputs, hash-shuffle ONCE on the key, and resolve the match with a
partition-local `last(ignorenulls)` running window — no range join,
no per-row subquery, no broadcast that grows with either side. This
is the classic distributed merge-as-of: both sides sort together
within each key partition, and every left row reads its answer from
the running state. Cost = one shuffle + one partition-local sort of
|L|+|R|, independent of match distance. (Spark's own range-join path
would be a cartesian-per-key; pandas `merge_asof` is single-node —
both are exactly what this avoids.)

Verified value-for-value against DuckDB's native ASOF JOIN in
tests/test_asof.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: left rows keep all columns; each gains the
    `value_cols` of the latest right row with right_ts ≤ left_ts for
    the same `on` key (NULLs when no prior right row exists — left
    outer semantics), plus `{right_ts}{suffix}` carrying the matched
    timestamp.

    `tolerance` (an INTERVAL string, e.g. "2 hours") voids matches
    older than left_ts - tolerance, matching DuckDB/pandas tolerance
    semantics.

    Determinism: among right rows sharing (key, right_ts) the one
    ordered last by `value_cols` wins — a total tiebreak, so results
    are identical under any partitioning.

    The matched right row is carried as ONE struct, never as
    independently-carried columns: per-column `last(ignorenulls)`
    would smear a stale non-NULL value from an OLDER right row into a
    match whose own value is NULL, fabricating a composite row that
    never existed (the struct is non-NULL exactly when a right row
    exists, so its fields travel together). NULL join keys follow SQL
    equality: right rows with a NULL key are unmatchable (dropped
    before the union), and left rows with a NULL key come back with
    NULL enrichment — DuckDB's ASOF JOIN agrees.
    """
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_ts]
    value_cols = list(value_cols)
    ts_out = f"{right_ts}{suffix}"

    right_types = dict(right.dtypes)
    left_side = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right_types[right_ts]).alias("__m_ts"),
        *[F.lit(None).cast(right_types[c]).alias(f"__r_{c}") for c in value_cols],
    )
    left_types = dict(left.dtypes)
    key_not_null = F.lit(True)
    for k in on:
        key_not_null = key_not_null & F.col(k).isNotNull()
    right_side = right.filter(key_not_null).select(
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__m_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    u = left_side.unionByName(right_side).withColumn(
        "__match",
        F.when(
            F.col("__is_left") == 0,
            F.struct(
                F.col("__m_ts").alias("ts"),
                *[F.col(f"__r_{c}").alias(f"v{i}") for i, c in enumerate(value_cols)],
            ),
        ),
    )

    # right rows (__is_left=0) sort BEFORE left rows at equal __ts, so
    # a right row exactly at the left timestamp is matchable (≤, not <);
    # the struct tail makes the order total among equal-ts right rows
    # (ts field equal → lexicographic on the value fields, so "ordered
    # last by value_cols wins" is preserved)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.asc("__is_left"), F.asc("__match"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    resolved = u.select(
        *left.columns,
        "__ts",
        "__is_left",
        F.last("__match", ignorenulls=True).over(w).alias("__match"),
    ).filter(F.col("__is_left") == 1)
    match = F.col("__match")
    if tolerance is not None:
        in_window = match["ts"] >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        resolved = resolved.select(
            *left.columns, "__ts", F.when(in_window, match).alias("__match")
        )
        match = F.col("__match")
    return resolved.select(
        *left.columns,
        match["ts"].alias(ts_out),
        *[
            match[f"v{i}"].alias(f"{c}{suffix}" if c in left.columns else c)
            for i, c in enumerate(value_cols)
        ],
    )
