"""Trailing-window anomaly scores for metric series.

The observability primitive over rollup tables: score each bucket of a
keyed time series against its own recent history — z = (x − mean of
the previous N buckets) / stddev of the same — so a pipeline can flag
ingest-volume spikes/collapses per source, per event type, per tenant
without fixed thresholds. Runs on the DENSE (gap-filled) series so
"previous N rows" means "previous N buckets" even through silent hours
(pair with streaming.windowed.gapfill_time).

Reference scope: no counterpart (the reference has no time-series
monitoring); extension surface alongside the rollup/gapfill tier.

100 TB shape: one window pass partitioned by the series key —
partition-parallel, state per key is the N-row frame, nothing global.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["trailing_zscore", "decayed_sum", "decayed_sum_exact"]


def trailing_zscore(
    df: DataFrame,
    bucket_col: str,
    key_cols: Sequence[str],
    value_col: str,
    lookback: int = 24,
    min_history: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Adds ``zscore``: the value's deviation from the trailing window
    [bucket−lookback, bucket−1] in sample standard deviations, NULL
    while history is shorter than ``min_history`` buckets or flat
    (stddev 0 — a first deviation from a constant series is "infinite
    sigma"; gate on it explicitly rather than dividing). The current
    bucket is EXCLUDED from its own baseline, so a spike cannot mask
    itself. Rounded to ``round_to`` dp (the trailing mean is an exact
    integer-sum division for integer inputs; stddev is the one
    engine-float term, which the boundary rounding absorbs)."""
    if lookback < min_history:
        raise ValueError("lookback must be >= min_history")
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.asc(bucket_col))
        .rowsBetween(-lookback, -1)
    )
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.when(
        (n >= min_history) & (sd > 0),
        F.round((F.col(value_col) - mu) / sd, round_to),
    )
    return df.withColumn("zscore", z)


def decayed_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    half_life: str = "1 day",
    reference_ts=None,
) -> DataFrame:
    """Exponentially time-decayed sum per key: each observation
    contributes ``value * 2^(-(t_ref − ts) / half_life)`` — the
    recency-weighted score behind trending rankings, decayed
    engagement counters, and freshness-weighted mixture weights.

    ``reference_ts``: an explicit anchor (timestamp/str) applied to
    every key, or None to anchor each key at its OWN latest event (the
    freshest observation gets weight 1 per key — rank-comparable
    across keys regardless of when they were last active).

    Returns (keys..., decayed_sum double, t_reference timestamp).

    100 TB shape: weights are a pure Column expression folded by ONE
    map-side-combined aggregate; the per-key anchor form adds one
    window max over the same key partitioning — no second scan of the
    raw table. Float caveat: a distributed float sum is
    order-dependent at the ulp level (unlike the engine's exact
    decimal money sums), so compare with a tolerance downstream —
    inherent to exponential weights, not a defect."""
    # interval → seconds via epoch arithmetic (Spark has no
    # extract(epoch FROM interval)); a timestamp cast to double IS its
    # epoch second count
    half_seconds = float(
        df.sparkSession.sql(
            f"SELECT CAST(timestamp'1970-01-01 00:00:00' + INTERVAL {half_life}"
            " AS DOUBLE)"
        ).collect()[0][0]
    )
    if half_seconds <= 0:
        raise ValueError("half_life must be positive")
    keys = list(key_cols)
    if reference_ts is None:
        w = W.partitionBy(*keys)
        df = df.withColumn("__tref", F.max(ts_col).over(w))
    else:
        df = df.withColumn("__tref", F.lit(reference_ts).cast("timestamp"))
    age = F.col("__tref").cast("double") - F.col(ts_col).cast("double")
    weight = F.pow(F.lit(2.0), -age / F.lit(half_seconds))
    return df.groupBy(*keys).agg(
        F.sum(F.col(value_col) * weight).alias("decayed_sum"),
        F.max("__tref").alias("t_reference"),
    )


def decayed_sum_exact(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    reference_ts: str,
    horizon_days: int = 35,
    value_decimals: int = 2,
) -> DataFrame:
    """`decayed_sum`'s DETERMINISTIC twin: daily half-life decay with
    weights restricted to exact powers of two, observations bucketed
    by whole-day age — the tier a value oracle (or any bit-for-bit
    replay) can check, where the continuous form's float sum is
    order-dependent at the ulp level.

    Each observation contributes ``value · 2^(−k)``, k = its age in
    whole days at the pinned ``reference_ts`` anchor; events older
    than ``horizon_days`` (or after the anchor) are out of scope.
    Exactness: the value is scaled to an integer (``value_decimals``
    fixed decimals), per-(key, k) integer sums fold first, and the
    cross-k combination runs in DECIMAL(38,0) with each term
    ``S_k · 2^(horizon−k)`` — integer arithmetic end to end; the one
    double appears at the output boundary (cast + one division by the
    constant ``scale · 2^horizon``, identical operands in any engine,
    then 4dp rounding). Headroom is ENFORCED, not assumed: under
    Spark's default non-ANSI decimal semantics an overflowing term
    would silently become NULL, so each per-(key, day) scaled sum is
    asserted ≤ (10³⁸−1) / 2^horizon / (horizon+1) — every term and
    the ≤ horizon+1-term fold then provably fit DECIMAL(38,0), and an
    out-of-bound corpus raises instead of returning NULL.

    Returns (keys..., n_events long, decayed_sum double,
    t_reference timestamp).

    100 TB shape: same as `decayed_sum` — one map-side-combined
    aggregate to (key, k) partials (≤ horizon_days rows per key),
    then a second tiny fold; no window, no second scan."""
    if not 0 < horizon_days <= 90:
        raise ValueError("horizon_days must be in (0, 90] for DECIMAL(38,0) headroom")
    keys = list(key_cols)
    scale = 10 ** value_decimals
    tref = F.lit(reference_ts).cast("timestamp")
    age = tref.cast("double") - F.col(ts_col).cast("double")
    k = F.floor(age / F.lit(86400.0)).cast("int")
    partials = (
        df.withColumn("__k", k)
        .filter((F.col("__k") >= 0) & (F.col("__k") <= horizon_days))
        .groupBy(*keys, "__k")
        .agg(
            # per-row terms are longs, but the per-(key,day) SUM folds
            # in DECIMAL(38,0): a long accumulator would WRAP silently
            # past 2^63 — below the headroom guard's threshold for
            # every horizon <= 58 — and the guard would then bless a
            # wrapped (wrong) value. The decimal fold is exact to
            # 10^38, and a decimal-sum overflow (NULL) would need
            # ~10^19 rows in one (key, day) group — unreachable.
            F.sum(
                F.round(F.col(value_col) * scale).cast("long").cast("decimal(38,0)")
            ).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    # loud headroom guard: non-ANSI decimal overflow yields NULL, not
    # an error. Bounding |__s| so each term <= (10^38-1)/(horizon+1)
    # makes the per-key fold of <= horizon+1 terms provably in-range;
    # assert_true raises in the executor the moment a corpus violates
    # it. The when() wrapper ties the assert into the consumed
    # expression so Catalyst cannot prune it as an unused column.
    s_limit = (10**38 - 1) // (2**horizon_days) // (horizon_days + 1)
    # NULL-safe: an all-NULL (key, day) value group sums to a NULL
    # __s, which must keep propagating as NULL output (nulls are
    # data), not trip the overflow assert
    s_ok = F.assert_true(
        F.col("__s").isNull()
        | (
            F.abs(F.col("__s").cast("decimal(38,0)"))
            <= F.lit(str(s_limit)).cast("decimal(38,0)")
        ),
        F.lit(
            "decayed_sum_exact: per-(key,day) scaled sum exceeds the "
            f"DECIMAL(38,0) headroom bound {s_limit} for horizon_days="
            f"{horizon_days}; lower value_decimals or the horizon"
        ),
    )
    s_checked = F.when(s_ok.isNull(), F.col("__s"))
    term = s_checked.cast("decimal(38,0)") * F.pow(
        F.lit(2.0), F.lit(horizon_days) - F.col("__k")
    ).cast("decimal(38,0)")
    denom = float(scale * (2 ** horizon_days))
    return partials.groupBy(*keys).agg(
        F.sum("__n").alias("n_events"),
        F.round(F.sum(term).cast("double") / F.lit(denom), 4).alias("decayed_sum"),
        F.max(tref).alias("t_reference"),
    )
