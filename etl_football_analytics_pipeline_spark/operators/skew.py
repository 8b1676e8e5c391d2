"""Skew mitigation — the two rewrites for hot keys that AQE cannot fix.

AQE's skew-join split (on by default in session.py) repairs oversized
SORT-MERGE/shuffle-join partitions at runtime, and partial aggregation
already makes algebraic groupBy aggregates skew-proof. Two shapes
remain genuinely skew-bound on a hot key, and both have a classic
rewrite:

1. grouped COUNT DISTINCT: Spark's rewrite shuffles once on
   (key, value) — fine — but a plain `groupBy(key).agg(countDistinct)`
   written over an EXPANDED multi-distinct plan, or any
   `collect_set`-style state, funnels every distinct value of the hot
   key through one reducer. `distinct_count_skew_safe` states the
   spread-by-composite-key form explicitly: dedupe on (key, value)
   (the hot key's values hash across ALL partitions), then count per
   key — the count is algebraic, so the second shuffle carries one
   partial row per key per task.

2. shuffle joins where ONE side has a hot key and the other side is
   modest but above the broadcast threshold: `salted_join` appends a
   deterministic salt in [0, salts) to the skewed side's key and
   replicates the other side once per salt value, turning one hot
   partition into `salts` even ones. Result-identical to the plain
   join (asserted in tests/test_skew.py); replication cost is
   |right| × salts, so pick salts ≈ hot-partition-size /
   target-partition-size.

Both are pure DataFrame rewrites — no RDDs, no custom partitioners —
so Catalyst/AQE still optimize around them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_count_skew_safe(df: DataFrame, key: str, value: str) -> DataFrame:
    """`SELECT key, COUNT(DISTINCT value)` with the shuffle spread over
    (key, value): a key owning 90% of rows still distributes its
    distinct-dedup work across the whole cluster; only the final
    algebraic count converges on the key. Output: (key, n_distinct).

    NULL handling matches the plain groupBy(key).agg(countDistinct):
    NULL values never count, but a key whose values are ALL NULL still
    appears with n_distinct = 0 — a pre-group isNotNull filter would
    silently drop that key from the output entirely."""
    return (
        df.select(key, value)
        .distinct()  # shuffles on (key, value) — hot keys spread
        .groupBy(key)
        # count(col) skips NULLs, so the all-NULL key's single
        # surviving (key, NULL) row counts 0 instead of vanishing
        .agg(F.count(F.col(value)).alias("n_distinct"))
    )


def _unambiguous(
    joined: DataFrame, l_s: DataFrame, r_s: DataFrame, on: list[str], right_cols: list[str]
) -> DataFrame:
    """Project the salted join back to plain-join column order, taking
    shared non-key names from the side the plain join would (both —
    duplicate names survive, exactly like left.join(right, on))."""
    out = [l_s[c] for c in l_s.columns if c != "__salt"]
    out += [r_s[c] for c in right_cols]
    return joined.select(*out)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys split across `salts`
    shuffle partitions and the RIGHT side replicated once per salt.

    The salt is a deterministic hash of the left row's non-key columns
    (falling back to the key itself for key-only frames), so the join
    is reproducible under any partitioning. Semantics match
    `left.join(right, on, how)` for 'inner' and 'left' joins —
    row-identical including duplicate multiplicity (asserted in
    tests/test_skew.py). Right-side rows explode ×salts, so use this
    when the right side is too big to broadcast but small enough to
    replicate; otherwise let AQE's skew split handle it.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salts < 1:
        # salts=0 would fail deep in the job (ANSI pmod DIVIDE_BY_ZERO
        # on an executor) instead of at the call site
        raise ValueError(f"salts must be >= 1, got {salts}")
    on = list(on)
    non_key = [c for c in left.columns if c not in on] or on
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(salts))
    l_s = left.withColumn("__salt", salt.cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    right_cols = [c for c in right.columns if c not in on]
    # dataframe-qualified projection: a shared non-key column name
    # (status, updated_at, ...) must come back like the plain join's
    # duplicate columns, not raise AMBIGUOUS_REFERENCE on select(*names)
    joined = l_s.join(r_s, on + ["__salt"], how)
    return _unambiguous(joined, l_s, r_s, on, right_cols)
