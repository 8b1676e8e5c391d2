"""Scan-pruning join machinery: runtime bloom filters, dynamic
partition pruning, and explicit semi-join reduction.

At 100 TB the fastest tuple is the one never read. Three layers of
"don't scan it" apply to selective joins, all exercised and
plan-asserted in tests/test_layout.py:

1. DYNAMIC PARTITION PRUNING (DPP) — a fact table written
   `partitionBy(key)` joined to a dim with a selective filter makes
   Catalyst evaluate the dim side first and inject the surviving keys
   into the fact scan's PartitionFilters (`dynamicpruning#...` in the
   plan): unmatched partition directories are never opened. Free —
   no code needed beyond the partitioned layout; the test pins that
   the injection actually happens for the engine's session settings.

2. RUNTIME BLOOM FILTER — when the join key is NOT the partition key,
   Spark can still build a bloom filter over the filtered dim side's
   keys and push `might_contain(...)` into the fact scan, dropping
   non-joining rows at the scan instead of carrying them through the
   shuffle (`spark.sql.optimizer.runtime.bloomFilter.*`).
   `enable_runtime_bloom` pins the confs the injection depends on.
   Production note: the application-side default threshold (10 GB)
   exists so small scans don't pay bloom overhead — at the 100 TB
   target the thresholds trigger naturally; tests lower them only to
   make injection observable at test scale.

3. EXPLICIT SEMI-JOIN REDUCTION (`semi_prefilter`) — the manual form
   for when the optimizer cannot inject (keys passed through
   transformations the injection rules don't traverse, or the
   reduced side feeds several downstream joins and should be
   filtered ONCE). A left_semi join against the distinct key set of
   the filter side: broadcast when the key set is small, exact (no
   false positives, unlike the bloom), result-identical to filtering
   after the join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def enable_runtime_bloom(
    spark: SparkSession,
    application_side_min_bytes: int | None = None,
    creation_side_max_bytes: int | None = None,
) -> None:
    """Ensure runtime bloom-filter join pruning is on for the session.

    With no arguments this keeps Spark's production thresholds (the
    creation side must be small enough to build cheaply, the
    application side big enough — 10 GB — that skipping pays).
    Passing explicit byte bounds overrides them; tests pass
    `application_side_min_bytes=0` so the injection is observable on
    test-sized scans."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    if application_side_min_bytes is not None:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            str(application_side_min_bytes),
        )
    if creation_side_max_bytes is not None:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            str(creation_side_max_bytes),
        )


def semi_prefilter(
    fact: DataFrame,
    keys_side: DataFrame,
    on: Sequence[tuple[str, str]],
    broadcast_keys: bool = True,
) -> DataFrame:
    """Reduce `fact` to rows whose keys appear in `keys_side` BEFORE
    a wider join/aggregation consumes it.

    `on` maps fact columns to keys_side columns
    (e.g. [("fk", "pk")]). The key set is projected and
    de-duplicated first — so the semi join carries only the key
    columns, broadcast by default (a dim key set is dims-sized, never
    fact-sized; pass broadcast_keys=False if the key set is itself
    huge and a shuffled semi join is the honest plan). Returns fact
    rows unchanged (left_semi): exact reduction, no duplication, no
    false positives."""
    on = list(on)
    if not on:
        raise ValueError("semi_prefilter needs at least one key pair")
    keys = keys_side.select(
        *[F.col(k).alias(f"__k{i}") for i, (_, k) in enumerate(on)]
    ).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    cond = None
    for i, (f_col, _) in enumerate(on):
        c = fact[f_col] == keys[f"__k{i}"]
        cond = c if cond is None else cond & c
    return fact.join(keys, cond, "left_semi")
