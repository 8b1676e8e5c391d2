"""Bucketed (hash-clustered) tables: co-located joins and aggregates.

The single most expensive physical operation at 100 TB is the shuffle
a big join or aggregation pays to co-locate its keys. Bucketing pays
that shuffle ONCE at write time: `bucketBy(n, keys)` hash-partitions
rows into a fixed number of buckets per output task and records the
bucket spec in the catalog, so every later join or groupBy on the
bucket keys reads both sides already hash-distributed — Catalyst
plans a SortMergeJoin (or hash aggregate) with NO Exchange on either
side. This is Spark's native form of the co-located fact/fact join
(the same contract Hive/Iceberg bucketing and the reference's
PostgreSQL PK-indexed MERGE target rely on: repeated keyed access
should not re-cluster the data every time).

What the wrappers add over raw `DataFrameWriter.bucketBy`:
- one place that enforces the invariants co-location depends on
  (same bucket COUNT and same key ORDER on both sides — mismatched
  counts silently fall back to a full shuffle);
- sorted buckets by default (`sortBy` = the join keys) so the
  SortMergeJoin also skips its per-partition sort;
- a session guard for the conf that disables bucketed scans.

tests/test_layout.py asserts the contract end to end: the co-located
join and the bucket-key aggregate both execute with ZERO
ShuffleExchange operators and return results identical to the plain
(shuffling) plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Save `df` as a bucketed catalog table: rows hash into
    `num_buckets` buckets on `keys`, each bucket sorted on
    `sort_cols` (default: the bucket keys, which lets downstream
    SortMergeJoins skip their sort). Joins between tables written
    with the SAME `num_buckets` and `keys` are shuffle-free.
    `path` makes it an external table at that location (the catalog
    still carries the bucket spec — only the spec, not the location,
    governs co-location)."""
    if not keys:
        raise ValueError("write_bucketed needs at least one bucket key")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    sort_cols = list(sort_cols) if sort_cols is not None else list(keys)
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *keys)
    if path is not None:
        writer = writer.option("path", path)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket_keys) recorded in the catalog for `table`,
    or None if the table is not bucketed. Read from DESCRIBE EXTENDED
    (the stable public surface for the bucket spec)."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r.col_name: r.data_type for r in rows}
    if "Num Buckets" not in info:
        return None
    cols = [c.strip().strip("`") for c in info["Bucket Columns"].strip("[]").split(",")]
    return int(info["Num Buckets"]), cols


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys,
    validating up front that the bucket specs actually co-locate the
    join (same count, keys covering `on` in order) — the silent
    failure mode of raw bucketing is a spec mismatch that quietly
    reinstates the full shuffle. Ensures bucketed reads are enabled
    for the session, then returns the plain join; Catalyst plans it
    Exchange-free."""
    on = list(on)
    specs = []
    for t in (left_table, right_table):
        spec = bucket_spec(spark, t)
        if spec is None:
            raise ValueError(f"{t} is not bucketed; write it with write_bucketed")
        specs.append(spec)
    (n_l, keys_l), (n_r, keys_r) = specs
    if n_l != n_r:
        raise ValueError(
            f"bucket-count mismatch ({left_table}={n_l}, {right_table}={n_r}) "
            "would silently fall back to a shuffled join"
        )
    # the bucket keys must equal the join keys EXACTLY: a strict
    # prefix (bucketed on [user_id], joined on [user_id, event_type])
    # passes a covering check but Spark does NOT accept a cluster-key
    # subset for co-partitioning by default
    # (spark.sql.requireAllClusterKeysForCoPartition=true), so both
    # sides would get a full ShuffleExchange — exactly the silent
    # fallback this guard exists to reject
    if keys_l != keys_r or keys_l != on:
        raise ValueError(
            f"bucket keys {keys_l} vs {keys_r} do not co-locate join keys {on}; "
            "bucket keys must equal the join keys exactly"
        )
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    return spark.table(left_table).join(spark.table(right_table), on, how)
