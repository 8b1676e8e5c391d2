"""Streaming dimension history: a `foreachBatch` sink that maintains
an SCD Type-2 dimension from a stream of change observations.

The batch tier (`pipeline.warehouse.write_dim_scd2`) loads one
snapshot per call; this sink gives the same history table a streaming
write path — point a CDC/event stream of (key, attrs, ts) at it and
the versioned dimension advances one atomic snapshot commit per
micro-batch:

    q = (stream.writeStream
         .foreachBatch(scd2_sink(table_dir, ["team_id"], ["stadium"], "ts"))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())

Semantics per micro-batch (dbt-snapshot-style):
- the batch reduces to each key's LATEST observation (ts, then
  tiebreak) — intermediate states inside one micro-batch collapse,
  exactly like scd2_build's no-op rule collapses unchanged
  consecutive states; shrink the trigger interval when intra-batch
  transitions matter;
- the FIRST batch bootstraps the dimension with scd2_build (so a
  large backfilled first batch keeps its full per-key history);
- later batches merge via scd2_apply with PER-ROW observation times
  (each key closes/opens at its own change time, not the batch's
  wall-clock) — one full-outer join per batch;
- each result commits through sources.versioned (atomic `_LATEST`
  pointer swap): readers see complete snapshots only, a crash leaves
  the previous version live, and a REPLAYED batch re-derives the same
  history (apply is a no-op for already-seen states), so the sink is
  idempotent under Structured Streaming's at-least-once foreachBatch
  contract.

Scale shape: one key-partitioned window over the BATCH (small) plus
one full-outer hash join against the dimension per micro-batch — the
same shapes as the batch tier, run incrementally.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_sink"]


def scd2_sink(
    table_dir: str,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str | None = None,
    keep_versions: int = 5,
) -> Callable[[DataFrame, int], None]:
    keys, attrs = list(key_cols), list(attr_cols)

    def apply(batch: DataFrame, batch_id: int) -> None:
        from ..operators.scd import scd2_apply, scd2_build
        from ..sources.versioned import (
            commit_version,
            current_version,
            read_latest,
            vacuum,
        )

        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if current_version(table_dir) is None:
            dim = scd2_build(batch, keys, attrs, ts_col, tiebreak_col)
        else:
            order = [F.desc(ts_col)] + (
                [F.desc(tiebreak_col)] if tiebreak_col else []
            )
            w = Window.partitionBy(*keys).orderBy(*order)
            latest = (
                batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            dim = scd2_apply(
                read_latest(spark, table_dir), latest, keys, attrs, F.col(ts_col)
            )
        commit_version(dim, table_dir)
        if keep_versions > 0:
            vacuum(table_dir, keep=keep_versions)

    return apply
