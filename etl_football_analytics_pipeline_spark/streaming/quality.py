"""Streaming data-quality gate: the expectations layer
(operators/expectations.py) as a `foreachBatch` sink — each
micro-batch splits into a valid sink, a quarantine sink (rows tagged
with the rules they failed), and a per-batch violation report.

    q = (stream.writeStream
         .foreachBatch(expectations_sink(out_dir, rules))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())

Layout under `out_dir`:
    valid/batch=<id>/ ...       rows passing every rule
    quarantine/batch=<id>/ ...  failing rows + violations array
    report/batch=<id>/ ...      one row per rule (violations, checked)

Each sink writes `mode("overwrite")` into its OWN batch=<id>
directory, so a replayed micro-batch (Structured Streaming's
at-least-once foreachBatch contract) overwrites its previous attempt
instead of duplicating rows — idempotence via batch-id partitioning,
the standard foreachBatch dedup recipe. Readers scan `valid/` with
partition discovery and see every committed batch.

Scale shape per batch: the same single-projection tagging and single
map-side-combined report aggregate as the batch tier — no joins, no
windows; the stream adds only the two partitioned writes.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expectations_sink"]


def expectations_sink(
    out_dir: str,
    rules: Mapping[str, F.Column] | Callable[[], Mapping[str, F.Column]],
) -> Callable[[DataFrame, int], None]:
    def apply(batch: DataFrame, batch_id: int) -> None:
        from ..operators.expectations import expect_report, expect_split

        r = rules() if callable(rules) else rules
        valid, quarantine = expect_split(batch, r)
        valid.write.mode("overwrite").parquet(
            os.path.join(out_dir, "valid", f"batch={batch_id}")
        )
        quarantine.write.mode("overwrite").parquet(
            os.path.join(out_dir, "quarantine", f"batch={batch_id}")
        )
        expect_report(batch, r).write.mode("overwrite").parquet(
            os.path.join(out_dir, "report", f"batch={batch_id}")
        )

    return apply
