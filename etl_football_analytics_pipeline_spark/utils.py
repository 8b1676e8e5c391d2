"""Small engine-wide helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least `min_partitions` (default: defaultParallelism)
    input partitions for a CPU-heavy downstream stage.

    Small single-file corpora arrive as ONE partition, serializing
    per-row kernels (interpreted higher-order functions, Arrow/numpy
    batches) onto one core. Repartitioning is a shuffle, so this is a
    no-op whenever the input is already at least that wide — at real
    scale inputs arrive in thousands of partitions and nothing moves.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
