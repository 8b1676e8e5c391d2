"""Log-structured deletes for the persisted indexes.

Every persisted index in the engine (BM25 inverted index, MinHash
near-dup index, IVF/IVF-PQ vector indexes) is an append-friendly
parquet layout — rewriting it to delete a handful of documents would
cost a full build. The production pattern is the tombstone: doomed ids
append to a side table, every probe anti-joins them, and compaction
stays a later rebuild. These helpers are that pattern once, shared by
all index modules; each index keeps its own delete entry point because
some (BM25) must also compensate summable stats.

Scale shape: the tombstone set is assumed probe-broadcastable (deletes
are rare relative to the corpus); when it stops being small, that is
the signal to compact (rebuild without the doomed ids), after which
the tombstone dir resets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["append_tombstones", "drop_tombstones", "filter_tombstones"]

_DIRNAME = "tombstones"


def _dir_exists(spark, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — a
    driver-local ``os.path.isdir`` would be always-false for an index
    on HDFS/S3 (or any path only executors can see), silently
    resurrecting tombstoned ids. The FS resolved from the path's own
    scheme answers for every filesystem Spark can read."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def append_tombstones(ids: DataFrame, index_dir: str, id_col: str) -> None:
    """Record doomed ids under ``index_dir/tombstones`` (appended,
    deduplicated at read time — repeated deletes are idempotent)."""
    (
        ids.select(F.col(id_col).alias("__id"))
        .distinct()
        .write.mode("append")
        .parquet(os.path.join(index_dir, _DIRNAME))
    )


def drop_tombstones(spark, index_dir: str) -> None:
    """Remove the tombstone set — call ONLY after a compaction has
    physically rewritten the index without the doomed rows (each index
    module's *_compact_index does both). Deleting it any other way
    resurrects every tombstoned id. Same Hadoop FS path handling as
    the existence probe, so it works on any filesystem Spark writes."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(os.path.join(index_dir, _DIRNAME))
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


def filter_tombstones(
    spark, index_dir: str, df: DataFrame, id_col: str
) -> DataFrame:
    """``df`` minus tombstoned ids — a no-op (and no extra plan nodes)
    when the index has never seen a delete."""
    tomb_dir = os.path.join(index_dir, _DIRNAME)
    if not _dir_exists(spark, tomb_dir):
        return df
    tomb = (
        spark.read.parquet(tomb_dir)
        .select(F.col("__id").alias(id_col))
        .distinct()
    )
    return df.join(F.broadcast(tomb), id_col, "left_anti")
