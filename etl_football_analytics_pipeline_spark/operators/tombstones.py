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

__all__ = [
    "append_tombstones",
    "drop_tombstones",
    "filter_tombstones",
    "replace_dir",
]

_DIRNAME = "tombstones"


def _dir_exists(spark, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — a
    driver-local ``os.path.isdir`` would be always-false for an index
    on HDFS/S3 (or any path only executors can see), silently
    resurrecting tombstoned ids. The FS resolved from the path's own
    scheme answers for every filesystem Spark can read."""
    from ..utils import _hadoop_fs

    fs, hp = _hadoop_fs(path, spark)
    return bool(fs.exists(hp(path)))


def replace_dir(spark, dest: str, write) -> None:
    """Durably replace the directory at ``dest``: ``write(tmp_path)``
    materializes the replacement into a SIBLING temp dir first, then
    two FileSystem renames swap it in (``dest`` → ``dest.__old``,
    ``dest.__new`` → ``dest``) and the old copy is deleted last.

    This is how every compaction rewrites an index relation. The two
    properties it buys over ``mode("overwrite")`` on the source path:

    - **No volatile-only copy, ever.** An in-place overwrite must first
      materialize the survivors (the plan reads the very dir being
      truncated); ``localCheckpoint`` blocks live only in executor
      storage, so an executor loss mid-overwrite destroyed the only
      copy of the index. Here the replacement is durable parquet
      before the source is touched, and no checkpoint is needed at all
      — the write streams straight from source to sibling.
    - **No dependence on ``partitionOverwriteMode``.** A partitioned
      in-place overwrite under a caller's ``dynamic`` setting keeps
      partitions whose rows were all filtered out — for a compaction
      that silently retains tombstoned rows on disk. The sibling dir
      is fresh, so the session setting is irrelevant.

    Crash windows are recoverable, never destructive: before the first
    rename both copies exist; between the renames the old data is at
    ``dest.__old`` and the new at ``dest.__new``, and the NEXT call
    restores the old copy to ``dest`` before anything else (so the
    caller's writer finds its source and the retry redoes the whole
    replacement) — only then are leftovers cleaned. If the swap-in
    rename itself fails the old dir is restored immediately. Renames
    are metadata-atomic on HDFS and local FS; on object stores they
    are copies, so the swap window widens — use a real table format
    (Delta/Iceberg) for object-store indexes (sources.versioned is
    local-FS-only by design and refuses remote schemes)."""
    from ..utils import _hadoop_fs, commit_staged_dir, recover_swapped_dir

    fs, hadoop_path = _hadoop_fs(dest, spark)
    dest = dest.rstrip("/")
    tmp = dest + ".__new"
    tmp_p = hadoop_path(tmp)
    # crash recovery BEFORE cleanup: dest absent + .__old present is
    # the between-renames crash state — .__old holds the last complete
    # copy, so restore it; deleting it as a "leftover" here would
    # destroy the only surviving data
    recover_swapped_dir(dest, spark)
    for p in (tmp_p, hadoop_path(dest + ".__old")):  # crashed-run leftovers
        if fs.exists(p):
            fs.delete(p, True)
    write(tmp)
    if not fs.exists(tmp_p):
        raise IOError(f"replace_dir: write produced nothing at {tmp}")
    # the shared two-rename swap (utils.commit_staged_dir): retire
    # dest to .__old, rename the stage in, drop the retired copy —
    # dest is never overwritten in place (rename onto an existing dir
    # nests on some FS impls), and a mid-swap crash is recovered by
    # the recover_swapped_dir call above on the next attempt
    commit_staged_dir(dest, tmp, spark)
    # the swap invalidated any cached file listing for this path
    spark.catalog.refreshByPath(dest)


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
    from ..utils import _hadoop_fs

    tomb = os.path.join(index_dir, _DIRNAME)
    fs, hp = _hadoop_fs(tomb, spark)
    if fs.exists(hp(tomb)):
        fs.delete(hp(tomb), True)


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
