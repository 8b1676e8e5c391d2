"""Right-to-be-forgotten, composed end-to-end.

The engine already has every deletion primitive separately:
`sources.versioned.delete_commit` (row-level table delete committed as
a new immutable snapshot) and the three per-index tombstone deletes
(`operators.text.bm25_delete_from_index`,
`operators.dedup.minhash_index_delete`,
`operators.similarity.ivf_delete_index` — the last covers IVF-PQ too,
both probes share one tombstone set). A real erasure request touches
ALL of them: the document must become unreachable via the table scan,
time-travel-latest, AND every derived index probe. `forget_keys` is
that one call.

Ordering and failure semantics: the index tombstones land FIRST, the
table commit LAST — so "the table version advanced" is the receipt
that every registered index was already tombstoned. Every step is
idempotent (tombstone appends dedupe at read time, the BM25 stats
compensation derives from the live sidecar so a re-delete contributes
a zero row, and re-anti-joining already-deleted keys commits an
identical survivor set), which makes a partially-failed call safely
re-runnable — retry the whole thing, never resume halfway.

Scale shape: the doomed-key set is materialized once
(localCheckpoint) and is by assumption tiny relative to the corpus
(erasure requests, not bulk deletes); each index append is one small
write, and the table delete is one anti-join that Catalyst broadcasts.
Old snapshots still contain the rows until `sources.versioned.vacuum`
retires them, and index files still contain tombstoned rows until
compaction — by design (time-travel auditability until the retention
clock fires, O(delta) deletes until a scheduled rewrite). When the
clock HAS fired, `forget_keys_hard` runs all three levels in one
call: probe unreachability, snapshot vacuum, index compaction —
after it the rows exist nowhere on disk.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    _minhash_index_params,
    minhash_index_compact,
    minhash_index_delete,
)
from ..operators.similarity import ivf_compact_index, ivf_delete_index
from ..operators.text import bm25_compact_index, bm25_delete_from_index
from ..sources.versioned import delete_commit, vacuum

__all__ = ["IndexRef", "compact_indexes", "forget_keys", "forget_keys_hard"]


@dataclass(frozen=True)
class IndexRef:
    """A derived index registered for delete propagation.

    kind: 'bm25' | 'minhash' | 'ivf' (IVF and IVF-PQ share a layout
    and tombstone set, so 'ivf' covers both).
    id_col: the index's own id column. Defaults per kind ('__id' for
    bm25, 'vec_id' for ivf); for minhash it is read from the index's
    persisted params, which already record it.
    """

    kind: str
    path: str
    id_col: str | None = None


def forget_keys(
    spark: SparkSession,
    table_dir: str,
    doomed: DataFrame,
    keys: list[str],
    indexes: Sequence[IndexRef] = (),
) -> int:
    """Erase rows everywhere: tombstone every registered index, then
    commit the table delete as a new snapshot. Returns the new table
    version. `doomed` needs only the key columns (extras ignored).

    Index propagation requires a single-column key — every persisted
    index is id-keyed; composite-keyed tables can still forget
    table-only (indexes=())."""
    if indexes and len(keys) != 1:
        raise ValueError(
            "index propagation needs a single-column key; "
            f"got keys={keys!r}"
        )
    # validate EVERY ref before the first mutation: an unknown kind or
    # a disagreeing minhash id_col must fail with zero indexes
    # tombstoned, not halfway through the loop (idempotency makes a
    # partial run re-runnable, but failing cleanly is still better)
    plans = []
    for ref in indexes:
        if ref.kind == "bm25":
            col = ref.id_col or "__id"
        elif ref.kind == "minhash":
            # the index's persisted params are AUTHORITATIVE for its id
            # column — minhash_index_delete re-reads them internally
            # and selects that column, so a caller-supplied id_col that
            # disagreed would crash the append, never rename around it
            col = _minhash_index_params(spark, ref.path)[3]
            if ref.id_col is not None and ref.id_col != col:
                raise ValueError(
                    f"minhash index at {ref.path!r} records id_col="
                    f"{col!r}; IndexRef.id_col={ref.id_col!r} disagrees"
                )
        elif ref.kind == "ivf":
            col = ref.id_col or "vec_id"
        else:
            raise ValueError(f"unknown index kind {ref.kind!r}")
        plans.append((ref, col))
    # materialize the (tiny) key set once: every index append and the
    # table anti-join reuse it, and checkpoint blocks release on GC
    ids = doomed.select(*keys).distinct().localCheckpoint()
    for ref, col in plans:
        renamed = ids.withColumnRenamed(keys[0], col)
        if ref.kind == "bm25":
            bm25_delete_from_index(renamed, ref.path, col)
        elif ref.kind == "minhash":
            minhash_index_delete(spark, ref.path, renamed)
        else:
            ivf_delete_index(spark, ref.path, renamed, col)
    return delete_commit(spark, table_dir, ids, keys)


def _manifest_relations(spark, root: str) -> list[str]:
    """Every manifest-managed relation directory under ``root`` (a dir
    carrying a ``_manifests`` child), found through the Hadoop FS so
    remote index roots walk the same way local ones do. Bounded: index
    roots hold a handful of relation dirs, never data-sized fanout."""
    from ..utils import _hadoop_fs

    fs, hp = _hadoop_fs(root, spark)
    out: list[str] = []
    stack = [root.rstrip("/")]
    while stack:
        d = stack.pop()
        if not fs.exists(hp(d)):
            continue
        subdirs = [
            st.getPath().getName()
            for st in fs.listStatus(hp(d))
            if st.isDirectory()
        ]
        if "_manifests" in subdirs:
            out.append(d)
        for name in subdirs:
            if name not in ("_manifests", "_trees"):
                stack.append(f"{d}/{name}")
    return out


def compact_indexes(
    spark: SparkSession, indexes: Sequence[IndexRef]
) -> None:
    """Run each index's physical compaction: rewrite without the
    tombstoned rows and reset the tombstone set. Probe results are
    unchanged; what changes is STORAGE — after this, deleted docs'
    terms/signatures/vectors no longer exist in the index files."""
    for ref in indexes:
        if ref.kind == "bm25":
            bm25_compact_index(spark, ref.path)
        elif ref.kind == "minhash":
            minhash_index_compact(spark, ref.path)
        elif ref.kind == "ivf":
            ivf_compact_index(spark, ref.path, ref.id_col or "vec_id")
        else:
            raise ValueError(f"unknown index kind {ref.kind!r}")


def forget_keys_hard(
    spark: SparkSession,
    table_dir: str,
    doomed: DataFrame,
    keys: list[str],
    indexes: Sequence[IndexRef] = (),
    keep_versions: int = 1,
) -> int:
    """HARD erasure: `forget_keys` (probe-level unreachability,
    auditable snapshot) followed by the two storage-level steps —
    `vacuum` retires the pre-delete table snapshots that still hold
    the rows, and every registered index compacts its tombstones away.
    After this call the deleted rows exist NOWHERE on disk: not in any
    live or historical table version, not in any index relation. Use
    when the retention clock on the audit trail has run out (or the
    regulation demands immediate physical erasure); plain forget_keys
    + a later scheduled vacuum/compact is the day-to-day path.

    `keep_versions=1` keeps only the post-delete snapshot. Every step
    is idempotent; a partially-failed call is safely re-run whole."""
    v = forget_keys(spark, table_dir, doomed, keys, indexes)
    vacuum(table_dir, keep=keep_versions)
    compact_indexes(spark, indexes)
    # crash-residue sweep (r9): the commit-path vacuum inside each
    # compaction never GCs unreferenced trees (one could be a CONCURRENT
    # writer's in-flight tree — see manifest_vacuum), but a compaction
    # attempt that crashed before
    # its marker can have left exactly such an orphan still holding
    # pre-forget rows. forget_keys_hard runs quiesced by contract, so
    # it finishes with an explicit full-GC vacuum of every
    # manifest-managed relation under each index root — after this the
    # doomed rows exist nowhere on disk, crash residue included.
    from ..manifest import manifest_vacuum

    for ref in indexes:
        for rel in _manifest_relations(spark, ref.path):
            manifest_vacuum(spark, rel, keep=1)
    return v
