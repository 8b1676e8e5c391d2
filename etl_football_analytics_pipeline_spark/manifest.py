"""Manifest-pointer commits — object-store-safe atomic replacement
for relation directories.

The r7 durability story rewrote relations with a stage-and-rename
swap (``operators.tombstones.replace_dir``): metadata-atomic on HDFS
and local disk, but a RENAME ON S3-LIKES IS A COPY of the whole tree,
so the swap window widened with the data size — the one piece of the
index/warehouse design that did not generalize to the 100 TB
deployment. This module removes directory renames from the commit
path entirely:

    relation/
      _trees/v00000001-3f2a9c41d07b/   ← immutable parquet trees,
      _trees/v00000002-91c0de55aa18/     content-addressed by token
      _manifests/v00000001.3f2a9c41d07b ← EMPTY marker files; the
      _manifests/v00000002.91c0de55aa18   NAME is the whole manifest

A commit is: (1) write the new tree under a fresh uuid-token
directory nobody resolves yet, (2) create ONE empty marker file whose
name carries ``(version, token)``. Readers resolve the highest
committed version and scan an immutable tree. The properties:

- **No rename anywhere.** The publish step is a single
  create-if-absent of a zero-byte object — atomic on every filesystem
  Spark can write (a PUT on S3, an atomic namespace create on HDFS,
  an O_CREAT|O_EXCL on local disk). Nothing is ever renamed, so
  object-store rename-as-copy windows cannot exist.
- **Marker name IS the manifest.** An empty file cannot be "partially
  written": the instant the name exists the commit is complete, so
  there is no torn-pointer state to recover (the hazard the versioned
  table's ``_LATEST`` needed fsync choreography for).
- **Crash anywhere is recoverable, never destructive.** A crash
  before the marker leaves an orphan tree that readers never resolve
  (the next commit garbage-collects it); a crash after the marker has
  already committed — retention just hasn't retired the old tree yet,
  which the next commit finishes.
- **Concurrent-writer collisions fail LOUD.** ``create(overwrite=
  False)`` makes two writers racing the same version an error on the
  second, not a silent clobber — the single-writer contract is now
  machine-checked at the commit point.

Retention is explicit: ``manifest_vacuum(keep=N)`` retires all but
the newest N versions and deletes any tree no surviving marker
references, RAISING on a failed delete — ``forget_keys_hard``'s
"rows exist nowhere on disk" contract rests on deletions being
verified, exactly like ``sources.versioned.vacuum``.

Reference analog: the reference commits its warehouse loads through
PostgreSQL transactions (`scr/Load.py`); this is the same atomicity
for parquet relations on any Hadoop-visible filesystem, shaped like
the metadata layer of a table format (Delta/Iceberg) reduced to the
single-writer case the engine's indexes need.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame

__all__ = [
    "current_manifest",
    "manifest_commit",
    "manifest_vacuum",
    "manifest_versions",
    "read_relation",
    "read_relation_version",
    "resolved_dir",
    "tree_dir",
]

_TREES = "_trees"
_MANIFESTS = "_manifests"
# marker file name: v<8-digit version>.<12-hex tree token>
_MARKER_RE = re.compile(r"^v(\d{8})\.([0-9a-f]{12})$")


def _fs(spark, path: str):
    """(FileSystem, Path ctor) for the scheme owning ``path`` — the
    commit protocol runs entirely through the Hadoop FS API so the
    SAME code path serves file:, hdfs: and s3a: relations."""
    from .utils import _hadoop_fs

    if spark is None:
        raise ValueError("manifest operations need an explicit SparkSession")
    return _hadoop_fs(path, spark)


def tree_dir(dest: str, version: int, token: str) -> str:
    """The immutable tree directory a (version, token) pair names."""
    return f"{dest.rstrip('/')}/{_TREES}/v{version:08d}-{token}"


def _marker_path(dest: str, version: int, token: str) -> str:
    return f"{dest.rstrip('/')}/{_MANIFESTS}/v{version:08d}.{token}"


def manifest_versions(spark, dest: str) -> list[tuple[int, str]]:
    """All committed ``(version, token)`` pairs, ascending — [] for a
    relation that has never manifest-committed (legacy plain dir or
    nothing at all). Ignores foreign files in ``_manifests``."""
    fs, hp = _fs(spark, dest)
    mdir = hp(f"{dest.rstrip('/')}/{_MANIFESTS}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        m = _MARKER_RE.match(st.getPath().getName())
        if m:
            out.append((int(m.group(1)), m.group(2)))
    out.sort()
    return out


def current_manifest(spark, dest: str) -> tuple[int, str] | None:
    """The live ``(version, token)``, or None when the relation has no
    manifest (resolve falls back to the plain directory). Duplicate
    markers for one version would mean two writers violated the
    single-writer contract AND both dodged the create-if-absent guard
    (possible only on filesystems without atomic create) — refuse to
    guess which tree is real."""
    versions = manifest_versions(spark, dest)
    if not versions:
        return None
    top = [vt for vt in versions if vt[0] == versions[-1][0]]
    if len(top) > 1:
        raise IOError(
            f"manifest corruption in {dest!r}: version {top[0][0]} has "
            f"{len(top)} markers ({[t for _, t in top]}); the "
            "single-writer contract was violated — delete the marker "
            "of the losing commit before reading"
        )
    return versions[-1]


def resolved_dir(spark, dest: str) -> str:
    """Where the relation's live data actually is: the current
    manifest's tree when one exists, else ``dest`` itself (legacy
    plain layout — every pre-manifest index keeps reading unchanged).
    EVERY read and append of a replace_dir-managed relation goes
    through this; Spark treats ``_``-prefixed children as hidden, so a
    direct ``read.parquet(dest)`` on a converted relation would see no
    data at all rather than stale data."""
    dest = dest.rstrip("/")
    cur = current_manifest(spark, dest)
    return tree_dir(dest, *cur) if cur else dest


def read_relation(spark, dest: str) -> DataFrame:
    """Scan the live tree of a manifest-managed (or legacy plain)
    relation directory."""
    return spark.read.parquet(resolved_dir(spark, dest))


def read_relation_version(spark, dest: str, version: int) -> DataFrame:
    """Time travel: scan a specific RETAINED version's tree (commits
    made with keep>1 keep history; replace_dir's keep=1 does not).
    Raises KeyError when the version was never committed or has been
    vacuumed — reading a half-retired tree silently would defeat the
    marker-first retirement ordering."""
    versions = manifest_versions(spark, dest)
    hits = [tok for v, tok in versions if v == version]
    if len(hits) > 1:
        # same corruption current_manifest refuses: two markers for
        # one version — returning an arbitrary tree would silently
        # time-travel to the LOSING commit's data
        raise IOError(
            f"manifest corruption in {dest!r}: version {version} has "
            f"{len(hits)} markers ({hits}); the single-writer "
            "contract was violated — delete the losing marker first"
        )
    if hits:
        return spark.read.parquet(tree_dir(dest, version, hits[0]))
    raise KeyError(
        f"version {version} of {dest!r} is not committed (or was "
        f"vacuumed); retained: {[v for v, _ in versions]}"
    )


def _verified_delete(fs, hp, path: str, what: str) -> None:
    """Delete and VERIFY — a swallowed failure here would report hard
    erasure that did not happen (same contract as versioned.vacuum)."""
    p = hp(path)
    if not fs.exists(p):
        return
    fs.delete(p, True)
    if fs.exists(p):
        raise IOError(f"manifest retention could not delete {what} {path!r}")


def manifest_commit(spark, dest: str, write, keep: int = 1) -> int:
    """Commit ``write``'s output as the relation's next version.

    ``write(tree_path)`` materializes the new tree into a fresh
    token directory (it may freely READ the current tree — e.g. a
    compaction's survivors plan — because nothing it reads moves until
    after the marker is committed). The commit is then one empty-file
    create; retention (``keep`` newest versions, default 1 = replace
    semantics) runs after the marker so a crash at any point leaves
    either the old version live and complete, or the new one.

    Returns the committed version number."""
    dest = dest.rstrip("/")
    fs, hp = _fs(spark, dest)
    committed = manifest_versions(spark, dest)
    next_v = committed[-1][0] + 1 if committed else 1
    token = uuid.uuid4().hex[:12]
    tree = tree_dir(dest, next_v, token)
    write(tree)
    if not fs.exists(hp(tree)):
        raise IOError(f"manifest_commit: write produced nothing at {tree}")
    marker = _marker_path(dest, next_v, token)
    try:
        # overwrite=False: create-if-absent is the publish; a
        # concurrent writer that raced to the same version number dies
        # HERE instead of silently clobbering the committed tree.
        # Atomic on HDFS/local; on S3A create is check-then-put, so
        # the collision guard is best-effort and correctness rests on
        # the single-writer contract (unlike the rename-swap this
        # replaces, a LOST race here still leaves both trees on disk —
        # token-named, nothing overwritten).
        fs.create(hp(marker), False).close()
    except Exception as exc:  # Py4J wraps FileAlreadyExistsException
        if fs.exists(hp(marker)):
            raise IOError(
                f"manifest_commit: marker {marker!r} already exists — "
                "a concurrent writer committed this version first "
                "(the relation is single-writer); re-read and retry"
            ) from exc
        raise  # a real storage fault, not a race — don't relabel
    manifest_vacuum(spark, dest, keep=keep)
    # any cached file listing keyed under dest (or the legacy root) is
    # stale now; the new tree path itself has never been scanned
    spark.catalog.refreshByPath(dest)
    return next_v


def manifest_vacuum(spark, dest: str, keep: int = 1) -> list[int]:
    """Retire all but the newest ``keep`` committed versions (marker
    first, then tree — a marker pointing at a deleted tree would break
    a time-travel read, a tree without a marker is just an orphan) and
    garbage-collect orphan trees no surviving marker references (the
    residue of commits that crashed between tree write and marker).
    Deletions are verified; returns the retired version numbers."""
    dest = dest.rstrip("/")
    fs, hp = _fs(spark, dest)
    committed = manifest_versions(spark, dest)
    if not committed:
        return []
    keep = max(1, keep)
    kept = committed[-keep:]
    dropped = []
    for v, tok in committed[: len(committed) - len(kept)]:
        _verified_delete(fs, hp, _marker_path(dest, v, tok), "marker")
        _verified_delete(fs, hp, tree_dir(dest, v, tok), "tree")
        dropped.append(v)
    keep_names = {f"v{v:08d}-{tok}" for v, tok in kept}
    tdir = hp(f"{dest}/{_TREES}")
    if fs.exists(tdir):
        for st in fs.listStatus(tdir):
            name = st.getPath().getName()
            if name not in keep_names:
                _verified_delete(
                    fs, hp, f"{dest}/{_TREES}/{name}", "orphan tree"
                )
    return dropped


def clear_legacy_root(spark, dest: str) -> None:
    """Remove pre-manifest data files from the relation ROOT after its
    first manifest commit. A converted relation resolves through the
    manifest, so anything left at the root is unreachable-but-on-disk
    — which is exactly what hard erasure must not leave behind (and
    what the old rename-swap also removed, by replacing the whole
    directory). Deletes every child except the manifest machinery;
    verified, raises on failure."""
    dest = dest.rstrip("/")
    fs, hp = _fs(spark, dest)
    dp = hp(dest)
    if not fs.exists(dp):
        return
    for st in fs.listStatus(dp):
        name = st.getPath().getName()
        if name in (_TREES, _MANIFESTS):
            continue
        _verified_delete(fs, hp, f"{dest}/{name}", "legacy root entry")
