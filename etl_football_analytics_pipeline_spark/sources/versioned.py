"""Snapshot-versioned parquet tables — transactional-ish semantics on
a plain filesystem, the minimal form of what a table format
(Delta/Iceberg) provides.

Plain `mode("overwrite")` deletes the live table before rewriting it:
a crash mid-write loses the table, and concurrent readers see partial
data. The versioned layout removes both hazards without any new
dependency:

    table/
      v00001/ ... parquet files (immutable once committed)
      v00002/ ...
      _LATEST          ← one small file naming the current version

Writers stage a NEW version directory completely, then commit:

- **local paths** — atomically replace `_LATEST` (os.replace, atomic
  on POSIX; fsync'd against the ext4 empty-file-after-crash pattern);
- **remote schemes** (``scheme://`` paths: hdfs:, s3a:, file:) —
  create ONE empty marker file ``_commits/cNNNNNNNN`` through the
  Hadoop FS API (NEW r8). The marker NAME is the committed version,
  so there is no pointer content to tear and nothing is ever renamed
  or overwritten: the publish is a single create-if-absent, atomic on
  every filesystem Spark can write (a PUT on S3, an atomic namespace
  create on HDFS). Readers resolve the highest marker. This closes
  the r7 gap where remote schemes were refused outright — the same
  manifest-pointer idea as ``manifest.manifest_commit``, specialized
  to numbered snapshots.

Readers resolve the pointer once and scan an immutable directory, so
a reader never observes a half-written table and an interrupted
writer leaves the previous version live. This is snapshot isolation
for single-writer pipelines (remote commits detect a racing writer
loudly: two creates of the same marker cannot both succeed);
multi-writer coordination beyond that is what a real table format
adds on top, behind these same call shapes.

Reference analog: the warehouse loads of `scr/Load.py` commit through
PostgreSQL transactions; this is the parquet-native equivalent the
engine's Load stage can use where no database exists.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"
_COMMITS = "_commits"
_COMMIT_RE = re.compile(r"^c(\d{8})$")


def _is_remote(table_dir: str) -> bool:
    """Scheme'd paths (file://, hdfs://, s3a://, ...) take the
    Hadoop-FS marker protocol; bare paths keep the original
    driver-local pointer file. The local fast path stays os.replace —
    not because the marker protocol wouldn't work there, but because
    existing local tables already carry `_LATEST` pointers."""
    return "://" in table_dir


def _remote_fs(table_dir: str):
    """(FileSystem, Path ctor) for a remote table — the commit marker
    and retention run through the filesystem that owns the DATA, so
    pointer and tree can never split across filesystems (the hazard
    the old local-only guard refused)."""
    from ..utils import _hadoop_fs

    fsj = _hadoop_fs(table_dir, None)
    if fsj is None:
        raise ValueError(
            f"remote versioned table {table_dir!r} needs an active "
            "SparkSession (the Hadoop FS client lives in its JVM)"
        )
    return fsj


def _remote_versions(table_dir: str) -> list[int]:
    """Committed versions of a remote table, ascending — the sorted
    marker numbers under `_commits/`. An empty marker cannot be torn,
    so existence IS commit; there is no corrupt-pointer state.

    PROTOCOL GUARD: a table that carries a `_LATEST` pointer but no
    `_commits` dir was committed with the LOCAL protocol — treating it
    as "never committed" here would make the next commit restart at
    v1, delete the real v00001 as a "crashed orphan", and let vacuum
    erase every other committed version as markerless. A file://
    spelling of a local path is exactly that trap, so refuse loudly
    instead (the pre-r8 NotImplementedError existed for this)."""
    fs, hp = _remote_fs(table_dir)
    cdir = hp(f"{table_dir.rstrip('/')}/{_COMMITS}")
    if not fs.exists(cdir):
        if fs.exists(hp(f"{table_dir.rstrip('/')}/{_POINTER}")):
            raise IOError(
                f"{table_dir!r} carries a local-protocol {_POINTER} "
                "pointer but no _commits markers — it was committed "
                "via its plain local path. Address it WITHOUT the "
                "scheme (or migrate: create markers for each version, "
                "then drop the pointer); proceeding would restart at "
                "v1 and destroy committed versions."
            )
        return []
    out = []
    for st in fs.listStatus(cdir):
        m = _COMMIT_RE.match(st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    out.sort()
    return out


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, _POINTER)


def current_version(table_dir: str) -> int | None:
    """The committed version number: None ONLY for a never-committed
    table (no pointer file). A pointer that exists but does not parse
    is CORRUPTION and raises — treating it as an empty table would
    make the next commit restart at v1, rmtree the real v00001 as an
    'orphan', and silently replace the table with the delta alone."""
    if _is_remote(table_dir):
        versions = _remote_versions(table_dir)
        return versions[-1] if versions else None
    try:
        with open(_pointer_path(table_dir)) as fh:
            text = fh.read().strip()
    except FileNotFoundError:
        # symmetric protocol guard: a _commits dir without a pointer
        # means the table was committed via a scheme'd spelling —
        # "never committed" here would trigger the same restart-at-v1
        # destruction in the other direction
        if os.path.isdir(os.path.join(table_dir, _COMMITS)):
            raise IOError(
                f"{table_dir!r} carries remote-protocol _commits "
                "markers but no _LATEST pointer — it was committed "
                "via a scheme'd path (e.g. file://). Address it WITH "
                "the scheme; proceeding would restart at v1 and "
                "destroy committed versions."
            ) from None
        return None
    try:
        return int(text)
    except ValueError:
        raise IOError(
            f"corrupt {_POINTER} pointer in {table_dir!r}: {text!r}. "
            "Restore it to the highest complete version directory's "
            "number before committing again."
        ) from None


def version_dir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir.rstrip("/"), f"v{version:05d}")


def commit_version(df: DataFrame, table_dir: str) -> int:
    """Write `df` as the next version and atomically publish it.

    The data write happens entirely in an unpublished directory; the
    commit is one `os.replace` of the pointer file (local) or one
    create-if-absent of an empty `_commits/cNNNNNNNN` marker (remote —
    no rename, no content, object-store-atomic). A crash before the
    publish leaves the previous version live (the orphan directory is
    ignored by readers and overwritten by the next attempt)."""
    if _is_remote(table_dir):
        fs, hp = _remote_fs(table_dir)
        next_v = (current_version(table_dir) or 0) + 1
        target = version_dir(table_dir, next_v)
        marker = f"{table_dir.rstrip('/')}/{_COMMITS}/c{next_v:08d}"
        # re-probe the marker BEFORE touching the target dir: a writer
        # working from a stale version read would otherwise delete the
        # RACE WINNER'S committed data as a "crashed orphan" and only
        # then die on the marker create — fail first, touch nothing
        if fs.exists(hp(marker)):
            raise IOError(
                f"commit marker {marker!r} already exists — a "
                "concurrent writer committed this version first (the "
                "table is single-writer); re-read and retry"
            )
        if fs.exists(hp(target)):  # orphan from a crashed attempt
            fs.delete(hp(target), True)
        df.write.mode("overwrite").parquet(target)
        try:
            # create-if-absent: a writer racing this version number
            # dies HERE instead of silently replacing the other
            # commit's data dir. Atomic on HDFS/local; on S3A the
            # create is check-then-put, so the guard (like the
            # pre-write probe above) is best-effort — the protocol's
            # correctness rests on the documented single-writer
            # contract, the guards just make most violations loud.
            fs.create(hp(marker), False).close()
        except Exception as exc:
            if fs.exists(hp(marker)):
                raise IOError(
                    f"commit marker {marker!r} already exists — a "
                    "concurrent writer committed this version first "
                    "(the table is single-writer); re-read and retry"
                ) from exc
            raise  # a real storage fault, not a race — don't relabel
        return next_v
    os.makedirs(table_dir, exist_ok=True)
    next_v = (current_version(table_dir) or 0) + 1
    target = version_dir(table_dir, next_v)
    shutil.rmtree(target, ignore_errors=True)  # orphan from a crashed attempt
    df.write.mode("overwrite").parquet(target)
    tmp_pointer = _pointer_path(table_dir) + ".tmp"
    with open(tmp_pointer, "w") as fh:
        fh.write(str(next_v))
        # fsync BEFORE the rename: os.replace journals the rename
        # metadata independently of the data pages, so a power loss
        # could otherwise publish a zero-length pointer (the classic
        # ext4 empty-file-after-crash pattern) — which current_version
        # would now refuse loudly, but durability is better than a
        # good error message
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp_pointer, _pointer_path(table_dir))
    dir_fd = os.open(table_dir, os.O_RDONLY)
    try:  # make the rename itself durable
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)
    return next_v


def read_latest(spark: SparkSession, table_dir: str) -> DataFrame:
    """Scan the current committed snapshot (raises like an ordinary
    missing-path read if nothing was ever committed)."""
    v = current_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir!r}")
    return spark.read.parquet(version_dir(table_dir, v))


def read_version(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Time travel: scan a specific committed version (versions are
    immutable until vacuumed)."""
    return spark.read.parquet(version_dir(table_dir, version))


def vacuum(table_dir: str, keep: int = 2) -> list[int]:
    """Delete all but the newest `keep` COMMITTED versions; returns the
    dropped version numbers. Never touches the live version.

    Deletions RAISE on failure (a version reported dropped is
    verifiably gone — forget_keys_hard's "rows exist nowhere on disk"
    contract rests on this; a swallowed rmtree error would report
    erasure that did not happen). Local: directories numbered ABOVE
    the live pointer are a crashed commit's unpublished staging data,
    not committed versions: they are excluded from the keep-window
    math (counting them would retire one real snapshot early) and
    deleted outright — the single-writer contract means no concurrent
    commit can own them. Remote: the same orphans are the version
    dirs carrying NO commit marker (a retired version whose marker
    vacuumed but whose dir-delete crashed also lands here and is
    finished off); retirement deletes the marker FIRST, then the dir,
    so a mid-vacuum crash can only demote a version to orphan, never
    leave a marker naming missing data as the live version."""
    if _is_remote(table_dir):
        fs, hp = _remote_fs(table_dir)
        committed = _remote_versions(table_dir)
        if not committed:
            return []
        live = committed[-1]
        root = table_dir.rstrip("/")

        def _rm(path: str, what: str) -> None:
            pp = hp(path)
            if fs.exists(pp):
                fs.delete(pp, True)
                if fs.exists(pp):
                    raise IOError(f"vacuum could not delete {what} {path!r}")

        found = []
        for st in fs.listStatus(hp(root)):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                found.append(int(name[1:]))
        dropped = []
        for v in sorted(found):
            if v not in committed:  # crashed-commit orphan (no marker)
                _rm(version_dir(table_dir, v), "orphan version dir")
                dropped.append(v)
        retire = committed[:-keep] if keep > 0 else committed
        for v in retire:
            if v == live:
                continue
            _rm(f"{root}/{_COMMITS}/c{v:08d}", "commit marker")
            _rm(version_dir(table_dir, v), "version dir")
            dropped.append(v)
        return dropped
    live = current_version(table_dir)
    if live is None:
        return []
    found = sorted(
        int(d[1:])
        for d in os.listdir(table_dir)
        if d.startswith("v") and d[1:].isdigit()
    )
    versions = [v for v in found if v <= live]
    dropped = []
    for v in found:
        if v > live:  # crashed-commit staging orphan
            shutil.rmtree(version_dir(table_dir, v))
            dropped.append(v)
    for v in versions[:-keep] if keep > 0 else versions:
        if v == live:
            continue
        shutil.rmtree(version_dir(table_dir, v))
        dropped.append(v)
    return dropped


def _align_schemas(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Widen both frames to the union of their columns (missing side
    gets typed NULLs) — additive schema evolution. A column present on
    both sides with DIFFERENT types is a contract violation, not
    evolution: raise rather than silently cast."""
    from pyspark.sql import functions as F

    ta = {f.name: f.dataType for f in a.schema.fields}
    tb = {f.name: f.dataType for f in b.schema.fields}
    clash = {c for c in ta.keys() & tb.keys() if ta[c] != tb[c]}
    if clash:
        raise ValueError(
            f"schema evolution cannot retype columns {sorted(clash)}; "
            "migrate explicitly (read, cast, commit)"
        )
    order = list(ta) + [c for c in tb if c not in ta]
    # Spark resolves column names case-insensitively by default, so a
    # live 'ID' next to a delta 'id' is the SAME retype hazard the
    # exact-match check above guards — and letting both through would
    # commit a table default-config readers cannot select from
    # unambiguously. Case-colliding names are a contract violation.
    ci: dict[str, set[str]] = {}
    for c in order:
        ci.setdefault(c.lower(), set()).add(c)
    case_clash = sorted(c for group in ci.values() if len(group) > 1 for c in group)
    if case_clash:
        raise ValueError(
            f"schema evolution found case-colliding columns {case_clash}; "
            "Spark resolves names case-insensitively — rename explicitly"
        )
    wa = a.select(
        *[F.col(c) if c in ta else F.lit(None).cast(tb[c]).alias(c) for c in order]
    )
    wb = b.select(
        *[F.col(c) if c in tb else F.lit(None).cast(ta[c]).alias(c) for c in order]
    )
    return wa, wb


def merge_commit(
    spark: SparkSession,
    table_dir: str,
    delta: DataFrame,
    keys: list[str],
    insert_only: bool = False,
    evolve_schema: bool = False,
) -> int:
    """Keyed MERGE of a delta into the versioned table, committed as a
    new snapshot: read the live version, merge (new-wins, or
    insert-if-absent when `insert_only`), commit. The read and the
    write touch DIFFERENT directories, so the overwrite-what-you-read
    hazard cannot occur by construction.

    ``evolve_schema=True`` permits ADDITIVE evolution: a delta
    carrying new columns widens the table (pre-existing rows read
    NULL there), a delta missing columns leaves them NULL on its own
    rows — while retyping an existing column still raises (silent
    casts corrupt history). Default stays strict: mismatched schemas
    fail loudly, the right behavior for a production feed."""
    from ..operators.merge import insert_if_absent, merge_replace

    if current_version(table_dir) is None:
        merged = delta
    else:
        live = read_latest(spark, table_dir)
        if evolve_schema:
            live, delta = _align_schemas(live, delta)
        merged = (
            insert_if_absent(live, delta, keys)
            if insert_only
            else merge_replace(live, delta, keys)
        )
    return commit_version(merged, table_dir)


def snapshot_diff(
    spark: SparkSession,
    table_dir: str,
    v_old: int,
    v_new: int,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC between two committed snapshots of a versioned table: one
    row per key inserted / deleted / updated between `v_old` and
    `v_new`, with both images (operators.scd.table_diff — ONE
    full-outer hash join, output bounded by the churn).

    This is what incremental consumers poll instead of re-reading the
    table: downstream rollup refresh, SCD2 history capture, reverse
    ETL. Both versions are immutable directories, so the diff is
    reproducible forever (until vacuum retires a side)."""
    from ..operators.scd import table_diff

    return table_diff(
        read_version(spark, table_dir, v_old),
        read_version(spark, table_dir, v_new),
        keys,
        compare_cols,
    )


def delete_commit(
    spark: SparkSession,
    table_dir: str,
    doomed: DataFrame,
    keys: list[str],
) -> int:
    """Row-level delete (the GDPR/right-to-be-forgotten primitive),
    committed as a new snapshot: the live version anti-joins the
    doomed key set and the survivor frame becomes version N+1 — the
    old snapshot stays immutable until `vacuum` retires it, so the
    deletion is crash-safe, time-travel-auditable, and atomic for
    readers (pointer flip).

    Downstream propagation needs no special machinery: the deleted
    keys surface as 'delete' rows in `snapshot_diff(N, N+1)`, which
    `rollup_apply_cdc` and SCD2 capture already fold exactly.

    `doomed` carries just the key columns (extra columns are ignored);
    at scale the anti-join is one hash shuffle on the keys, or a
    broadcast when the doomed set is small — Catalyst's choice."""
    v = current_version(table_dir)
    if v is None:
        raise ValueError(f"no committed version under {table_dir}")
    live = read_latest(spark, table_dir)
    survivors = live.join(
        doomed.select(*keys).distinct(), keys, "left_anti"
    )
    return commit_version(survivors, table_dir)
