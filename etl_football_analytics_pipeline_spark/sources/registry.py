"""Typed table registry + parquet IO layer.

The reference reads every stage input as schema-inferred CSV
(`scr/Transform.py:74-77` et al., reference S1/S2). Inference is a
per-run full-file parse and a correctness hazard at scale, so this
engine declares explicit schemas per table and reads columnar parquet:
the vectorized reader + filter/column pushdown make the scan the
cheapest operator in the plan instead of the most expensive one.

Schemas mirror the driver's synthetic TPC-H-ish layout (TESTDATA.md).
`load_table` validates the on-disk schema against the contract instead
of trusting inference — the Spark-idiomatic version of the reference's
defensive column resolution (`scr/Transform.py:25-66`).
"""

from __future__ import annotations

import hashlib
import shutil
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schema contracts. Nullability in Spark is advisory on read,
# so we assert names/types only.
TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def _parquet_ts_unit(path: str, col: str) -> str | None:
    """Probe the parquet footer for `col`'s timestamp unit ('ns', 'us',
    'ms', 's') or None if the column isn't a timestamp. Footer-only
    read (pyarrow), no data scan; handles a single file or a directory
    of part files (first part wins — one writer, one schema)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not parts:
            return None
        path = parts[0]
    schema = pq.read_schema(path)
    field = schema.field(col) if col in schema.names else None
    if field is None:
        return None
    t = field.type
    return getattr(t, "unit", None)


# Per-user cache root (uid in the name, created 0700, ownership
# verified before any reuse): on a multi-user host a world-shared
# fixed /tmp path would let another user pre-create the predictable
# keyed mirror and have load_table silently read foreign data.
_COMPACT_ROOT = os.path.join(
    tempfile.gettempdir(),
    f"spark-graft-compact-{getattr(os, 'getuid', lambda: 0)()}",
)
_COMPACT_MAX_BYTES = 1 << 30  # never bulk-copy beyond this; see docstring
_COMPACT_MIN_GROUPS = 4
# grace window before a superseded mirror state is evicted: a
# concurrent process that resolved the OLD mirror just before the
# source was rewritten may still be scanning it — deleting it mid-scan
# fails that job (ADVICE r7). The clock starts when a sweep first
# SEES the state superseded (a `.retired` stamp), not at build time;
# a later sweep past the window deletes. One stale mirror per source
# is the bounded cost (they never accumulate past the window).
_COMPACT_EVICT_GRACE_S = 6 * 3600
_COMPACT_MIN_ROWS = 4096


def scan_ready_path(path: str, parallelism: int) -> str:
    """Scan-layout compaction: return a path whose parquet layout can
    actually parallelize, building a compacted mirror once if needed.

    Parquet scan parallelism is row-group granular — a byte-range
    split only produces rows for row groups STARTING inside it. A
    single-file table written as ONE giant row group (the layout of
    small export jobs, and of this harness's testdata) therefore runs
    every scan, and the whole map side fused onto it, in one task no
    matter how small `maxPartitionBytes` is. That is the same
    small-files-inverse pathology Delta/Iceberg `OPTIMIZE` exists
    for; this is the read-side version, the one-time-build-then-reuse
    contract the engine's persisted ANN/minhash indexes already use.

    Behavior, bounded by construction:
    - NO-OP at scale: multi-file directories and files that already
      have >= 4 row groups return unchanged (cluster-scale inputs
      arrive well-chunked, so production reads never pay anything);
      so do tiny tables (< 4096 rows — a serial scan of those is
      cheaper than opening more files) and sources over 1 GiB (a
      mirror copy of a big table is an ingest job, not a read-path
      side effect; such a file with one row group should be fixed at
      its writer).
    - Mirror keyed by (absolute path, mtime, size) under the system
      tmp dir: source updates re-compact, concurrent builders race
      benignly (atomic `os.replace` of identical content).
    - Row groups sized to ~2x `parallelism` groups so byte-range
      splits each claim work; pyarrow round-trip preserves schema and
      timestamp units exactly (version='2.6' keeps nanos as nanos for
      the events-table legacy path).
    - Kill switch: SPARK_GRAFT_NO_COMPACT=1 reads sources verbatim.
    """
    import pyarrow.parquet as pq

    if os.environ.get("SPARK_GRAFT_NO_COMPACT"):
        return path
    if os.path.isdir(path):
        return path
    try:
        md = pq.ParquetFile(path).metadata
        size = os.path.getsize(path)
    except Exception:  # noqa: BLE001 — unreadable/absent: let Spark report it
        return path
    if (
        md.num_row_groups >= _COMPACT_MIN_GROUPS
        or md.num_rows < _COMPACT_MIN_ROWS
        or size > _COMPACT_MAX_BYTES
    ):
        return path
    uid = getattr(os, "getuid", lambda: 0)()
    # two-level key: per-SOURCE dir + per-(mtime,size) state subdir —
    # a rewritten source gets a fresh state key, and the build below
    # EVICTS the stale sibling states so daily-regenerated sources
    # don't strand an unbounded trail of dead mirrors in /tmp
    phash = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:16]
    skey = hashlib.md5(f"{os.path.getmtime(path)}:{size}".encode()).hexdigest()[:16]
    src_root = os.path.join(_COMPACT_ROOT, phash)
    out = os.path.join(src_root, skey, os.path.basename(path))
    if os.path.lexists(out):
        # trust the mirror only if this user owns the WHOLE chain and
        # nothing is a symlink: os.stat follows links, so a foreign
        # symlink planted under a predictable key would otherwise pass
        # the uid check by pointing at a file this user owns
        try:
            if (
                not os.path.islink(out)
                and os.stat(out).st_uid == uid
                and os.stat(_COMPACT_ROOT).st_uid == uid
            ):
                # a CURRENT state must carry no retirement stamp: a
                # racing stale builder may have stamped it as a
                # "sibling", and a source reverted to an old
                # (mtime,size) resumes its old state — either way a
                # pre-aged stamp would void the grace window at the
                # next supersession (review r8)
                try:
                    os.unlink(os.path.join(os.path.dirname(out), ".retired"))
                except OSError:
                    pass
                return out
        except OSError:
            pass
        return path
    # the mirror is an optimization, never a gate: any build failure
    # (tmp full/read-only, permission clash with another user's cache
    # dir, transient IO) falls back to reading the source verbatim
    try:
        os.makedirs(_COMPACT_ROOT, mode=0o700, exist_ok=True)
        # same ownership discipline as user_cache_dir: a pre-seeded
        # foreign root under the predictable name is never written
        # through (but here we degrade to verbatim reads, not an
        # error — the mirror is optional)
        if os.stat(_COMPACT_ROOT).st_uid != uid:
            return path
        os.makedirs(os.path.dirname(out), exist_ok=True)
        table = pq.read_table(path)
        rows_per_group = max(1024, table.num_rows // max(2 * parallelism, 1))
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out), suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(table, tmp, row_group_size=rows_per_group, version="2.6")
            os.replace(tmp, out)
            # fresh current state: drop any stamp a racing stale
            # builder left (see the reuse path above)
            try:
                os.unlink(os.path.join(os.path.dirname(out), ".retired"))
            except OSError:
                pass
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        # evict stale sibling states of THIS source (old mtime/size) —
        # but only past a grace window measured from SUPERSESSION, not
        # from build time (review r8: a mirror built 24 h ago would
        # otherwise be older than any grace the moment it is
        # superseded, deleting it out from under a concurrent scan —
        # the exact case the window exists for). First sweep stamps
        # the superseded state with `.retired`; deletion happens only
        # when a LATER sweep finds the stamp aged past the grace.
        now = time.time()
        for d in os.listdir(src_root):
            if d == skey:
                continue
            sib = os.path.join(src_root, d)
            stamp = os.path.join(sib, ".retired")
            try:
                if not os.path.exists(stamp):
                    open(stamp, "w").close()
                elif now - os.path.getmtime(stamp) > _COMPACT_EVICT_GRACE_S:
                    shutil.rmtree(sib, ignore_errors=True)
            except OSError:
                pass
    except Exception:  # noqa: BLE001 — degraded layout beats a failed read
        return path
    return out


# Schema memo for repeat parquet reads (r12, guide §1/§6): Spark's
# schema inference re-reads footers through the Hadoop FS layer on
# EVERY DataFrameReader.parquet() call (~0.1 s per call on this host,
# paid dozens of times per bench pass since every query re-loads its
# tables). The memo caches ONLY the inferred StructType — metadata,
# never data or results — keyed by (abs path, mtime_ns, size), the
# same invalidation discipline as the engine's build-once mirrors: a
# rewritten file gets a new key. Reads with an explicit schema skip
# the footer pass entirely and produce the identical DataFrame.
_SCHEMA_MEMO: dict[tuple[str, int, int], T.StructType] = {}
# analyzed base-table scans, keyed (applicationId, abs path, mtime_ns,
# size, table name) — see the r12 note in load_table
_TABLE_MEMO: dict[tuple, DataFrame] = {}


def parquet_col_bounds(path: str, col: str) -> tuple[int, int] | None:
    """Exact (min, max) of an integer column from parquet FOOTER
    statistics — the same metadata predicate pushdown trusts for
    row-group pruning, read driver-side with no data scan and no Spark
    job (guide §6). Returns None whenever the stats are unusable (any
    missing row-group stat, nulls present, non-file path, unreadable
    footer) so callers fall back to the exact aggregate. Used where a
    plan needs value BOUNDS (not data): e.g. pack_sequences' fixed-
    width id bucketing, whose output is provably identical for any
    bucketing that covers the id range."""
    import pyarrow.parquet as pq

    if not os.path.isfile(path):
        return None
    try:
        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}.get(col)
        if idx is None or md.num_rows == 0:
            return None
        mn = mx = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max or (st.null_count or 0) > 0:
                return None
            if not isinstance(st.min, int) or isinstance(st.min, bool):
                return None
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        return None if mn is None else (mn, mx)
    except Exception:  # noqa: BLE001 — stats are an optimization only
        return None


def read_parquet_memo(spark: SparkSession, path: str) -> DataFrame:
    """`spark.read.parquet(path)` with the per-(path, mtime, size)
    schema memo above. Falls back to plain inference whenever the path
    cannot be stat'ed (remote schemes) or on any schema-apply error."""
    try:
        st = os.stat(path)
        key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    except OSError:
        return spark.read.parquet(path)
    sch = _SCHEMA_MEMO.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one registry table; raises if the table name is unknown.

    Schema comes from parquet metadata (no inference pass); the
    registry contract documents what downstream plans may rely on.

    The events table's `ts` physical type has drifted across driver
    versions (TIMESTAMP(NANOS) historically, plain timestamp[us]
    today), so the footer is probed and only the nanos case takes the
    legacy path: read nanos as long (runtime-settable legacy conf) and
    convert to microsecond timestamps with integer division —
    `div 1000` truncates exactly like DuckDB's ns→µs conversion, and
    stays in long (a double division would lose precision above 2^53
    ns). Microsecond files read natively (Spark 4 infers
    TIMESTAMP_NTZ for UTC-unadjusted parquet timestamps) and are then
    normalized to TIMESTAMP — value-preserving under the engine's UTC
    session timezone, identical to DuckDB's naive reading of the same
    file, and required by Structured Streaming (`withWatermark`
    rejects TIMESTAMP_NTZ event-time columns). Every events consumer
    therefore sees one canonical `ts: timestamp` regardless of the
    physical file type.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; registry has {sorted(TABLES)}")
    # r12 (guide §7.3 — driver-side planning overhead): memoize the
    # analyzed SCAN per (app, source file identity). Every registered
    # query re-reads its base tables through here, and each fresh
    # spark.read costs ~30-60 ms of py4j + analysis plus a pyarrow
    # footer probe in scan_ready_path — ~100+ calls per bench pass.
    # Only METADATA (the DataFrame plan) is memoized; execution still
    # scans parquet on every action. Keyed like manifest._TREE_MEMO:
    # applicationId (a stopped session's plans never resurrect) and
    # the source's (path, mtime_ns, size) — a rewritten file is a new
    # key, so staleness is structurally impossible.
    src = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(src)
        memo_key = (
            spark.sparkContext.applicationId,
            os.path.abspath(src), st.st_mtime_ns, st.st_size, name,
        )
    except OSError:
        memo_key = None
    if memo_key is not None:
        hit = _TABLE_MEMO.get(memo_key)
        if hit is not None:
            return hit
    path = scan_ready_path(
        src, spark.sparkContext.defaultParallelism
    )
    if name == "events" and _parquet_ts_unit(path, "ts") == "ns":
        # The conf must STAY set: SQL confs are re-read per task at
        # action time, so restoring it before the (lazy) scan executes
        # would fail the read. Scoping the set to the genuinely-nanos
        # case is what keeps the common path conf-clean.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = read_parquet_memo(spark, path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if memo_key is not None:
            _TABLE_MEMO[memo_key] = df
        return df
    df = read_parquet_memo(spark, path)
    if name == "events" and isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if memo_key is not None:
        _TABLE_MEMO[memo_key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views so plans can use `spark.sql`,
    mirroring the reference's SQL query surface (`scr/ui.py:44-314`,
    reference S9)."""
    for n in names or tuple(TABLES):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def user_cache_dir(kind: str, tag: str) -> str:
    """Per-user cache location `/tmp/spark-graft-<kind>-<uid>/<tag>`
    for build-once artifacts (bucketed/partitioned mirrors, persisted
    ANN indexes). The root is created 0700 and verified OWNED by this
    user — on a multi-user host a predictable world-writable /tmp key
    could otherwise be pre-seeded by someone else and silently read
    back (the same hazard scan_ready_path defends against). A foreign-
    owned root raises instead of degrading to silent foreign reads."""
    uid = getattr(os, "getuid", lambda: 0)()
    root = os.path.join(tempfile.gettempdir(), f"spark-graft-{kind}-{uid}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    if os.stat(root).st_uid != uid:
        raise RuntimeError(
            f"cache root {root} exists but is not owned by uid {uid}; "
            "refusing to read or write through a foreign-owned directory"
        )
    return os.path.join(root, tag)


def owned_ready(path: str, *markers: str) -> bool:
    """True iff every `path/<marker>` exists AND `path` is owned by
    this user — the reuse gate for build-once artifacts (existence
    alone would trust whoever created the predictable key first).

    Manifest-aware (r8): a relation committed through
    `manifest.manifest_commit` keeps its data (and `_SUCCESS`) inside
    the live `_trees/` tree, not at the root — the markers are checked
    THERE. Without this, every index-backed registered query saw its
    replace_dir-built cache as "not ready" and silently rebuilt the
    index on every call (measured 2-3× on the minhash/BM25/IVF
    suites)."""
    try:
        if os.stat(path).st_uid != getattr(os, "getuid", lambda: 0)():
            return False
    except OSError:
        return False
    root = _local_manifest_tree(path) or path
    return all(os.path.exists(os.path.join(root, m)) for m in (markers or ("_SUCCESS",)))


def _local_manifest_tree(path: str) -> str | None:
    """The live manifest tree of a LOCAL relation dir, or None for the
    plain layout — the os-level twin of `manifest.resolved_dir` for
    gates that run before any SparkSession exists."""
    from ..manifest import _MARKER_RE, SETTLE_WAITS

    for wait in SETTLE_WAITS:
        try:
            names = os.listdir(os.path.join(path, "_manifests"))
        except OSError:
            return None
        by_version: dict[int, list[str]] = {}
        for nm in names:
            m = _MARKER_RE.match(nm)
            if m:
                by_version.setdefault(int(m.group(1)), []).append(m.group(2))
        if not by_version:
            return None
        top = max(by_version)
        if len(by_version[top]) == 1:
            return os.path.join(
                path, "_trees", f"v{top:08d}-{by_version[top][0]}"
            )
        # duplicate top markers: TRANSIENT during a commit race (the
        # r9 create-then-verify loser withdraws within milliseconds —
        # mirror current_manifest's brief re-list so a healthy cache
        # is not misread as unready, silently triggering a full index
        # rebuild), PERSISTENT only when a racer crashed mid-window —
        # then return None so the caller falls through to the
        # Spark-resolution path, which raises loudly (ADVICE r8).
        if wait is not None:
            import time

            time.sleep(wait)
    return None
