"""Shared model-checking fakes for the commit-protocol tests
(test_manifest_model.py, test_versioned_model.py): a seeded
cooperative scheduler and a fake in-memory Hadoop-FileSystem whose
every operation is a yield point.

The fake FS is deliberately minimal but faithful to the subset of the
Hadoop FileSystem API the protocols use: linearizable namespace,
listing with modification times, recursive delete, getFileStatus. Its
`create(path, overwrite=False)` has TWO fidelities, selected per test
(r11, VERDICT r10 #3):

- ``lww_create=False`` (default) — raising on existence: a TRUE atomic
  create-if-absent (local O_EXCL, an HDFS namespace create);
- ``lww_create=True`` — LAST-WRITER-WINS: the create always succeeds,
  silently replacing any existing object — a bare S3 PUT. The
  two-phase-only commit mode claims it never relies on create
  exclusivity (token-named markers); the LWW sweeps verify that claim
  instead of assuming it.

It also models the Hadoop 3.4+ createFile BUILDER (r11, VERDICT r10
#2): ``hasPathCapability`` advertises conditional-create when
``conditional=True``, and the builder enforces server-side
create-if-absent ONLY when the caller set the conditional option to
True via ``.must()`` — with ``ignore_must=True`` modeling a store that
recognizes the key but ignores the value (the silent check-then-put
downgrade the ADVICE r10 item warned about). A ``.must()`` key the
store does not understand raises at ``build()`` — the real ``must``
contract, and the reason the protocol uses must() rather than opt().

Fake mtimes are a monotonic counter — strictly coarser identity than
the real 30 s steal window guarantees, so a model pass here is
conservative.
"""

from __future__ import annotations

import random
import threading

from etl_football_analytics_pipeline_spark.manifest import (
    _CONDITIONAL_CREATE_OPTION,
)


class _Handle:
    def close(self) -> None:
        pass


class FakePath:
    def __init__(self, path: str):
        self.path = path.rstrip("/")

    def getName(self) -> str:
        return self.path.rsplit("/", 1)[-1]


class _FakeStatus:
    def __init__(self, path: str, mtime: int, is_dir: bool):
        self._path, self._mtime, self._dir = path, mtime, is_dir

    def getPath(self) -> FakePath:
        return FakePath(self._path)

    def getModificationTime(self) -> int:
        return self._mtime

    def isDirectory(self) -> bool:
        return self._dir


class Sched:
    """Seeded cooperative scheduler: registered threads block at every
    yield point until the driver grants them exactly one step. A
    thread the driver never picks is 'paused' arbitrarily long — every
    pause the real protocol can experience is reachable. ``steps`` is
    the model's VIRTUAL CLOCK: the protocol's steal windows are
    measured in granted scheduler steps (``time.monotonic`` is patched
    to read it), so 'paused past the steal window' means literally
    'starved by the scheduler for that many steps' — no wall-clock
    coupling."""

    def __init__(self, seed: int):
        self.rng = random.Random(seed)
        self.cv = threading.Condition()
        self.ready: dict[int, bool] = {}
        self.go: dict[int, bool] = {}
        self.steps = 0
        self.abort = False

    def register(self) -> None:
        tid = threading.get_ident()
        with self.cv:
            self.ready[tid] = False
            self.go[tid] = False
            self.cv.notify_all()

    def finish(self) -> None:
        tid = threading.get_ident()
        with self.cv:
            self.ready.pop(tid, None)
            self.go.pop(tid, None)
            self.cv.notify_all()

    def yield_point(self) -> None:
        tid = threading.get_ident()
        if tid not in self.ready:
            return  # main thread (seeding / assertions) runs freely
        with self.cv:
            if self.abort:
                return  # failure path: let workers drain freely
            self.ready[tid] = True
            self.cv.notify_all()
            while not self.go.get(tid, True) and not self.abort:
                self.cv.wait()
            if tid in self.go:
                self.go[tid] = False
                self.ready[tid] = False
                self.cv.notify_all()  # tell the driver we consumed it

    def drive(
        self,
        threads: list[threading.Thread],
        cap: int = 50_000,
        burst_max: int = 100,
    ):
        """BURSTY scheduling: grant one thread a run of 1–burst_max
        steps, then re-choose. This mirrors how real writers interleave
        (full speed, then a long pause — GC, throttling) and is what
        makes the steal-window models LIVE: under strict per-op
        alternation every publish span exceeds any steal window that
        starvation can also reach, so rivals steal each other's live
        claims forever — a configuration the real protocol excludes by
        sizing the steal window far above a healthy publish duration.
        Bursts keep that sizing meaningful while still starving the
        un-chosen thread past the window whenever the rng deals
        consecutive bursts to one side. Size ``burst_max`` to the
        protocol under test: meaningfully SMALLER than one commit's op
        count, or most schedules degenerate to serial executions (the
        versioned model uses short bursts for exactly this reason —
        its whole commit is ~14 ops)."""
        try:
            with self.cv:
                burst_tid, burst_left = None, 0
                while any(t.is_alive() for t in threads):
                    waiting = sorted(
                        t for t, r in self.ready.items() if r
                    )
                    if not waiting:
                        self.cv.wait(timeout=0.05)
                        continue
                    if burst_tid not in waiting or burst_left <= 0:
                        burst_tid = self.rng.choice(waiting)
                        burst_left = self.rng.randint(1, burst_max)
                    self.go[burst_tid] = True
                    self.cv.notify_all()
                    # one step = one CONSUMED grant: without this wait
                    # the driver re-grants the same blocked thread in a
                    # tight loop, inflating the virtual clock ~burst×
                    # and collapsing the steal window below one real op
                    while self.go.get(burst_tid, False) and not self.abort:
                        self.cv.wait(timeout=0.05)
                        if not any(t.is_alive() for t in threads):
                            break
                    self.steps += 1
                    burst_left -= 1
                    assert self.steps < cap, (
                        "scheduler step cap exceeded (livelock?)"
                    )
        except BaseException:
            with self.cv:
                self.abort = True  # release every blocked worker
                self.cv.notify_all()
            raise


class FakeCreateBuilder:
    """The FSDataOutputStreamBuilder subset `_exclusive_create`'s
    conditional path uses. Semantics modeled after Hadoop 3.4.1 S3A
    conditional writes (HADOOP-19256): with the conditional-overwrite
    option set TRUE and honored, build() performs a server-enforced
    create-if-absent (If-None-Match PUT) REGARDLESS of the overwrite
    flag; otherwise build() degrades to the plain create semantics —
    which on an lww store is a blind PUT. An unrecognized ``.must()``
    key raises at build() (the must-vs-opt contract)."""

    def __init__(self, fs: "FakeFS", p: FakePath):
        self.fs, self.p = fs, p
        self.overwrite_flag: bool | None = None
        self.musts: dict[str, object] = {}
        self.opts: dict[str, object] = {}

    def overwrite(self, flag: bool) -> "FakeCreateBuilder":
        self.overwrite_flag = bool(flag)
        return self

    def must(self, key: str, val) -> "FakeCreateBuilder":
        self.musts[key] = val
        return self

    def opt(self, key: str, val) -> "FakeCreateBuilder":
        self.opts[key] = val
        return self

    def build(self) -> _Handle:
        fs = self.fs
        fs.builder_calls.append(
            (self.p.path, self.overwrite_flag, dict(self.musts))
        )
        unknown = set(self.musts) - fs.must_keys_understood
        if unknown:
            raise IOError(
                f"unsupported mandatory options {sorted(unknown)}"
            )
        honored = (
            not fs.ignore_must
            and self.musts.get(_CONDITIONAL_CREATE_OPTION) is True
        )
        fs.sched.yield_point()
        fs._op()
        with fs.lock:
            if honored:
                if self.p.path in fs.files:
                    raise IOError(
                        f"already exists (conditional): {self.p.path}"
                    )
            elif (
                not self.overwrite_flag
                and not fs.lww_create
                and self.p.path in fs.files
            ):
                raise IOError(f"already exists: {self.p.path}")
            fs._add_parents(self.p.path)
            fs.files[self.p.path] = fs._tick()
            return _Handle()


class InjectedCrash(Exception):
    """A modeled PROCESS DEATH: once a thread's op budget is
    exhausted, every FS operation it attempts raises this — including
    the cleanup in its ``finally`` blocks, which is exactly what dying
    mid-protocol means (a real crash never runs cleanup; in-process we
    model that as cleanup that fails too). Deliberately NOT an
    IOError: the protocols' narrow ``except IOError`` guards must not
    swallow a death."""


class FakeFS:
    """Linearizable in-memory namespace; every public op yields to the
    scheduler first, then executes atomically under one lock. See the
    module docstring for the `lww_create` / `conditional` /
    `ignore_must` fidelity switches. ``tables`` maps directory paths
    to opaque row payloads for the versioned-table model (written by
    the fake DataFrame writer, purged by recursive deletes).

    CRASH INJECTION (r11): ``crash_after(n)`` arms the CALLING thread
    to die on its (n+1)-th subsequent FS op — that op and every later
    one raise ``InjectedCrash``. ``op_count`` tallies per-thread ops
    so a counting run can measure a protocol's op span first;
    ``disarm()`` clears all budgets (the post-crash assertions run
    from the same thread)."""

    def __init__(
        self,
        sched: Sched,
        lww_create: bool = False,
        conditional: bool = False,
        ignore_must: bool = False,
    ):
        self.sched = sched
        self.lock = threading.Lock()
        self.files: dict[str, int] = {}
        self.dirs: dict[str, int] = {}
        self.tables: dict[str, frozenset] = {}
        self.clock = 0
        self.lww_create = lww_create
        self.ignore_must = ignore_must
        self.capabilities = (
            {_CONDITIONAL_CREATE_OPTION, "fs.capability.conditional.create"}
            if conditional
            else set()
        )
        # a store advertising the capability understands the option
        # key (it may still IGNORE the value — ignore_must); one that
        # does not advertise it rejects the mandatory key at build()
        self.must_keys_understood = (
            {_CONDITIONAL_CREATE_OPTION} if conditional else set()
        )
        self.builder_calls: list[tuple] = []
        self.capability_probes = 0
        self.crash_budget: dict[int, int] = {}
        self.op_count: dict[int, int] = {}

    # -- crash injection ----------------------------------------------
    def crash_after(self, n: int) -> None:
        self.crash_budget[threading.get_ident()] = n

    def disarm(self) -> None:
        self.crash_budget.clear()

    def _op(self) -> None:
        tid = threading.get_ident()
        self.op_count[tid] = self.op_count.get(tid, 0) + 1
        b = self.crash_budget.get(tid)
        if b is not None:
            if b <= 0:
                raise InjectedCrash("process died mid-protocol")
            self.crash_budget[tid] = b - 1

    # -- helpers -------------------------------------------------------
    def _tick(self) -> int:
        self.clock += 1
        return self.clock

    def _exists_locked(self, p: str) -> bool:
        if p in self.files or p in self.dirs:
            return True
        pre = p + "/"
        return any(k.startswith(pre) for k in self.files) or any(
            k.startswith(pre) for k in self.dirs
        )

    def _add_parents(self, p: str) -> None:
        parts = p.split("/")
        for i in range(2, len(parts)):
            d = "/".join(parts[:i])
            self.dirs.setdefault(d, self._tick())

    # -- the Hadoop FileSystem subset the protocols use ----------------
    def exists(self, p: FakePath) -> bool:
        self.sched.yield_point()
        self._op()
        with self.lock:
            return self._exists_locked(p.path)

    def listStatus(self, p: FakePath):
        self.sched.yield_point()
        self._op()
        with self.lock:
            pre = p.path + "/"
            out, seen = [], set()
            for k, mt in list(self.files.items()) + list(self.dirs.items()):
                if not k.startswith(pre):
                    continue
                child = k[len(pre):].split("/", 1)[0]
                if child in seen:
                    continue
                seen.add(child)
                full = pre + child
                is_dir = full in self.dirs or full not in self.files
                mtime = self.files.get(full, self.dirs.get(full, mt))
                out.append(_FakeStatus(full, mtime, is_dir))
            return out

    def create(self, p: FakePath, overwrite: bool) -> _Handle:
        self.sched.yield_point()
        self._op()
        with self.lock:
            if (
                not overwrite
                and not self.lww_create
                and p.path in self.files
            ):
                raise IOError(f"already exists: {p.path}")
            self._add_parents(p.path)
            self.files[p.path] = self._tick()
            return _Handle()

    def createFile(self, p: FakePath) -> FakeCreateBuilder:
        return FakeCreateBuilder(self, p)

    def hasPathCapability(self, p: FakePath, cap: str) -> bool:
        self.capability_probes += 1
        return cap in self.capabilities

    def delete(self, p: FakePath, recursive: bool) -> bool:
        self.sched.yield_point()
        self._op()
        with self.lock:
            hit = self.files.pop(p.path, None) is not None
            if p.path in self.dirs:
                del self.dirs[p.path]
                hit = True
            if p.path in self.tables:
                del self.tables[p.path]
            pre = p.path + "/"
            for k in [k for k in self.files if k.startswith(pre)]:
                del self.files[k]
                hit = True
            for k in [k for k in self.dirs if k.startswith(pre)]:
                del self.dirs[k]
                hit = True
            for k in [k for k in self.tables if k.startswith(pre)]:
                del self.tables[k]
            return hit

    def getFileStatus(self, p: FakePath) -> _FakeStatus:
        self.sched.yield_point()
        self._op()
        with self.lock:
            if p.path in self.files:
                return _FakeStatus(p.path, self.files[p.path], False)
            if p.path in self.dirs:
                return _FakeStatus(p.path, self.dirs[p.path], True)
            raise IOError(f"not found: {p.path}")

    def mkdirs(self, path: str) -> None:
        self.sched.yield_point()
        self._op()
        with self.lock:
            self._add_parents(path + "/x")
            self.dirs.setdefault(path, self._tick())
