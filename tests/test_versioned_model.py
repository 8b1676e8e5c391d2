"""Schedule-fuzzed MODEL test of the versioned-table commit protocol
(r11, VERDICT r10 #1).

test_manifest_model.py model-checks `manifest_commit`; this file does
the same for the versioned-table protocol in `sources/versioned.py` —
`commit_version(expected_base=)` pinned-base claims (the
create-then-verify intent BEFORE touching the fixed-name version dir),
the pre-write marker probe, and the `merge_commit` / `delete_commit`
rebase loops — which previously relied on threaded races exploring a
few interleavings per run. The protocol functions run UNMODIFIED
against the shared fake linearizable filesystem (tests/model_fs.py)
with every FS operation a scheduler yield point; only the data plane
is faked (a model DataFrame carrying a frozenset of (key, value) rows,
with `merge_replace` / `insert_if_absent` replaced by their set
semantics — the protocol under test never looks inside the rows). The
model runs with ``file_reuse=False``: the r11 copy-on-write stager is
pure data plane (same `_commit_staged` protocol, different write
callback) and is correctness-tested on real Spark in
tests/test_versioned.py.

Each sweep runs under BOTH store fidelities (VERDICT r10 #3):
exclusive creates (local/HDFS — create(overwrite=False) raises on
existence) and LAST-WRITER-WINS creates (a bare S3 PUT — create always
succeeds). Pinned writers claim token-named intents and detect rivals
by LISTING, never by create exclusivity, so the protocol's guarantees
must hold unchanged under LWW — this sweep verifies that claim instead
of assuming it.

Contracts pinned on every schedule:

- **serial history, no lost update** — every successful commit's
  snapshot equals its own operation applied to the PREVIOUS version's
  snapshot (so an interleaved rival's rows can never be silently
  dropped by a stale-base merge);
- **exactly-once versions** — commit markers are contiguous, one per
  success (plus the seed), each naming an existing version dir, with
  no orphan dirs from withdrawn writers;
- **loud failures only** — a writer either returns its version or
  raises `CommitConflict` (mutual withdraw / retries exhausted); its
  rows are then absent, never half-applied;
- **no protocol residue** — all intents released; a post-run quiesced
  `vacuum` retires history and leaves exactly the live version;
- **raced full-replace stays loud** — two pinned replaces on one base
  never BOTH land (at most one wins; mutual withdraw is allowed and
  loud), the lost-update case `commit_version` exists to prevent.
"""

from __future__ import annotations

import os
import threading
import types

import pytest

import etl_football_analytics_pipeline_spark.operators.merge as merge_mod
import etl_football_analytics_pipeline_spark.sources.versioned as V
from model_fs import FakeFS, FakePath, Sched

TBL = "model://tbl"


class _FakeDF:
    """Data-plane stand-in: a frozenset of (key, value) rows. Supports
    exactly the surface the protocol paths touch — `.write` (parquet
    into the fake FS), and the `select/distinct/join(left_anti)` chain
    `delete_commit` builds its survivor frame with."""

    def __init__(self, rows: frozenset, fs: FakeFS):
        self.rows, self.fs = frozenset(rows), fs

    @property
    def write(self) -> "_FakeWriter":
        return _FakeWriter(self)

    def select(self, *cols) -> "_FakeDF":
        return _FakeDF(frozenset((r[0],) for r in self.rows), self.fs)

    def distinct(self) -> "_FakeDF":
        return self

    def join(self, other: "_FakeDF", keys, how: str) -> "_FakeDF":
        assert how == "left_anti", how
        doomed = {r[0] for r in other.rows}
        return _FakeDF(
            frozenset(r for r in self.rows if r[0] not in doomed), self.fs
        )


class _FakeWriter:
    def __init__(self, df: _FakeDF):
        self.df = df

    def mode(self, m: str) -> "_FakeWriter":
        return self

    def parquet(self, target: str) -> None:
        # a real write is many FS ops over a long span — two yield
        # points (mkdirs, file create) let rivals interleave mid-write
        fs = self.df.fs
        fs.mkdirs(target)
        fs.create(FakePath(f"{target}/part-00000.parquet"), True)
        with fs.lock:
            fs.tables[target] = self.df.rows


def _fake_merge_replace(live: _FakeDF, delta: _FakeDF, keys) -> _FakeDF:
    d = {r[0]: r for r in live.rows}
    d.update({r[0]: r for r in delta.rows})  # delta wins
    return _FakeDF(frozenset(d.values()), live.fs)


def _fake_insert_if_absent(live: _FakeDF, delta: _FakeDF, keys) -> _FakeDF:
    d = {r[0]: r for r in delta.rows}
    d.update({r[0]: r for r in live.rows})  # live wins
    return _FakeDF(frozenset(d.values()), live.fs)


def _setup(monkeypatch, seed: int, lww: bool):
    sched = Sched(seed)
    fake = FakeFS(sched, lww_create=lww)
    monkeypatch.setattr(V, "_remote_fs", lambda td: (fake, FakePath))
    monkeypatch.setattr(V, "_conflict_backoff", lambda *a, **k: None)
    monkeypatch.setattr(merge_mod, "merge_replace", _fake_merge_replace)
    monkeypatch.setattr(merge_mod, "insert_if_absent", _fake_insert_if_absent)

    def _read(path: str) -> _FakeDF:
        sched.yield_point()
        with fake.lock:
            if path not in fake.tables:
                raise KeyError(f"read of missing version dir: {path}")
            return _FakeDF(fake.tables[path], fake)

    spark_stub = types.SimpleNamespace(
        read=types.SimpleNamespace(parquet=_read)
    )
    # seed v1 from the (unscheduled) main thread
    V.commit_version(_FakeDF(frozenset({("seed", 0)}), fake), TBL)
    assert V.current_version(TBL) == 1
    return sched, fake, spark_stub


def _scan(fake: FakeFS):
    markers, intents = [], []
    for p in fake.files:
        name = p.rsplit("/", 1)[-1]
        if f"/{V._COMMITS}/" in p:
            if V._COMMIT_RE.match(name):
                markers.append(int(name[1:]))
            elif ".__intent." in name:
                intents.append(name)
    pre = TBL + "/"
    vdirs = {
        d[len(pre):]
        for d in fake.dirs
        if d.startswith(pre)
        and "/" not in d[len(pre):]
        and d[len(pre):].startswith("v")
        and d[len(pre):][1:].isdigit()
    }
    return sorted(markers), intents, vdirs


def _assert_invariants(seed, fake, results, errors, ops):
    """The shared post-run contract (see module docstring): loud-only
    failures, contiguous exactly-once versions, zero residue, and the
    serial-history / no-lost-update check — each success's snapshot
    equals its own op applied to the previous snapshot."""
    unexpected = [e for e in errors if not isinstance(e, V.CommitConflict)]
    assert not unexpected, (seed, unexpected)
    markers, intents, vdirs = _scan(fake)
    assert intents == [], (seed, intents)  # claims always released
    assert markers == list(range(1, len(markers) + 1)), (seed, markers)
    assert len(markers) == 1 + len(results), (seed, markers, results)
    assert vdirs == {f"v{v:05d}" for v in markers}, (seed, vdirs, markers)
    # distinct serial versions, one per success
    assert sorted(results.values()) == sorted(set(results.values())), (
        seed, results,
    )
    assert set(results.values()) == set(range(2, 2 + len(results))), (
        seed, results,
    )
    # SERIAL HISTORY / NO LOST UPDATE: every success's snapshot is its
    # own op applied to the immediately-previous snapshot — a merge
    # committed against a stale base (dropping an interleaved rival's
    # rows) cannot satisfy this for BOTH writers
    for wid, v in results.items():
        prev = fake.tables[V.version_dir(TBL, v - 1)]
        got = fake.tables[V.version_dir(TBL, v)]
        assert got == ops[wid](prev), (seed, wid, v, prev, got)
    # failed writers' rows are fully absent from the live snapshot
    live = fake.tables[V.version_dir(TBL, markers[-1])]
    for wid in ops:
        if wid not in results:
            assert all(r[0] != f"w{wid}" for r in live), (seed, wid, live)
    # post-run quiesced vacuum: retires history, leaves only the live
    # version, still zero residue
    dropped = V.vacuum(TBL, keep=1)
    markers2, intents2, vdirs2 = _scan(fake)
    assert intents2 == [], (seed, intents2)
    assert markers2 == [markers[-1]], (seed, markers2, dropped)
    assert vdirs2 == {f"v{markers[-1]:05d}"}, (seed, vdirs2)
    assert fake.tables[V.version_dir(TBL, markers[-1])] == live


def _run_merge_schedule(monkeypatch, seed: int, lww: bool, n_writers: int):
    sched, fake, spark_stub = _setup(monkeypatch, seed, lww)
    results: dict[int, int] = {}
    errors: list[BaseException] = []
    ops: dict[int, object] = {}

    def merge_op(wid):
        def apply(rows):
            d = {r[0]: r for r in rows}
            d[f"w{wid}"] = (f"w{wid}", wid)
            return frozenset(d.values())

        return apply

    def insert_absent_seed_op(rows):  # DO NOTHING on the present key
        return frozenset(rows) if any(r[0] == "seed" for r in rows) else (
            frozenset(rows) | {("seed", 999)}
        )

    def writer(wid: int):
        sched.register()
        try:
            if wid == 3:
                # writer 3 (three-writer sweeps): insert-if-absent on a
                # key the seed already owns — must commit a no-op
                # version, never clobber the seed row
                ops[wid] = insert_absent_seed_op
                results[wid] = V.merge_commit(
                    spark_stub, TBL,
                    _FakeDF(frozenset({("seed", 999)}), fake),
                    keys=["k"], insert_only=True,
                    retries=500, backoff_s=0.0, file_reuse=False,
                )
            else:
                ops[wid] = merge_op(wid)
                results[wid] = V.merge_commit(
                    spark_stub, TBL,
                    _FakeDF(frozenset({(f"w{wid}", wid)}), fake),
                    keys=["k"], retries=500, backoff_s=0.0,
                    file_reuse=False,
                )
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)
        finally:
            sched.finish()

    threads = [
        threading.Thread(target=writer, args=(i,))
        for i in range(1, n_writers + 1)
    ]
    # ops must be registered before assertions even for writers that
    # fail on their first FS op
    for i in range(1, n_writers + 1):
        if i == 3:
            ops[i] = insert_absent_seed_op
        else:
            ops[i] = merge_op(i)
    for t in threads:
        t.start()
    sched.drive(threads, burst_max=6)
    for t in threads:
        t.join()
    _assert_invariants(seed, fake, results, errors, ops)


def _run_merge_delete_schedule(monkeypatch, seed: int, lww: bool):
    """One merge-writer racing one delete-writer (the GDPR primitive):
    both must land serially with the delete's anti-join never silently
    resurrecting or dropping the merge's row."""
    sched, fake, spark_stub = _setup(monkeypatch, seed, lww)
    results: dict[int, int] = {}
    errors: list[BaseException] = []
    ops = {
        1: lambda rows: frozenset(
            {r for r in rows if r[0] != "w1"} | {("w1", 1)}
        ),
        2: lambda rows: frozenset(r for r in rows if r[0] != "seed"),
    }

    def merger():
        sched.register()
        try:
            results[1] = V.merge_commit(
                spark_stub, TBL, _FakeDF(frozenset({("w1", 1)}), fake),
                keys=["k"], retries=500, backoff_s=0.0, file_reuse=False,
            )
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)
        finally:
            sched.finish()

    def deleter():
        sched.register()
        try:
            results[2] = V.delete_commit(
                spark_stub, TBL, _FakeDF(frozenset({("seed", 0)}), fake),
                keys=["k"], retries=500, backoff_s=0.0, file_reuse=False,
            )
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)
        finally:
            sched.finish()

    threads = [
        threading.Thread(target=merger),
        threading.Thread(target=deleter),
    ]
    for t in threads:
        t.start()
    sched.drive(threads, burst_max=6)
    for t in threads:
        t.join()
    _assert_invariants(seed, fake, results, errors, ops)


def _run_replace_race_schedule(monkeypatch, seed: int, lww: bool):
    """Two pinned FULL REPLACES on the same base: the protocol's job is
    to make this loud, never last-writer-wins — at most ONE lands (the
    other raises CommitConflict); both withdrawing is allowed (and
    loud), this path is deliberately not retried."""
    sched, fake, spark_stub = _setup(monkeypatch, seed, lww)
    results: dict[int, int] = {}
    errors: list[BaseException] = []

    def writer(wid: int):
        sched.register()
        try:
            results[wid] = V.commit_version(
                _FakeDF(frozenset({(f"w{wid}", wid)}), fake),
                TBL, expected_base=1,
            )
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)
        finally:
            sched.finish()

    threads = [threading.Thread(target=writer, args=(i,)) for i in (1, 2)]
    for t in threads:
        t.start()
    sched.drive(threads, burst_max=6)
    for t in threads:
        t.join()

    unexpected = [e for e in errors if not isinstance(e, V.CommitConflict)]
    assert not unexpected, (seed, unexpected)
    markers, intents, vdirs = _scan(fake)
    assert intents == [], (seed, intents)
    # NEVER both: that is the silent lost-update commit_version's
    # pinned base exists to prevent
    assert len(results) <= 1, (seed, results)
    assert len(errors) == 2 - len(results), (seed, results, errors)
    if results:
        ((wid, v),) = results.items()
        assert v == 2 and markers == [1, 2], (seed, results, markers)
        assert fake.tables[V.version_dir(TBL, 2)] == frozenset(
            {(f"w{wid}", wid)}
        ), (seed, wid)
    else:  # mutual withdraw: base stays live, untouched
        assert markers == [1], (seed, markers)
        assert fake.tables[V.version_dir(TBL, 1)] == frozenset(
            {("seed", 0)}
        ), seed
    assert vdirs == {f"v{v:05d}" for v in markers}, (seed, vdirs)


@pytest.mark.parametrize("lww", [False, True],
                         ids=["exclusive-create", "lww-create"])
def test_versioned_protocol_invariants_over_fuzzed_schedules(
    monkeypatch, lww
):
    """The full sweep: 150 two-writer + 40 three-writer merge
    schedules, 60 merge-vs-delete schedules, and 40 pinned
    replace-race schedules per store fidelity (580 schedules total
    across both) — serial history, exactly-once versions, loud-only
    failures, zero residue on every one."""
    for seed in range(150):
        _run_merge_schedule(monkeypatch, seed, lww, n_writers=2)
    for seed in range(40):
        _run_merge_schedule(monkeypatch, 20_000 + seed, lww, n_writers=3)
    for seed in range(60):
        _run_merge_delete_schedule(monkeypatch, 30_000 + seed, lww)
    for seed in range(40):
        _run_replace_race_schedule(monkeypatch, 40_000 + seed, lww)


def test_version_dir_is_plain_join():
    # the model addresses version dirs as f"{TBL}/vNNNNN"; pin that
    # version_dir agrees so the fake reads/writes the same keys
    assert V.version_dir(TBL, 3) == os.path.join(TBL, "v00003")
