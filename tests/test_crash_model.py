"""Exhaustive CRASH-AT-EVERY-OPERATION model sweep of both commit
protocols (r11).

The fuzzed-schedule models (test_manifest_model / test_versioned_model)
explore pauses and steals; this file explores DEATH: a writer's
process dies at the k-th filesystem operation — modeled as that op and
every later one raising ``InjectedCrash``, so the writer's own
``finally`` cleanup fails too, exactly like a real process death — for
EVERY k in the protocol's op span. Threaded crash tests hit a few
random points; this enumerates all of them deterministically.

Pinned for every crash point, per protocol:

- **readers never see a torn state** — the live version resolves and
  is one of {pre-crash, fully-committed}; its content is exactly the
  seed's or exactly the merged result, never a mixture;
- **no duplicate finals** — a final marker's existence still means the
  commit is complete;
- **quiesced recovery is total** — ``manifest_vacuum`` /
  ``versioned.vacuum`` clear every piece of crash residue (intents,
  locks, orphan trees/dirs), and verified deletes mean the sweep also
  proves vacuum itself cannot be broken by any crash state;
- **the relation stays writable** — a fresh writer lands the next
  version after recovery, for every k;
- and for the manifest protocol, a CONCURRENT rival with retries
  survives writer A's death at every k (stealing A's stale claims
  after the virtual steal window) — liveness under crash.
"""

from __future__ import annotations

import threading
import types

import pytest

import etl_football_analytics_pipeline_spark.manifest as M
import etl_football_analytics_pipeline_spark.operators.merge as merge_mod
import etl_football_analytics_pipeline_spark.sources.versioned as V
from model_fs import FakeFS, FakePath, InjectedCrash, Sched
from test_versioned_model import (
    _FakeDF,
    _fake_insert_if_absent,
    _fake_merge_replace,
)

DEST = "model://rel"
TBL = "model://tbl"


# ---------------------------------------------------------------- manifest


def _manifest_env(monkeypatch, lww: bool = False):
    sched = Sched(0)
    fake = FakeFS(sched, lww_create=lww)
    spark_stub = types.SimpleNamespace(
        catalog=types.SimpleNamespace(refreshByPath=lambda p: None)
    )
    monkeypatch.setattr(M, "_fs", lambda spark, path: (fake, FakePath))
    monkeypatch.setattr(
        M, "_publish_lock_supported",
        lambda *a: None if lww else "create",
    )
    monkeypatch.setattr(M, "_conflict_backoff", lambda *a, **k: None)
    monkeypatch.setattr(M, "SETTLE_WAITS", (None,))
    import time as _t

    monkeypatch.setattr(_t, "monotonic", lambda: float(sched.steps))
    M.manifest_commit(spark_stub, DEST, lambda t: fake.mkdirs(t), keep=5)
    return sched, fake, spark_stub


def _manifest_scan(fake):
    finals, residue = {}, []
    for path in fake.files:
        name = path.rsplit("/", 1)[-1]
        if M._MARKER_RE.match(name):
            finals.setdefault(int(name[1:9]), []).append(name)
        elif name.endswith(".__intent") or name.endswith(".__lock"):
            residue.append(name)
    return finals, residue


def _manifest_op_span(monkeypatch, lww: bool = False) -> int:
    # the span depends on the fidelity (the publish lock adds ops on
    # exclusive-create stores) — measure with the same mode the sweep
    # will run
    sched, fake, spark_stub = _manifest_env(monkeypatch, lww)
    tid = threading.get_ident()
    before = fake.op_count.get(tid, 0)
    M.manifest_commit(spark_stub, DEST, lambda t: fake.mkdirs(t), keep=5)
    return fake.op_count[tid] - before


@pytest.mark.parametrize("lww", [False, True],
                         ids=["exclusive-create", "lww-create"])
def test_manifest_commit_crash_at_every_op(monkeypatch, lww):
    span = _manifest_op_span(monkeypatch, lww)
    monkeypatch.undo()
    assert span >= 8  # sanity: the sweep actually covers the protocol
    for k in range(span):
        monkeypatch.undo()
        sched, fake, spark_stub = _manifest_env(monkeypatch, lww)
        fake.crash_after(k)
        try:
            M.manifest_commit(
                spark_stub, DEST, lambda t: fake.mkdirs(t), keep=5
            )
            died = False
        except InjectedCrash:
            died = True
        except IOError as exc:
            # the post-final residue-release relabel: the commit IS
            # durable and says so
            assert "IS COMMITTED" in str(exc), (k, exc)
            died = True
        assert died, k  # the budget is inside the commit's span
        fake.disarm()
        # torn states unreachable: one final per version, live resolves
        finals, _residue = _manifest_scan(fake)
        assert all(len(v) == 1 for v in finals.values()), (k, finals)
        live = M.current_manifest(spark_stub, DEST)
        assert live is not None and live[0] in (1, 2), (k, live)
        # quiesced recovery clears ALL crash residue (verified deletes)
        M.manifest_vacuum(spark_stub, DEST, keep=5)
        finals2, residue2 = _manifest_scan(fake)
        assert residue2 == [], (k, residue2)
        tree_pre = DEST + "/_trees/"
        trees = {
            d[len(tree_pre):]
            for d in fake.dirs
            if d.startswith(tree_pre) and "/" not in d[len(tree_pre):]
        }
        want = {
            f"v{v:08d}-{names[0].split('.')[1]}"
            for v, names in finals2.items()
        }
        assert trees == want, (k, trees, want)
        # the relation stays writable after recovery
        top = max(finals2)
        got = M.manifest_commit(
            spark_stub, DEST, lambda t: fake.mkdirs(t), keep=5
        )
        assert got == top + 1, (k, got, top)


@pytest.mark.parametrize("lww", [False, True],
                         ids=["exclusive-create", "lww-create"])
def test_manifest_rival_survives_crash_at_every_op(monkeypatch, lww):
    """Writer A dies at op k while rival B (retries, small virtual
    steal window) runs concurrently: B must LAND on every k — A's
    stale intent/lock is stolen after the window, never fencing the
    relation forever. Both store fidelities: on LWW (bare S3) creates
    the publish lock is disabled (no exclusivity primitive), matching
    the real probe's decision there."""
    span = _manifest_op_span(monkeypatch, lww)
    monkeypatch.undo()
    for k in range(span):
        monkeypatch.undo()
        sched, fake, spark_stub = _manifest_env(monkeypatch, lww)
        results: dict[str, int] = {}
        errors: list[BaseException] = []

        def writer_a(k=k, fake=fake, sched=sched, spark_stub=spark_stub):
            sched.register()
            fake.crash_after(k)
            try:
                results["a"] = M.manifest_commit(
                    spark_stub, DEST, lambda t: fake.mkdirs(t),
                    keep=5, retries=100, backoff_s=0.0, steal_after_s=40.0,
                )
            except BaseException as exc:  # noqa: BLE001
                errors.append(exc)
            finally:
                sched.finish()

        def writer_b(fake=fake, sched=sched, spark_stub=spark_stub):
            sched.register()
            try:
                results["b"] = M.manifest_commit(
                    spark_stub, DEST, lambda t: fake.mkdirs(t),
                    keep=5, retries=500, backoff_s=0.0, steal_after_s=40.0,
                )
            except BaseException as exc:  # noqa: BLE001
                errors.append(exc)
            finally:
                sched.finish()

        threads = [
            threading.Thread(target=writer_a),
            threading.Thread(target=writer_b),
        ]
        for t in threads:
            t.start()
        sched.drive(threads, burst_max=10)
        for t in threads:
            t.join()
        fake.disarm()
        # A died (or relabeled loudly-committed); B LANDED regardless
        a_errors = [
            e for e in errors
            if isinstance(e, InjectedCrash) or "IS COMMITTED" in str(e)
        ]
        assert len(a_errors) + ("a" in results) >= 1, (k, errors)
        assert not [
            e for e in errors
            if not isinstance(e, InjectedCrash)
            and "IS COMMITTED" not in str(e)
        ], (k, errors)
        assert "b" in results, (k, errors)
        finals, _ = _manifest_scan(fake)
        assert all(len(v) == 1 for v in finals.values()), (k, finals)
        assert M.current_manifest(spark_stub, DEST) is not None
        # quiesced vacuum still restores a residue-free relation
        M.manifest_vacuum(spark_stub, DEST, keep=5)
        _, residue = _manifest_scan(fake)
        assert residue == [], (k, residue)


# ---------------------------------------------------------------- versioned


def _versioned_env(monkeypatch, lww: bool = False):
    sched = Sched(0)
    fake = FakeFS(sched, lww_create=lww)
    monkeypatch.setattr(V, "_remote_fs", lambda td: (fake, FakePath))
    monkeypatch.setattr(V, "_conflict_backoff", lambda *a, **k: None)
    monkeypatch.setattr(merge_mod, "merge_replace", _fake_merge_replace)
    monkeypatch.setattr(
        merge_mod, "insert_if_absent", _fake_insert_if_absent
    )

    def _read(path: str) -> _FakeDF:
        sched.yield_point()
        with fake.lock:
            if path not in fake.tables:
                raise KeyError(f"read of missing version dir: {path}")
            return _FakeDF(fake.tables[path], fake)

    spark_stub = types.SimpleNamespace(
        read=types.SimpleNamespace(parquet=_read)
    )
    V.commit_version(_FakeDF(frozenset({("seed", 0)}), fake), TBL)
    return sched, fake, spark_stub


def _versioned_scan(fake):
    markers, intents = [], []
    for p in fake.files:
        name = p.rsplit("/", 1)[-1]
        if f"/{V._COMMITS}/" in p:
            if V._COMMIT_RE.match(name):
                markers.append(int(name[1:]))
            elif ".__intent." in name:
                intents.append(name)
    return sorted(markers), intents


def _versioned_op_span(monkeypatch) -> int:
    sched, fake, spark_stub = _versioned_env(monkeypatch)
    tid = threading.get_ident()
    before = fake.op_count.get(tid, 0)
    V.merge_commit(
        spark_stub, TBL, _FakeDF(frozenset({("w", 1)}), fake),
        keys=["k"], file_reuse=False,
    )
    return fake.op_count[tid] - before


@pytest.mark.parametrize("lww", [False, True],
                         ids=["exclusive-create", "lww-create"])
def test_versioned_merge_crash_at_every_op(monkeypatch, lww):
    span = _versioned_op_span(monkeypatch)
    assert span >= 8
    seed_rows = frozenset({("seed", 0)})
    merged_rows = frozenset({("seed", 0), ("w", 1)})
    for k in range(span):
        monkeypatch.undo()
        sched, fake, spark_stub = _versioned_env(monkeypatch, lww)
        fake.crash_after(k)
        try:
            V.merge_commit(
                spark_stub, TBL, _FakeDF(frozenset({("w", 1)}), fake),
                keys=["k"], file_reuse=False,
            )
            died = False
        except InjectedCrash:
            died = True
        except IOError as exc:
            assert "IS COMMITTED" in str(exc), (k, exc)
            died = True
        assert died, k
        fake.disarm()
        # readers: live version resolves and its content is exactly
        # the seed's or exactly the merge's — never a mixture
        live = V.current_version(TBL)
        assert live in (1, 2), (k, live)
        content = fake.tables.get(V.version_dir(TBL, live))
        assert content == (seed_rows if live == 1 else merged_rows), (
            k, live, content,
        )
        # quiesced recovery: vacuum clears stale intents and orphan
        # version dirs; the table stays writable
        V.vacuum(TBL, keep=5)
        markers, intents = _versioned_scan(fake)
        assert intents == [], (k, intents)
        pre = TBL + "/"
        vdirs = {
            d[len(pre):]
            for d in fake.dirs
            if d.startswith(pre)
            and "/" not in d[len(pre):]
            and d[len(pre):].startswith("v")
            and d[len(pre):][1:].isdigit()
        }
        assert vdirs == {f"v{v:05d}" for v in markers}, (k, vdirs, markers)
        next_v = V.merge_commit(
            spark_stub, TBL, _FakeDF(frozenset({("w2", 2)}), fake),
            keys=["k"], file_reuse=False,
        )
        assert next_v == live + 1, (k, next_v, live)
        assert ("w2", 2) in fake.tables[V.version_dir(TBL, next_v)]


def test_crash_sweep_spans_are_stable():
    """Meta-test: pin the op spans so a protocol change that adds or
    removes FS operations consciously re-tunes the sweep (a span of 0
    would silently gut the whole file)."""
    mp = pytest.MonkeyPatch()
    try:
        m_span = _manifest_op_span(mp)
        mp.undo()
        v_span = _versioned_op_span(mp)
    finally:
        mp.undo()
    assert 8 <= m_span <= 60, m_span
    assert 8 <= v_span <= 60, v_span
