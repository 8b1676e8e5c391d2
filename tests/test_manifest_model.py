"""Schedule-fuzzed MODEL test of the manifest commit protocol (r10,
extended r11).

The threaded tests in test_concurrency.py race real Spark writers, but
the OS scheduler only explores a few interleavings per run. This file
model-checks the protocol itself: `manifest_commit` runs unmodified
against a FAKE linearizable in-memory filesystem (tests/model_fs.py)
whose every operation is a yield point, and a seeded scheduler drives
two (plus a smaller three-writer sweep) concurrent writers through
hundreds of adversarial interleavings — including indefinite pauses at
every protocol step (the paused-writer window the r10 fence closes)
and steals of a starved writer's live claims.

The sweep runs per STORE FIDELITY (r11, VERDICT r10 #2/#3):

- ``publish-lock`` — exclusive-create FS (local O_EXCL / HDFS), lock
  mode 'create';
- ``two-phase-only`` — the same FS with the lock disabled;
- ``conditional-lock-lww`` — a LAST-WRITER-WINS base create (bare S3
  PUT) whose createFile builder honors the HADOOP-19256 conditional
  option: lock mode 'conditional' through the real `_exclusive_create`
  builder path (dead code in every test before r11);
- ``two-phase-only-lww`` — bare S3: LWW creates, no lock. The
  two-phase mode claims it never relies on create exclusivity
  (token-named markers); this sweep VERIFIES that claim instead of
  assuming it;
- ``conditional-ignored-lww`` — a store that advertises + accepts the
  conditional option but silently IGNORES it (the check-then-put
  downgrade ADVICE r10 warned about): the "lock" degrades to a no-op,
  and the protocol must stay loud-never-silent on every schedule.

Two contracts are pinned, per mode:

- **never-steal** (window above any pause the schedule can produce) —
  the STRONG contract holds on every schedule: both writers land,
  history strictly serial, exactly ONE final per version (the
  duplicate state is unreachable), every final's tree exists, no
  intent/lock residue;
- **starved-writer-steal** (the scheduler deliberately starves writers
  PAST the steal window — violating the protocol's documented
  liveness precondition that the window exceed any real pause) — the
  DEGRADED contract holds: most schedules are still clean, and when a
  writer is stolen from inside the one-call fence→final gap the
  anomaly is LOUD (CommitConflict / IS-COMMITTED relabel — including
  the r11 left-lock release guard / readers refusing the duplicated
  version) and `manifest_repair` + quiesced vacuum restore the
  relation mechanically and idempotently. Silent loss — a success or
  a landed final that simply vanishes with no signal — is asserted
  impossible on every schedule.
"""

from __future__ import annotations

import threading
import types

import pytest

import etl_football_analytics_pipeline_spark.manifest as M
from model_fs import FakeFS, FakePath, Sched

DEST = "model://rel"


def _run_schedule(
    monkeypatch, seed: int, mode, steal_after_s: float,
    n_writers: int = 2,
):
    lock_mode, lww, ignore_must = mode
    sched = Sched(seed)
    fake = FakeFS(
        sched,
        lww_create=lww,
        conditional=(lock_mode == "conditional"),
        ignore_must=ignore_must,
    )
    hp = FakePath
    spark_stub = types.SimpleNamespace(
        catalog=types.SimpleNamespace(refreshByPath=lambda p: None)
    )
    monkeypatch.setattr(M, "_fs", lambda spark, path: (fake, hp))
    monkeypatch.setattr(
        M, "_publish_lock_supported", lambda fs, hp_, d: lock_mode
    )
    # real sleeps would couple the model to wall-clock; scheduling is
    # the scheduler's job
    monkeypatch.setattr(M, "_conflict_backoff", lambda *a, **k: None)
    monkeypatch.setattr(M, "SETTLE_WAITS", (None,))
    # VIRTUAL TIME: the steal clock reads granted scheduler steps, so
    # steal windows mean "observed unchanged across N steps of the
    # schedule" — wall-clock independent and starvation-faithful.
    # (threading's own waits bound `monotonic` at import, unaffected.)
    import time as _time_mod

    monkeypatch.setattr(_time_mod, "monotonic", lambda: float(sched.steps))

    # seed commit from the (unscheduled) main thread
    M.manifest_commit(spark_stub, DEST, lambda t: fake.mkdirs(t), keep=3)

    results: dict[int, int] = {}
    errors: list[BaseException] = []

    def writer(wid: int):
        sched.register()
        try:
            results[wid] = M.manifest_commit(
                spark_stub, DEST, lambda t: fake.mkdirs(t),
                keep=n_writers + 1, retries=500, backoff_s=0.0,
                steal_after_s=steal_after_s,
            )
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)
        finally:
            sched.finish()

    threads = [
        threading.Thread(target=writer, args=(i,))
        for i in range(1, n_writers + 1)
    ]
    for t in threads:
        t.start()
    sched.drive(threads)
    for t in threads:
        t.join()

    # ---- protocol invariants ------------------------------------------
    def _scan():
        finals: dict[int, list[str]] = {}
        residue = []
        for path in fake.files:
            name = path.rsplit("/", 1)[-1]
            if M._MARKER_RE.match(name):
                finals.setdefault(int(name[1:9]), []).append(name)
            elif name.endswith(".__intent") or name.endswith(".__lock"):
                residue.append(name)
        tree_pre = DEST + "/_trees/"
        trees = {
            d[len(tree_pre):] for d in fake.dirs
            if d.startswith(tree_pre) and "/" not in d[len(tree_pre):]
        }
        return finals, residue, trees

    def _assert_healthy(finals, residue, trees):
        assert residue == [], (seed, residue)  # claims always released
        assert all(len(t) == 1 for t in finals.values()), (seed, finals)
        want = {
            f"v{v:08d}-{names[0].split('.')[1]}"
            for v, names in finals.items()
        }
        assert trees == want, (seed, trees, want)
        assert M.current_manifest(spark_stub, DEST) is not None

    steal_mode = steal_after_s < 1e9
    conflicts = [e for e in errors if isinstance(e, M.CommitConflict)]
    committed_loud = [
        e for e in errors
        if not isinstance(e, M.CommitConflict) and "IS COMMITTED" in str(e)
    ]
    unexpected = [
        e for e in errors
        if not isinstance(e, M.CommitConflict)
        and "IS COMMITTED" not in str(e)
    ]
    assert not unexpected, (seed, unexpected)
    finals, residue, trees = _scan()
    dup = {v for v, names in finals.items() if len(names) > 1}

    if not steal_mode:
        # STRONG contract: with the steal window above every pause the
        # schedule can produce, the duplicate state is UNREACHABLE and
        # both writers land serially, every schedule.
        assert not errors, (seed, errors)
        assert sorted(results.values()) == list(
            range(2, n_writers + 2)
        ), (seed, results)
        assert set(finals) == set(range(1, n_writers + 2)), (seed, finals)
        _assert_healthy(finals, residue, trees)
        return

    # STEAL mode: the burst scheduler deliberately violates the
    # protocol's liveness precondition (pauses can exceed the steal
    # window), so a writer can be stolen from INSIDE the one-call
    # fence→final gap. The documented contract then is: NEVER silent —
    # either the run is clean anyway, or the anomaly is loud (a
    # CommitConflict, an IS-COMMITTED relabel, readers refusing) and
    # manifest_repair restores the relation mechanically.
    assert sorted(results.values()) == sorted(
        set(results.values())
    ), (seed, results)  # successes serial, never shared
    # every writer is accounted for LOUDLY: a returned version, a
    # withdraw-conflict, or an IS-COMMITTED relabel (e.g. the r11
    # left-lock release guard when a rival stole and re-created the
    # lock during a pause — the commit itself is durable)
    assert len(results) + len(conflicts) + len(committed_loud) == (
        n_writers
    ), (seed, results, errors)
    if not dup:
        _assert_healthy(finals, residue, trees)
        # no silent loss: the seed, every success, AND every
        # loud-committed writer each landed exactly one final
        assert len(finals) == 1 + len(results) + len(committed_loud), (
            seed, finals, results, committed_loud,
        )
        return
    # duplicated version: must be LOUD somewhere...
    # ...readers refuse the duplicated version rather than guess
    v_dup = sorted(dup)[0]
    with pytest.raises(IOError):
        M.read_relation_version(spark_stub, DEST, v_dup)
    # ...and repair + quiesced vacuum restore health deterministically
    retired = M.manifest_repair(spark_stub, DEST)
    assert retired, (seed, finals)
    M.manifest_vacuum(spark_stub, DEST, keep=10)
    finals2, residue2, trees2 = _scan()
    _assert_healthy(finals2, residue2, trees2)
    assert M.manifest_repair(spark_stub, DEST) == []  # idempotent


MODES = [
    pytest.param(("create", False, False), id="publish-lock"),
    pytest.param((None, False, False), id="two-phase-only"),
    pytest.param(("conditional", True, False), id="conditional-lock-lww"),
    pytest.param((None, True, False), id="two-phase-only-lww"),
    pytest.param(("conditional", True, True), id="conditional-ignored-lww"),
]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("steal", [40.0, 1e9],
                         ids=["starved-writer-steal", "never-steal"])
def test_protocol_invariants_over_fuzzed_schedules(monkeypatch, mode, steal):
    """Two writers, dozens of seeded adversarial interleavings per
    mode: the serial-history / single-final / no-residue invariants
    must hold under every schedule — including ones that pause a
    writer indefinitely between ANY two filesystem operations (the
    exact window the r10 fence + lock exist for). steal=40 virtual
    steps with 1–100-step scheduling bursts means a writer skipped
    for a burst or two is starved past the window mid-publish and
    STOLEN FROM — it must withdraw at the fence, never publish a
    duplicate; steal=1e9 pins the never-steal protocol. The
    protocol's LIVENESS assumption (steal window ≫ a healthy publish
    duration, jittered backoff decorrelating rivals) is a
    precondition encoded in the burst scheduler, not a finding: strict
    per-op alternation with a window below the publish span livelocks
    by design."""
    for seed in range(150):
        _run_schedule(monkeypatch, seed, mode, steal)
    # a smaller three-writer sweep: richer interleavings (two rivals
    # can be mid-protocol while the third is starved)
    for seed in range(40):
        _run_schedule(monkeypatch, 10_000 + seed, mode, steal,
                      n_writers=3)


# ---------------------------------------------------------------------------
# directed unit tests for the r11 conditional-create + lock-release fixes
# ---------------------------------------------------------------------------

LOCKP = f"{DEST}/_manifests/v00000001.__lock"


def test_conditional_builder_requests_server_side_if_none_match():
    """_exclusive_create(mode='conditional') must request HADOOP-19256
    server-enforced create-if-absent: overwrite(True) with the
    conditional option set to TRUE via must() (ADVICE r10: the pre-r11
    overwrite(False)+must(option, False) spelling explicitly DISABLED
    the conditional PUT, silently degrading the lock to client-side
    check-then-put on exactly the stores that advertise support)."""
    fake = FakeFS(Sched(0), lww_create=True, conditional=True)
    M._exclusive_create(fake, FakePath, LOCKP, "conditional")
    ((path, overwrite_flag, musts),) = fake.builder_calls
    assert path == LOCKP
    assert overwrite_flag is True
    assert musts == {M._CONDITIONAL_CREATE_OPTION: True}
    # a second conditional create collides SERVER-SIDE even though the
    # store's plain create is last-writer-wins...
    with pytest.raises(Exception):
        M._exclusive_create(fake, FakePath, LOCKP, "conditional")
    # ...while a plain create on the same store would have silently
    # succeeded — the builder path is the only thing making the lock a
    # lock here
    fake.create(FakePath(LOCKP), False)  # LWW: no error


def test_conditional_builder_unknown_must_key_fails_loudly():
    """On a store that does NOT understand the conditional option, the
    mandatory (.must, not .opt) key is rejected at build() — a hard
    error, never a silent downgrade to check-then-put."""
    fake = FakeFS(Sched(0), lww_create=True, conditional=False)
    with pytest.raises(IOError, match="unsupported mandatory"):
        M._exclusive_create(fake, FakePath, LOCKP, "conditional")
    assert LOCKP not in fake.files


def test_publish_lock_probe_cached_per_scheme_and_authority():
    """The capability probe runs once per (scheme, authority) — and
    caches None (no support) as firmly as support; exclusive-create
    schemes short-circuit without probing at all."""
    M._lock_support_cache.clear()
    try:
        fake = FakeFS(Sched(0), conditional=True)
        assert (
            M._publish_lock_supported(fake, FakePath, "s3m://bkt-a/rel")
            == "conditional"
        )
        probes = fake.capability_probes
        assert probes > 0
        # same authority, different path: served from the cache
        assert (
            M._publish_lock_supported(fake, FakePath, "s3m://bkt-a/other")
            == "conditional"
        )
        assert fake.capability_probes == probes
        # different authority: re-probed (one account's endpoint may
        # support conditional PUT while another's does not)
        fake2 = FakeFS(Sched(0), conditional=False)
        assert (
            M._publish_lock_supported(fake2, FakePath, "s3m://bkt-b/rel")
            is None
        )
        probes2 = fake2.capability_probes
        assert (
            M._publish_lock_supported(fake2, FakePath, "s3m://bkt-b/rel")
            is None
        )
        assert fake2.capability_probes == probes2  # None cached too
        # allowlisted schemes never probe
        assert (
            M._publish_lock_supported(fake2, FakePath, "hdfs://nn/rel")
            == "create"
        )
        assert fake2.capability_probes == probes2
    finally:
        M._lock_support_cache.clear()


def test_release_lock_identity_guard():
    """The post-publish lock release deletes the token-free lock ONLY
    on a positive mtime identity match (ADVICE r10): an unknown own
    identity or a mismatched mtime leaves the lock in place (it may be
    a rival's live lock), an absent lock is a no-op."""
    fake = FakeFS(Sched(0))
    assert M._release_lock_if_mine(fake, FakePath, LOCKP, 123) == "absent"
    fake.create(FakePath(LOCKP), False)
    mt = fake.files[LOCKP]
    # acquire-time identity fault: NEVER delete blindly
    assert M._release_lock_if_mine(fake, FakePath, LOCKP, None) == "left"
    assert LOCKP in fake.files
    # a rival's re-created lock (different mtime): left for its owner
    assert M._release_lock_if_mine(fake, FakePath, LOCKP, mt + 99) == "left"
    assert LOCKP in fake.files
    # provably ours: released, verified
    assert M._release_lock_if_mine(fake, FakePath, LOCKP, mt) == "released"
    assert LOCKP not in fake.files


def test_release_lock_transient_stat_fault_confirmed_by_restat():
    """A transient stat fault at release time must not silently leave
    the writer's own lock behind (ADVICE r10): one confirming re-stat
    distinguishes 'really absent' from 'fault'."""

    class FlakyFS(FakeFS):
        def __init__(self, sched):
            super().__init__(sched)
            self.faults = 1

        def getFileStatus(self, p):
            if self.faults:
                self.faults -= 1
                raise IOError("transient stat fault")
            return super().getFileStatus(p)

    fake = FlakyFS(Sched(0))
    fake.create(FakePath(LOCKP), False)
    mt = fake.files[LOCKP]
    assert M._release_lock_if_mine(fake, FakePath, LOCKP, mt) == "released"
    assert LOCKP not in fake.files


def test_release_lock_persistent_stat_fault_reports_left_not_absent():
    """A PERSISTENT stat fault (storage outage — not a definitive
    does-not-exist) must be reported as 'left' so the post-final path
    relabels loudly; reading it as 'absent' would silently strand the
    writer's own lock (r11 review finding)."""

    class OutageFS(FakeFS):
        def getFileStatus(self, p):
            raise IOError("connection reset by peer")

    fake = OutageFS(Sched(0))
    # the lock may or may not exist — the point is no answer was had
    assert M._release_lock_if_mine(fake, FakePath, LOCKP, 123) == "left"


def test_lock_stat_distinguishes_not_found_from_fault():
    fake = FakeFS(Sched(0))
    state, mt = M._lock_stat(fake, FakePath, LOCKP)
    assert (state, mt) == ("absent", None)  # fake raises 'not found: …'
    fake.create(FakePath(LOCKP), False)
    state, mt = M._lock_stat(fake, FakePath, LOCKP)
    assert state == "present" and mt == fake.files[LOCKP]


def test_acquire_identity_stat_fault_retries_then_releases(monkeypatch):
    """r12 (ADVICE r11): a TRANSIENT stat fault on the acquire-time
    identity read must not permanently downgrade a successful commit's
    release to the loud 'left' outcome — the acquire re-stats
    (bounded) until an answer, so the success path proves identity
    and releases the writer's own lock. The never-blind-delete rule
    is untouched: a persistently answerless acquire still leaves the
    lock in place."""
    sched = Sched(0)
    lock2 = f"{DEST}/_manifests/v00000002.__lock"
    faults = {"n": 0}

    class FlakyFS(FakeFS):
        def getFileStatus(self, p):
            if p.path == lock2 and faults["n"] < 2:
                faults["n"] += 1
                raise IOError("connection reset by peer")
            return super().getFileStatus(p)

    fake = FlakyFS(sched)
    hp = FakePath
    spark_stub = types.SimpleNamespace(
        catalog=types.SimpleNamespace(refreshByPath=lambda p: None)
    )
    monkeypatch.setattr(M, "_fs", lambda spark, path: (fake, hp))
    monkeypatch.setattr(
        M, "_publish_lock_supported", lambda fs, hp_, d: "create"
    )
    monkeypatch.setattr(M, "_conflict_backoff", lambda *a, **k: None)
    monkeypatch.setattr(M, "SETTLE_WAITS", (None,))
    M.manifest_commit(spark_stub, DEST, lambda t: fake.mkdirs(t), keep=3)
    v = M.manifest_commit(spark_stub, DEST, lambda t: fake.mkdirs(t), keep=3)
    assert v == 2
    assert faults["n"] == 2  # the bounded retry was actually exercised
    assert lock2 not in fake.files  # released (proved ours), not LEFT
