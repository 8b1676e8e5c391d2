"""Optimistic concurrent-commit retry (r9, VERDICT r8 #1).

The single-writer contract used to be the only piece of the 100 TB
story that failed loudly instead of succeeding: two writers racing a
version got one `create(overwrite=False)` winner and one exception.
At fleet scale a compactor racing an appender is routine, and
Delta/Iceberg both resolve it with re-read-and-retry. These tests pin
the engine's version of that protocol:

- manifest relations (`manifest.manifest_commit(retries=N)`): the
  loser deletes its orphan tree, re-resolves, re-RUNS its write (which
  re-reads the live tree → automatic rebase), and commits the next
  version — an appender and a compactor both land, serially, with
  neither's rows lost;
- versioned tables (`sources.versioned.merge_commit/delete_commit
  (retries=N)`): the merge is pinned to the base version it read
  (`expected_base`), so an interleaved commit raises CommitConflict
  instead of being silently anti-joined/merged away, and the retry
  rebuilds the merge against the new live version;
- the documented NON-rebaseable case: a raced full replace
  (`commit_version` directly) stays a loud CommitConflict — replaying
  a replace over a commit it never saw is last-writer-wins data loss,
  a human decision.

Reference analog: the PostgreSQL MVCC the reference leaned on for its
warehouse loads (`scr/Load.py` transactions).
"""

from __future__ import annotations

import os

import pytest

import etl_football_analytics_pipeline_spark.manifest as M
import etl_football_analytics_pipeline_spark.sources.versioned as V
from etl_football_analytics_pipeline_spark.manifest import CommitConflict


def _ids(spark, dest):
    return sorted(r.id for r in M.read_relation(spark, dest).collect())


def _kv(spark, td):
    return sorted((r.k, r.val) for r in V.read_latest(spark, td).collect())


# ---------------------------------------------------------------- manifest


def test_manifest_appender_vs_compactor_both_land(spark, tmp_path):
    """An appender whose version was stolen by a compactor mid-commit
    rebases and lands on the next version: serial history, no rows of
    either writer lost, the loser's orphan tree garbage-collected."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(
        spark, dest, lambda t: spark.range(0, 10).write.parquet(t)
    )  # v1

    def compactor_write(tree):
        # rewrite the CURRENT live tree coalesced — a compaction
        M.read_relation(spark, dest).coalesce(1).write.parquet(tree)

    fired = {"done": False}

    def appender_write(tree):
        if not fired["done"]:
            fired["done"] = True
            # the compactor lands AFTER the appender resolved its
            # target version — the classic fleet race
            M.manifest_commit(spark, dest, compactor_write, keep=2)
        live = M.read_relation(spark, dest)
        live.unionByName(
            spark.range(10, 15).select(*live.columns)
        ).write.parquet(tree)

    v = M.manifest_commit(spark, dest, appender_write, keep=2, retries=3)
    assert v == 3  # v2 was the compactor's; the appender rebased onto it
    assert _ids(spark, dest) == list(range(15))  # neither writer's rows lost
    # serial, duplicate-free history; the losing attempt's tree is gone
    versions = M.manifest_versions(spark, dest)
    assert [x[0] for x in versions] == [2, 3]
    trees = set(os.listdir(os.path.join(dest, "_trees")))
    assert trees == {f"v{x:08d}-{tok}" for x, tok in versions}


def test_manifest_race_without_retries_fails_loud(spark, tmp_path):
    """retries=0 keeps the pre-r9 contract: the loser raises
    CommitConflict and the winner's commit is untouched."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(5).write.parquet(t))
    fired = {"done": False}

    def racing_write(tree):
        if not fired["done"]:
            fired["done"] = True
            M.manifest_commit(
                spark, dest, lambda t: spark.range(7).write.parquet(t)
            )
        spark.range(99).write.parquet(tree)

    with pytest.raises(CommitConflict):
        M.manifest_commit(spark, dest, racing_write)
    assert _ids(spark, dest) == list(range(7))  # the winner, intact


# ---------------------------------------------------------------- versioned


@pytest.mark.parametrize("scheme", ["", "file://"])
def test_merge_commit_rebases_on_race(spark, tmp_path, monkeypatch, scheme):
    """An appender (merge_commit, retries>0) raced by another writer
    rebases: the final snapshot carries BOTH deltas — the exact
    rows-lost scenario the base pinning exists for. Covers the local
    pointer protocol and the remote (file://) marker protocol."""
    td = scheme + str(tmp_path / "t")
    V.commit_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, val string"), td
    )
    delta_b = spark.createDataFrame([(3, "B")], "k int, val string")
    delta_a = spark.createDataFrame([(2, "A2"), (4, "A")], "k int, val string")
    # the race injects at _commit_staged — the protocol boundary BOTH
    # commit shapes flow through (commit_version wraps it; the r11 CoW
    # merge path calls it directly)
    orig = V._commit_staged
    state = {"fired": False}

    def racy(write, table_dir, expected_base=None):
        if not state["fired"]:
            state["fired"] = True
            # writer B lands a full merge-commit while A is mid-flight
            # (between A's base read and A's publish)
            V.merge_commit(spark, table_dir, delta_b, ["k"])
        return orig(write, table_dir, expected_base)

    monkeypatch.setattr(V, "_commit_staged", racy)
    v = V.merge_commit(spark, td, delta_a, ["k"], retries=3)
    assert v == 3  # v2 was B's; A rebased onto it
    assert _kv(spark, td) == [(1, "a"), (2, "A2"), (3, "B"), (4, "A")]


def test_merge_commit_race_without_retries_fails_loud(
    spark, tmp_path, monkeypatch
):
    """retries=0: the stale merge raises CommitConflict instead of
    silently replacing the table with a snapshot that drops the
    interleaved writer's rows — and the winner's version dir content
    is untouched (the pre-write base probe fires before any rmtree)."""
    td = str(tmp_path / "t")
    V.commit_version(spark.createDataFrame([(1, "a")], "k int, val string"), td)
    delta_b = spark.createDataFrame([(3, "B")], "k int, val string")
    orig = V._commit_staged
    state = {"fired": False}

    def racy(write, table_dir, expected_base=None):
        if not state["fired"]:
            state["fired"] = True
            V.merge_commit(spark, table_dir, delta_b, ["k"])
        return orig(write, table_dir, expected_base)

    monkeypatch.setattr(V, "_commit_staged", racy)
    delta_a = spark.createDataFrame([(4, "A")], "k int, val string")
    with pytest.raises(CommitConflict):
        V.merge_commit(spark, td, delta_a, ["k"])
    assert _kv(spark, td) == [(1, "a"), (3, "B")]  # B's commit intact


def test_delete_commit_rebases_on_race(spark, tmp_path, monkeypatch):
    """A GDPR delete raced by an append rebases: the appended rows
    survive, the doomed keys are gone — neither silently wins."""
    td = str(tmp_path / "t")
    V.commit_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, val string"), td
    )
    appended = spark.createDataFrame([(5, "late")], "k int, val string")
    orig = V._commit_staged
    state = {"fired": False}

    def racy(write, table_dir, expected_base=None):
        if not state["fired"]:
            state["fired"] = True
            V.merge_commit(spark, table_dir, appended, ["k"])
        return orig(write, table_dir, expected_base)

    monkeypatch.setattr(V, "_commit_staged", racy)
    doomed = spark.createDataFrame([(1,)], "k int")
    V.delete_commit(spark, td, doomed, ["k"], retries=3)
    assert _kv(spark, td) == [(2, "b"), (5, "late")]


def test_full_replace_race_is_non_rebaseable_and_loud(
    spark, tmp_path, monkeypatch
):
    """The documented non-rebaseable case: a raced FULL REPLACE
    (commit_version with a pinned base) must not retry itself into
    last-writer-wins — it raises CommitConflict and leaves the
    winner's snapshot live."""
    td = str(tmp_path / "t")
    V.commit_version(spark.createDataFrame([(1, "a")], "k int, val string"), td)
    # a racer commits v2 while the replacer still believes base=1
    V.commit_version(spark.createDataFrame([(9, "win")], "k int, val string"), td)
    with pytest.raises(CommitConflict):
        V.commit_version(
            spark.createDataFrame([(7, "stale")], "k int, val string"),
            td,
            expected_base=1,
        )
    assert _kv(spark, td) == [(9, "win")]
    # and the winner's v2 directory content was never touched: the
    # pre-write base probe fails BEFORE the loser's rmtree/write
    assert V.current_version(td) == 2


def test_stale_claim_blocks_then_vacuum_clears(spark, tmp_path):
    """A pinned writer that crashed between its O_EXCL claim and the
    pointer flip leaves a stale claim fencing that version: the next
    pinned commit conflicts loudly; vacuum (run quiesced) clears the
    claim and the commit proceeds."""
    td = str(tmp_path / "t")
    V.commit_version(spark.createDataFrame([(1, "a")], "k int, val string"), td)
    claim = V._claim_path(td, 2)
    open(claim, "w").close()  # the crashed claimer's residue
    delta = spark.createDataFrame([(2, "b")], "k int, val string")
    with pytest.raises(CommitConflict):
        V.merge_commit(spark, td, delta, ["k"])
    V.vacuum(td)
    assert not os.path.exists(claim)
    assert V.merge_commit(spark, td, delta, ["k"]) == 2
    assert _kv(spark, td) == [(1, "a"), (2, "b")]


# ------------------------------------------------------------- real threads


def test_manifest_threaded_appenders_all_land(spark, tmp_path):
    """TRUE concurrency (no interleaving mocks): two driver threads
    each append three batches to one manifest relation with retries —
    every batch must land exactly once, versions strictly serial.

    keep=3 per the retention-under-concurrency rule (writers + 1): a
    rebasing writer scans the tree that was live at its attempt start,
    and keep=1 would let the rival's commit vacuum that tree mid-plan
    (the classic vacuum-vs-reader race)."""
    import threading

    dest = str(tmp_path / "rel")
    M.manifest_commit(
        spark, dest, lambda t: spark.range(0, 0).write.parquet(t), keep=3
    )
    errors = []

    def appender(lo_base: int):
        try:
            for i in range(3):
                lo = lo_base + i * 100

                def write(tree, lo=lo):
                    live = M.read_relation(spark, dest)
                    live.unionByName(
                        spark.range(lo, lo + 10).select(*live.columns)
                    ).write.parquet(tree)

                M.manifest_commit(spark, dest, write, keep=3, retries=10)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=appender, args=(1000,)),
        threading.Thread(target=appender, args=(2000,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    got = sorted(r.id for r in M.read_relation(spark, dest).collect())
    want = sorted(
        x for base in (1000, 2000) for i in range(3)
        for x in range(base + i * 100, base + i * 100 + 10)
    )
    assert got == want  # all six batches, nothing lost, nothing doubled
    versions = [v for v, _ in M.manifest_versions(spark, dest)]
    assert len(versions) == 3  # keep=3 retention
    assert versions[-1] == 7  # seed + six serial commits


def test_versioned_threaded_writers_all_land(spark, tmp_path):
    """Two driver threads merge disjoint key batches into one LOCAL
    versioned table with retries — the O_EXCL claim + pinned base must
    serialize them with no silent row loss."""
    import threading

    td = str(tmp_path / "t")
    V.commit_version(
        spark.createDataFrame([(0, "seed")], "k int, val string"), td
    )
    errors = []

    def writer(base: int):
        try:
            for i in range(3):
                delta = spark.createDataFrame(
                    [(base + i, f"w{base}_{i}")], "k int, val string"
                )
                V.merge_commit(spark, td, delta, ["k"], retries=10)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(100,)),
        threading.Thread(target=writer, args=(200,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    ks = sorted(r.k for r in V.read_latest(spark, td).collect())
    assert ks == [0, 100, 101, 102, 200, 201, 202]
    assert V.current_version(td) == 7  # six serial commits on the seed


# ---------------------------------------------------------- manifest_append


def test_manifest_append_is_o_delta_and_accumulates(spark, tmp_path):
    """manifest_append commits a new version whose PRIOR data files are
    hard links of the previous tree (same inodes — zero bytes copied;
    the add-files commit of a table format reduced to this layout)."""
    dest = str(tmp_path / "rel")
    M.manifest_append(spark, dest, spark.range(0, 10))
    v1_tree = M.resolved_dir(spark, dest)
    v1_inodes = {
        f: os.stat(os.path.join(v1_tree, f)).st_ino
        for f in os.listdir(v1_tree)
        if f.endswith(".parquet")
    }
    M.manifest_append(spark, dest, spark.range(10, 15))
    assert _ids(spark, dest) == list(range(15))
    v2_tree = M.resolved_dir(spark, dest)
    assert v2_tree != v1_tree
    v2_inodes = {
        f: os.stat(os.path.join(v2_tree, f)).st_ino
        for f in os.listdir(v2_tree)
        if f.endswith(".parquet")
    }
    # every v1 file appears in v2 as the SAME inode (linked, not copied)
    for f, ino in v1_inodes.items():
        assert v2_inodes.get(f) == ino, f
    # and v2 carries new delta files beyond the linked ones
    assert len(v2_inodes) > len(v1_inodes)


def test_manifest_append_refuses_partitioned_layout(spark, tmp_path):
    """A partitionBy tree needs the partition-aware merge; flat-linking
    it would interleave layouts — refuse loudly."""
    from etl_football_analytics_pipeline_spark.operators.tombstones import (
        replace_dir,
    )

    dest = str(tmp_path / "rel")
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "part string, v int"
    )
    replace_dir(
        spark, dest, lambda p: df.write.partitionBy("part").parquet(p)
    )
    with pytest.raises(ValueError, match="partitioned layout"):
        M.manifest_append(
            spark, dest,
            spark.createDataFrame([("c", 3)], "part string, v int"),
        )


def test_manifest_append_threaded_writers_all_land(spark, tmp_path):
    """Lock-free multi-writer appends: two threads each append three
    disjoint batches with retries — every row lands exactly once."""
    import threading

    dest = str(tmp_path / "rel")
    M.manifest_append(spark, dest, spark.range(0, 5))
    errors = []

    def appender(lo_base: int):
        try:
            for i in range(3):
                lo = lo_base + i * 100
                M.manifest_append(
                    spark, dest, spark.range(lo, lo + 10),
                    keep=3, retries=10,
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=appender, args=(1000,)),
        threading.Thread(target=appender, args=(2000,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    want = sorted(
        list(range(5))
        + [
            x for base in (1000, 2000) for i in range(3)
            for x in range(base + i * 100, base + i * 100 + 10)
        ]
    )
    assert _ids(spark, dest) == want


def test_manifest_append_rejects_schema_drift(spark, tmp_path):
    """r9 review: an appended delta sits NEXT TO the linked live files
    in one flat tree, so schema drift would commit a mixed-schema tree
    that reads back from an arbitrary footer — refuse at commit time,
    where the contract violation actually happened."""
    dest = str(tmp_path / "rel")
    M.manifest_append(spark, dest, spark.range(5))
    with pytest.raises(ValueError, match="schema mismatch"):
        M.manifest_append(spark, dest, spark.range(5).toDF("renamed"))
    with pytest.raises(ValueError, match="schema mismatch"):
        M.manifest_append(
            spark, dest,
            spark.range(5).selectExpr("CAST(id AS INT) AS id"),
        )
    assert _ids(spark, dest) == list(range(5))  # nothing published


def test_manifest_vacuum_refuses_duplicate_markers(spark, tmp_path):
    """r9 review: with duplicate markers for one version, the
    keep-window retire loop would delete one twin by TOKEN order —
    silently adjudicating (and destroying) one of two complete
    commits, the decision readers refuse and demand a human make.
    Vacuum must raise with nothing deleted."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(3).write.parquet(t))
    v, tok = M.current_manifest(spark, dest)
    forged = f"{dest}/_manifests/v{v:08d}.{'f' * 12}"
    open(forged, "w").close()
    with pytest.raises(IOError, match="losing marker"):
        M.manifest_vacuum(spark, dest, keep=1)
    os.remove(forged)
    # the real commit is untouched and vacuum works again
    assert M.current_manifest(spark, dest) == (v, tok)
    assert _ids(spark, dest) == list(range(3))
    assert M.manifest_vacuum(spark, dest, keep=1) == []


@pytest.mark.parametrize(
    "lock_fs", [True, False], ids=["publish-lock", "two-phase-only"]
)
def test_manifest_mixed_fleet_appenders_and_compactor(
    spark, tmp_path, monkeypatch, lock_fs
):
    """The exact fleet scenario the r8 verdict named as routine at
    100 TB: appenders and a compactor colliding on one relation. Two
    appender threads (three O(delta) linked appends each) race one
    compactor thread (two full rewrite commits), all with retries and
    keep=5 (writers + headroom per the retention-under-concurrency
    rule). Every appended row must survive every compaction — a
    compaction is rebaseable because its write re-reads the live tree
    on each attempt. Parameterized over BOTH publish paths (r10): the
    exclusive-create publish lock, and the two-phase-only fallback a
    plain object store gets."""
    import threading

    if not lock_fs:
        monkeypatch.setattr(
            M, "_publish_lock_supported", lambda fs, hp, d: False
        )
    dest = str(tmp_path / "rel")
    M.manifest_append(spark, dest, spark.range(0, 10), keep=5)
    errors = []

    def appender(lo_base: int):
        try:
            for i in range(3):
                lo = lo_base + i * 100
                M.manifest_append(
                    spark, dest, spark.range(lo, lo + 10),
                    keep=5, retries=12,
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def compactor():
        try:
            for _ in range(2):
                def write(tree):
                    M.read_relation(spark, dest).coalesce(1).write.parquet(tree)

                M.manifest_commit(spark, dest, write, keep=5, retries=12)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=appender, args=(1000,)),
        threading.Thread(target=appender, args=(2000,)),
        threading.Thread(target=compactor),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    want = sorted(
        list(range(10))
        + [
            x for base in (1000, 2000) for i in range(3)
            for x in range(base + i * 100, base + i * 100 + 10)
        ]
    )
    assert _ids(spark, dest) == want  # nothing lost across compactions
    versions = [v for v, _ in M.manifest_versions(spark, dest)]
    assert len(versions) == 5 and versions[-1] == 9  # 1 seed + 8 serial


# ------------------------------------------------------- two-phase markers


def test_intent_is_invisible_to_readers_and_rebasers(spark, tmp_path):
    """r9 two-phase: an intent (created-but-not-verified claim) must
    never be resolved as a commit — readers, rebasers and retention
    consume FINAL markers only, so a to-be-withdrawn rival can never
    poison a base tree or a read."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(3).write.parquet(t))
    cur = M.current_manifest(spark, dest)
    # forge a racer's in-flight intent at the NEXT version
    open(f"{dest}/_manifests/v{cur[0] + 1:08d}.{'a' * 12}.__intent", "w").close()
    assert M.current_manifest(spark, dest) == cur  # unmoved
    assert M.manifest_versions(spark, dest) == [cur]
    assert _ids(spark, dest) == [0, 1, 2]


def test_stale_intent_fences_then_steal_and_vacuum_unfence(
    spark, tmp_path, monkeypatch
):
    """A writer crashing inside the (sub-second) intent→final window
    leaves a stale intent fencing its version: a retries=0 commit
    conflicts loudly; a retrying commit STEALS the intent once it has
    been observed unchanged with no final past INTENT_STEAL_S; and an
    explicit quiesced vacuum clears it immediately."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(3).write.parquet(t))
    cur = M.current_manifest(spark, dest)
    stale = f"{dest}/_manifests/v{cur[0] + 1:08d}.{'b' * 12}.__intent"
    open(stale, "w").close()
    with pytest.raises(CommitConflict, match="raced by a concurrent writer"):
        M.manifest_commit(
            spark, dest, lambda t: spark.range(9).write.parquet(t)
        )
    assert _ids(spark, dest) == [0, 1, 2]  # fence held, nothing lost
    # a retrying writer waits out the steal window, then proceeds
    monkeypatch.setattr(M, "INTENT_STEAL_S", 0.2)
    v = M.manifest_commit(
        spark, dest, lambda t: spark.range(9).write.parquet(t), retries=8
    )
    assert v == cur[0] + 1
    assert not os.path.exists(stale)  # stolen
    assert _ids(spark, dest) == list(range(9))
    # explicit vacuum clears any remaining stale intent outright
    open(stale + "x", "w").close()  # non-matching name: ignored
    stale2 = f"{dest}/_manifests/v{v + 1:08d}.{'c' * 12}.__intent"
    open(stale2, "w").close()
    M.manifest_vacuum(spark, dest, keep=1)
    assert not os.path.exists(stale2)


def test_versioned_pinned_intent_blocks_before_any_write(spark, tmp_path):
    """r9 review: versioned version dirs are FIXED names, so a pinned
    writer must die BEFORE its first byte when the version is claimed
    — a rival's in-flight intent (or a crashed writer's stale one)
    conflicts with the target dir untouched; quiesced vacuum unfences."""
    tbl = f"file://{tmp_path}/t"
    V.commit_version(
        spark.createDataFrame([(1, "a")], "k int, val string"), tbl
    )
    local = f"{tmp_path}/t"
    rival_intent = f"{local}/_commits/c00000002.__intent.{'d' * 12}"
    open(rival_intent, "w").close()
    delta = spark.createDataFrame([(2, "b")], "k int, val string")
    with pytest.raises(CommitConflict, match="claimed"):
        V.merge_commit(spark, tbl, delta, ["k"])
    assert not os.path.exists(f"{local}/v00002")  # never touched
    V.vacuum(tbl)
    assert not os.path.exists(rival_intent)
    assert V.merge_commit(spark, tbl, delta, ["k"]) == 2
    assert _kv(spark, tbl) == [(1, "a"), (2, "b")]


def test_vacuum_unfences_never_committed_relation(spark, tmp_path):
    """r9 review: a crashed FIRST commit leaves an intent (and an
    orphan tree) with NO committed version — the early empty-committed
    return used to skip the intent sweep, making the unfence the
    CommitConflict message points to a silent no-op."""
    dest = str(tmp_path / "rel")
    os.makedirs(f"{dest}/_manifests")
    open(f"{dest}/_manifests/v{1:08d}.{'e' * 12}.__intent", "w").close()
    os.makedirs(f"{dest}/_trees/v{1:08d}-{'e' * 12}")
    with pytest.raises(CommitConflict):
        M.manifest_commit(
            spark, dest, lambda t: spark.range(3).write.parquet(t)
        )
    assert M.manifest_vacuum(spark, dest) == []  # unfence: must not no-op
    assert os.listdir(f"{dest}/_manifests") == []
    assert os.listdir(f"{dest}/_trees") == []
    assert M.manifest_commit(
        spark, dest, lambda t: spark.range(3).write.parquet(t)
    ) == 1


def test_versioned_vacuum_unfences_never_committed_table(spark, tmp_path):
    """Same crashed-first-commit state on a remote versioned table:
    vacuum must clear the stale intent (and the orphan staging dir)
    even though no version was ever committed."""
    tbl = f"file://{tmp_path}/t"
    local = f"{tmp_path}/t"
    os.makedirs(f"{local}/_commits")
    open(f"{local}/_commits/c00000001.__intent.{'f' * 12}", "w").close()
    os.makedirs(f"{local}/v00001")  # the crashed attempt's staging dir
    delta = spark.createDataFrame([(1, "a")], "k int, val string")
    with pytest.raises(CommitConflict, match="claimed"):
        V.merge_commit(spark, tbl, delta, ["k"])
    assert V.vacuum(tbl) == [1]  # orphan staging dir GC'd
    assert os.listdir(f"{local}/_commits") == []
    assert V.merge_commit(spark, tbl, delta, ["k"]) == 1
    assert _kv(spark, tbl) == [(1, "a")]


def test_failed_live_writer_releases_its_intent(spark, tmp_path, monkeypatch):
    """r9 review: a writer that fails LIVE between intent create and
    final create (storage fault, listing error) must release its
    intent — otherwise one failed writer fences the version for every
    retries=0 rival until a steal or explicit vacuum."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(2).write.parquet(t))
    orig = M._list_markers
    state = {"calls": 0}

    def flaky(fs, hp, d):
        state["calls"] += 1
        if state["calls"] == 2:  # the post-intent verify listing
            raise IOError("injected listing fault")
        return orig(fs, hp, d)

    monkeypatch.setattr(M, "_list_markers", flaky)
    with pytest.raises(IOError, match="injected"):
        M.manifest_commit(
            spark, dest, lambda t: spark.range(5).write.parquet(t)
        )
    monkeypatch.setattr(M, "_list_markers", orig)
    intents = [n for n in os.listdir(f"{dest}/_manifests")
               if n.endswith(".__intent")]
    assert intents == []  # no fence left behind
    # and a retries=0 commit proceeds immediately
    assert M.manifest_commit(
        spark, dest, lambda t: spark.range(5).write.parquet(t)
    ) == 2


# ------------------------------------------------- r10 fence + lock + repair


def test_slow_writer_cannot_publish_below_live_top(spark, tmp_path):
    """ADVICE r9 (medium): two rivals commit next_v AND next_v+1 with
    keep=1 while a slow writer is still writing its tree for next_v —
    retention retires the final at next_v, so a verify that only
    checked == next_v saw a clean slate and published a final BELOW
    the live top: rows silently shadowed, then vacuumed. The verify
    must treat ANY final >= next_v as a rival."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(3).write.parquet(t))
    fired = {"done": False}

    def slow_write(tree):
        if not fired["done"]:
            fired["done"] = True
            # two rivals land during the slow write; the second one's
            # keep=1 retention retires the first's final at next_v=2
            M.manifest_commit(
                spark, dest, lambda t: spark.range(7).write.parquet(t)
            )
            M.manifest_commit(
                spark, dest, lambda t: spark.range(11).write.parquet(t)
            )
        spark.range(99).write.parquet(tree)

    with pytest.raises(CommitConflict, match="raced by a concurrent"):
        M.manifest_commit(spark, dest, slow_write)
    # the live top is the second rival's commit, unshadowed
    versions = M.manifest_versions(spark, dest)
    assert [v for v, _ in versions] == [3]
    assert _ids(spark, dest) == list(range(11))
    # and the slow writer's withdrawn tree left no residue
    trees = set(os.listdir(os.path.join(dest, "_trees")))
    assert trees == {f"v{v:08d}-{tok}" for v, tok in versions}


def test_fence_withdraws_paused_writer_instead_of_duplicate_final(
    spark, tmp_path, monkeypatch
):
    """The r9 degradation, now fenced: writer A pauses between its
    verify and its final create for longer than the steal window; a
    retrying rival B steals A's intent (and publish lock) and commits.
    Pre-r10, A woke and created a SECOND final for the version —
    readers then refused until manual marker surgery. With the fence,
    A re-lists immediately before the final create, sees its claim
    stolen, and WITHDRAWS: exactly one final exists, B's commit is
    live, A gets a clean CommitConflict it can retry."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(3).write.parquet(t))
    monkeypatch.setattr(M, "INTENT_STEAL_S", 0.1)
    orig = M._list_markers
    state = {"calls": 0}

    def pausing(fs, hp, d):
        res = orig(fs, hp, d)
        state["calls"] += 1
        if state["calls"] == 2:
            # A's verify listing just completed (captured in `res`);
            # simulate A pausing past the steal window here, during
            # which rival B steals A's intent+lock and commits v2
            M.manifest_commit(
                spark, dest,
                lambda t: spark.range(7).write.parquet(t),
                retries=10, backoff_s=0.03,
            )
        return res

    monkeypatch.setattr(M, "_list_markers", pausing)
    with pytest.raises(CommitConflict, match="stolen while it was paused"):
        M.manifest_commit(
            spark, dest, lambda t: spark.range(99).write.parquet(t)
        )
    monkeypatch.setattr(M, "_list_markers", orig)
    # exactly ONE final at v2 — B's; A withdrew, no duplicate state
    # (v1 is retained too: B's retries>0 enforces keep>=2)
    versions = M.manifest_versions(spark, dest)
    assert [v for v, _ in versions] == [1, 2]
    assert _ids(spark, dest) == list(range(7))
    trees = set(os.listdir(os.path.join(dest, "_trees")))
    assert trees == {f"v{v:08d}-{tok}" for v, tok in versions}
    # no intent or lock residue from either writer
    leftover = [
        n for n in os.listdir(f"{dest}/_manifests")
        if n.endswith(".__intent") or n.endswith(".__lock")
    ]
    assert leftover == []


def test_stale_publish_lock_fences_then_steal_and_vacuum(
    spark, tmp_path, monkeypatch
):
    """A writer that crashed while HOLDING the publish lock fences its
    version on lock-filesystem schemes: a retries=0 commit withdraws
    loudly (intent released, tree gone); a retrying commit steals the
    lock once observed unchanged past the steal window; an explicit
    quiesced vacuum clears it immediately."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(3).write.parquet(t))
    stale = f"{dest}/_manifests/v{2:08d}.__lock"
    open(stale, "w").close()  # the crashed holder's residue
    with pytest.raises(CommitConflict, match="publish lock"):
        M.manifest_commit(
            spark, dest, lambda t: spark.range(9).write.parquet(t)
        )
    assert _ids(spark, dest) == [0, 1, 2]
    assert not any(
        n.endswith(".__intent") for n in os.listdir(f"{dest}/_manifests")
    )  # the loser's intent was withdrawn with it
    # a retrying writer waits out the steal window, then proceeds
    monkeypatch.setattr(M, "INTENT_STEAL_S", 0.1)
    v = M.manifest_commit(
        spark, dest, lambda t: spark.range(9).write.parquet(t),
        retries=10, backoff_s=0.03,
    )
    assert v == 2
    assert not os.path.exists(stale)  # stolen
    assert _ids(spark, dest) == list(range(9))
    # explicit quiesced vacuum clears a fresh stale lock outright
    stale2 = f"{dest}/_manifests/v{3:08d}.__lock"
    open(stale2, "w").close()
    M.manifest_vacuum(spark, dest, keep=1)
    assert not os.path.exists(stale2)


def test_manifest_repair_resolves_duplicate_finals(spark, tmp_path):
    """The mechanical repair for the duplicate-final state (r10): two
    complete commits claim one version (forged here — the fence + lock
    make it unreachable through the protocol on local disk); readers
    and vacuum refuse loudly; manifest_repair retires the losers
    deterministically (lowest token wins) and the relation serves
    again."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(3).write.parquet(t))
    v1, tok1 = M.current_manifest(spark, dest)
    # forge a rival complete commit at the SAME version: real tree,
    # real marker — tok1 is a random uuid hex, so pick forged tokens
    # around it to pin the lowest-token-wins adjudication both ways
    lo_tok, hi_tok = "0" * 12, "f" * 12
    spark.range(50).write.parquet(M.tree_dir(dest, v1, hi_tok))
    open(f"{dest}/_manifests/v{v1:08d}.{hi_tok}", "w").close()
    spark.range(70).write.parquet(M.tree_dir(dest, v1, lo_tok))
    open(f"{dest}/_manifests/v{v1:08d}.{lo_tok}", "w").close()
    # readers, time travel and vacuum all refuse, pointing at repair
    with pytest.raises(IOError, match="manifest_repair"):
        M.current_manifest(spark, dest)
    with pytest.raises(IOError, match="manifest_repair"):
        M.read_relation_version(spark, dest, v1)
    with pytest.raises(IOError, match="manifest_repair"):
        M.manifest_vacuum(spark, dest, keep=1)
    retired = M.manifest_repair(spark, dest)
    # lowest token survives; the real commit's token and hi_tok retired
    assert retired == sorted([(v1, tok1), (v1, hi_tok)], key=lambda x: x[1])
    assert M.current_manifest(spark, dest) == (v1, lo_tok)
    assert _ids(spark, dest) == list(range(70))
    assert M.read_relation_version(spark, dest, v1).count() == 70
    # losers' trees verifiably gone; vacuum works again; idempotent
    trees = set(os.listdir(os.path.join(dest, "_trees")))
    assert trees == {f"v{v1:08d}-{lo_tok}"}
    assert M.manifest_vacuum(spark, dest, keep=1) == []
    assert M.manifest_repair(spark, dest) == []


def test_post_final_release_fault_relabels_distinctly(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9: a fault releasing the writer's OWN intent after the
    final exists must not be reported as 'retention failed' — the
    operator would vacuum when the residue is an intent file. The
    relabel must name the right cleanup and state the commit IS
    durable."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(spark, dest, lambda t: spark.range(3).write.parquet(t))
    orig = M._verified_delete

    def flaky(fs, hp, path, what):
        if what == "own intent (post-final)":
            raise IOError("injected intent-release fault")
        return orig(fs, hp, path, what)

    monkeypatch.setattr(M, "_verified_delete", flaky)
    with pytest.raises(IOError, match="retention did NOT fail"):
        M.manifest_commit(
            spark, dest, lambda t: spark.range(9).write.parquet(t)
        )
    monkeypatch.setattr(M, "_verified_delete", orig)
    # the commit IS durable despite the release fault
    assert M.current_manifest(spark, dest)[0] == 2
    assert _ids(spark, dest) == list(range(9))


def test_retries_enforce_concurrency_safe_retention(spark, tmp_path):
    """ADVICE r9: retries>0 declares concurrency, and keep=1 under
    concurrency is the undersized retention that can vacuum a tree an
    in-flight rebase is scanning (or retire the final a slow rival's
    verify needed) — manifest_commit bumps keep to >= 2 there."""
    dest = str(tmp_path / "rel")
    M.manifest_commit(
        spark, dest, lambda t: spark.range(3).write.parquet(t),
        keep=1, retries=2,
    )
    M.manifest_commit(
        spark, dest, lambda t: spark.range(5).write.parquet(t),
        keep=1, retries=2,
    )
    assert [v for v, _ in M.manifest_versions(spark, dest)] == [1, 2]
    # retries=0 keeps the single-writer replace semantics untouched
    M.manifest_commit(
        spark, dest, lambda t: spark.range(7).write.parquet(t), keep=1
    )
    assert [v for v, _ in M.manifest_versions(spark, dest)] == [3]


def test_two_phase_fallback_without_publish_lock(spark, tmp_path, monkeypatch):
    """Plain object stores without conditional create run the
    two-phase protocol WITHOUT the publish lock (the documented
    fallback): threaded appenders must still all land exactly once,
    and the r10 fence alone must still withdraw a paused-then-stolen
    writer instead of publishing a duplicate final."""
    import threading

    monkeypatch.setattr(
        M, "_publish_lock_supported", lambda fs, hp, d: False
    )
    # -- threaded appenders, lock disabled
    dest = str(tmp_path / "rel")
    M.manifest_append(spark, dest, spark.range(0, 5))
    errors = []

    def appender(lo_base: int):
        try:
            for i in range(3):
                lo = lo_base + i * 100
                M.manifest_append(
                    spark, dest, spark.range(lo, lo + 10),
                    keep=3, retries=10,
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=appender, args=(1000,)),
        threading.Thread(target=appender, args=(2000,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    want = sorted(
        list(range(5))
        + [
            x for base in (1000, 2000) for i in range(3)
            for x in range(base + i * 100, base + i * 100 + 10)
        ]
    )
    assert _ids(spark, dest) == want
    assert not any(
        n.endswith(".__lock") for n in os.listdir(f"{dest}/_manifests")
    )  # the lock path genuinely never ran

    # -- paused-writer steal, lock disabled: the fence alone withdraws
    dest2 = str(tmp_path / "rel2")
    M.manifest_commit(spark, dest2, lambda t: spark.range(3).write.parquet(t))
    monkeypatch.setattr(M, "INTENT_STEAL_S", 0.1)
    orig = M._list_markers
    state = {"calls": 0}

    def pausing(fs, hp, d):
        res = orig(fs, hp, d)
        state["calls"] += 1
        if state["calls"] == 2:  # the paused writer's verify listing
            M.manifest_commit(
                spark, dest2,
                lambda t: spark.range(7).write.parquet(t),
                retries=10, backoff_s=0.03,
            )
        return res

    monkeypatch.setattr(M, "_list_markers", pausing)
    with pytest.raises(CommitConflict, match="stolen while it was paused"):
        M.manifest_commit(
            spark, dest2, lambda t: spark.range(99).write.parquet(t)
        )
    monkeypatch.setattr(M, "_list_markers", orig)
    versions = M.manifest_versions(spark, dest2)
    assert [v for v, _ in versions] == [1, 2]  # ONE final at v2, no dup
    assert _ids(spark, dest2) == list(range(7))
