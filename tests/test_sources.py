"""CSV utilities + column resolver unit tests (reference S3/S4/S5,
P3/P4 behaviors)."""

from __future__ import annotations

import os
import tempfile

import pytest

from etl_football_analytics_pipeline_spark.functions.resolver import (
    find_column,
    resolve_columns,
)
from etl_football_analytics_pipeline_spark.sources.csv_utils import (
    flatten_header_levels,
    read_csv_dropmalformed,
    read_two_row_header_csv,
)


def test_flatten_header_levels_reference_semantics():
    # `scr/Extract.py:29-51`: join non-empty levels, drop Unnamed
    assert flatten_header_levels(
        ["Performance", "Performance", "Unnamed: 2", ""],
        ["Gls", "Ast", "player", "season"],
    ) == ["Performance_Gls", "Performance_Ast", "player", "season"]


def test_flatten_header_levels_dedupes():
    assert flatten_header_levels(["A", "A"], ["x", "x"]) == ["A_x", "A_x_1"]


def test_two_row_header_reader(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.csv")
        with open(path, "w") as fh:
            fh.write("Perf,Perf,Unnamed: 2\n")
            fh.write("gls,ast,player\n")
            fh.write("3,1,alice\n")
            fh.write("0,2,bob\n")
        df = read_two_row_header_csv(spark, path)
        assert df.columns == ["Perf_gls", "Perf_ast", "player"]
        rows = sorted((r.player, r.Perf_gls) for r in df.collect())
        assert rows == [("alice", "3"), ("bob", "0")]


def test_dropmalformed(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bad.csv")
        with open(path, "w") as fh:
            fh.write("k,v\n1,a\nnot_an_int,b\n2,c\n3,d,EXTRA,FIELDS\n4,e\n")
        df = read_csv_dropmalformed(spark, path, "k int, v string")
        rows = sorted((r.k, r.v) for r in df.collect())
        assert rows == [(1, "a"), (2, "c"), (4, "e")]


def test_find_column_case_insensitive_and_alias(spark):
    df = spark.createDataFrame([(1, "x")], "Team_ID int, Venue_Label string")
    assert find_column(df, "team_id") == "Team_ID"
    assert find_column(df, "club_id", "team_id") == "Team_ID"
    # MultiIndex-style suffix fallback: `label` matches `Venue_Label`
    assert find_column(df, "label") == "Venue_Label"
    with pytest.raises(KeyError):
        find_column(df, "missing_col")


def test_resolve_columns_projection(spark):
    df = spark.createDataFrame([(7, "anfield")], "CLUB_ID int, statium_name string")
    out = resolve_columns(
        df,
        {
            "team_id": ["club_id", "team_id"],
            # the reference's [sic] alias list, `scr/Transform.py:301-305`
            "stadium_name": ["venue_label", "stadium_name", "statium_name"],
        },
    )
    assert out.columns == ["team_id", "stadium_name"]
    assert out.collect()[0].team_id == 7


def test_scan_ready_path_compacts_and_noops(spark, tmp_path):
    """Single giant-row-group files get a multi-row-group mirror
    (keyed by mtime — rebuilt when the source changes); already-chunked
    files, directories, and tiny tables pass through untouched; values
    are identical through the mirror."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_football_analytics_pipeline_spark.sources.registry import (
        scan_ready_path,
    )

    src = str(tmp_path / "one_group.parquet")
    tb = pa.table({"id": list(range(10000)), "v": [i * 0.5 for i in range(10000)]})
    pq.write_table(tb, src)  # one row group
    out = scan_ready_path(src, parallelism=8)
    assert out != src
    md = pq.ParquetFile(out).metadata
    assert md.num_row_groups > 4
    assert md.num_rows == 10000
    got = spark.read.parquet(out).orderBy("id").collect()
    want = spark.read.parquet(src).orderBy("id").collect()
    assert got == want
    # cached: same mirror on the second call
    assert scan_ready_path(src, parallelism=8) == out

    # no-op: already chunked
    chunked = str(tmp_path / "chunked.parquet")
    pq.write_table(tb, chunked, row_group_size=1000)
    assert scan_ready_path(chunked, parallelism=8) == chunked
    # no-op: tiny
    tiny = str(tmp_path / "tiny.parquet")
    pq.write_table(pa.table({"id": [1, 2, 3]}), tiny)
    assert scan_ready_path(tiny, parallelism=8) == tiny
    # no-op: directory
    assert scan_ready_path(str(tmp_path), parallelism=8) == str(tmp_path)

    # source update -> new mirror
    import os
    import time as _time

    pq.write_table(pa.table({"id": list(range(20000))}), src)
    os.utime(src, (_time.time() + 10, _time.time() + 10))
    out2 = scan_ready_path(src, parallelism=8)
    assert out2 != out
    assert pq.ParquetFile(out2).metadata.num_rows == 20000


def test_two_row_header_quote_aware_and_dedup_collision(spark, tmp_path):
    """Quoted header fields containing the separator must split
    quote-aware (pandas header=[0,1] semantics), and synthesized
    dedup suffixes must not collide with literal '<name>_1' columns."""
    from etl_football_analytics_pipeline_spark.sources.csv_utils import (
        flatten_header_levels,
        read_two_row_header_csv,
    )

    p = str(tmp_path / "hdr.csv")
    with open(p, "w") as fh:
        fh.write('player,"Goals, total"\n')
        fh.write("name,Gls\n")
        fh.write("Kane,30\n")
    df = read_two_row_header_csv(spark, p)
    assert df.columns == ["player_name", "Goals, total_Gls"]
    assert df.collect() == [("Kane", "30")]
    out = flatten_header_levels(["a", "a", "a_1"], ["", "", ""])
    assert len(set(out)) == len(out), out


def test_compact_mirror_evicts_stale_states(spark, tmp_path):
    """Rewriting a source file must not strand the previous mirror —
    but eviction waits out a grace window first (ADVICE r7: a
    concurrent process may still be scanning the old, previously-
    immutable mirror; yanking it mid-read fails that job). Within the
    window both states coexist; past it, the next build sweeps."""
    import os
    import time

    from etl_football_analytics_pipeline_spark.sources.registry import (
        _COMPACT_ROOT,
        scan_ready_path,
    )

    src = str(tmp_path / "t.parquet")
    spark.range(200_000).write.mode("overwrite").parquet(str(tmp_path / "d"))
    # single-file source: copy one part file
    part = [f for f in os.listdir(str(tmp_path / "d")) if f.endswith(".parquet")][0]
    import shutil as _sh

    _sh.copy(os.path.join(str(tmp_path / "d"), part), src)
    out1 = scan_ready_path(src, 32)
    import hashlib

    phash = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:16]
    src_root = os.path.join(_COMPACT_ROOT, phash)
    if out1 == src:  # source didn't qualify for compaction on this host
        return
    states1 = set(os.listdir(src_root))
    time.sleep(1.1)  # ensure a different mtime second
    os.utime(src)
    out2 = scan_ready_path(src, 32)
    assert out2 != out1
    states2 = set(os.listdir(src_root))
    # the superseded state survives AND is stamped .retired — the
    # grace clock starts at supersession, not at build time, so even
    # an old mirror gets the full window for concurrent scans
    assert states1 < states2 and len(states2) == 2
    (old_state,) = states1
    stamp = os.path.join(src_root, old_state, ".retired")
    assert os.path.exists(stamp)
    # age the STAMP past the window; the next build sweeps the state
    aged = time.time() - 7 * 3600
    os.utime(stamp, (aged, aged))
    time.sleep(1.1)
    os.utime(src)
    out3 = scan_ready_path(src, 32)
    assert out3 != out2
    states3 = set(os.listdir(src_root))
    assert old_state not in states3


def test_local_manifest_tree_refuses_duplicate_top_markers(tmp_path):
    """ADVICE r8: duplicate markers for the top version are the exact
    corruption `manifest.current_manifest` raises on — the os-level
    twin must return None (forcing the Spark-resolution path, which
    raises loudly) instead of silently picking max(token), which could
    validate and reuse the LOSING commit's tree."""
    from etl_football_analytics_pipeline_spark.sources.registry import (
        _local_manifest_tree,
    )

    d = tmp_path / "rel"
    (d / "_manifests").mkdir(parents=True)
    (d / "_manifests" / "v00000001.aaaaaaaaaaaa").touch()
    assert _local_manifest_tree(str(d)).endswith("v00000001-aaaaaaaaaaaa")
    (d / "_manifests" / "v00000001.bbbbbbbbbbbb").touch()
    assert _local_manifest_tree(str(d)) is None
    # a clean higher version resolves again (the duplicate below top
    # is stale residue, not ambiguity about the live tree)
    (d / "_manifests" / "v00000002.cccccccccccc").touch()
    assert _local_manifest_tree(str(d)).endswith("v00000002-cccccccccccc")
