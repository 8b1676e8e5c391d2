"""S6/S7 ingestion adapters — offline tests with fake fetchers; the
row-assembly semantics mirror the reference scrape exactly."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.sources.ingest import (
    STANDINGS_COLUMNS,
    ingest_table,
    ingest_with_raw_merge,
    standings_rows,
)

VALUES = [str(v) for v in range(21)]  # 3 complete 7-wide rows


def test_standings_rows_chunking_and_padding():
    rows = standings_rows(
        season="2024-2025",
        category="all",
        ranks=["1", "2"],  # shorter than teams — pads ""
        teams=["Alpha", "Beta", "Gamma"],
        values=VALUES[:16],  # 2 complete rows + 1 ragged (2 values)
        recent_forms=["WWDLW"],
    )
    assert len(rows) == 3
    assert rows[0]["mp"] == "0" and rows[0]["pts"] == "6" and rows[0]["rank"] == "1"
    assert rows[1]["recent_form"] == ""  # forms list shorter
    assert rows[2]["rank"] == ""  # ranks list shorter
    assert rows[2]["mp"] == "14" and rows[2]["w"] == "15" and rows[2]["d"] == ""  # ragged pad
    assert list(rows[0]) == STANDINGS_COLUMNS


def test_standings_rows_drop_beyond_teams():
    rows = standings_rows("s", "home", ["1"], ["OnlyTeam"], VALUES, [])
    assert len(rows) == 1  # extra value chunks with no team are dropped


def test_ingest_table_retries_then_succeeds(spark):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}]

    df = ingest_table(spark, flaky, "k long, v string")
    assert calls["n"] == 3
    assert sorted(tuple(r) for r in df.collect()) == [(1, "a"), (2, "b")]


def test_ingest_table_raises_after_exhausted_retries(spark):
    def dead():
        raise ConnectionError("down")

    with pytest.raises(RuntimeError, match="fetch failed"):
        ingest_table(spark, dead, "k long", max_retries=2)


def test_ingest_with_raw_merge_new_wins_and_idempotent(spark):
    path = os.path.join(tempfile.mkdtemp(), "raw_table")
    first = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    out1 = ingest_with_raw_merge(first, path, ["k"])
    assert sorted(tuple(r) for r in out1.collect()) == [(1, "a"), (2, "b")]
    second = spark.createDataFrame([(2, "B2"), (3, "c")], "k long, v string")
    out2 = ingest_with_raw_merge(second, path, ["k"])
    assert sorted(tuple(r) for r in out2.collect()) == [(1, "a"), (2, "B2"), (3, "c")]
    again = ingest_with_raw_merge(second, path, ["k"])
    assert sorted(tuple(r) for r in again.collect()) == [(1, "a"), (2, "B2"), (3, "c")]
    assert not os.path.isdir(path + ".__stage") and not os.path.isdir(path + ".__old")


def test_raw_merge_recovers_crash_between_renames(spark):
    """A crash between the swap's two renames leaves the target absent
    and `.__old` holding the last complete table. The next merge must
    recover it — NOT silently rebuild from the delta alone."""
    path = os.path.join(tempfile.mkdtemp(), "raw_table")
    first = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    ingest_with_raw_merge(first, path, ["k"])
    # simulate the crash point: live dir retired, stage never moved in
    os.rename(path, path + ".__old")
    delta = spark.createDataFrame([(3, "c")], "k long, v string")
    out = ingest_with_raw_merge(delta, path, ["k"])
    assert sorted(tuple(r) for r in out.collect()) == [(1, "a"), (2, "b"), (3, "c")]
    assert not os.path.isdir(path + ".__old")


def test_raw_merge_survives_stale_retired_dir(spark):
    """A crash AFTER the swap can leave a stale non-empty `.__old`
    alongside a live target; the next swap must clear it instead of
    failing with ENOTEMPTY on os.rename."""
    import shutil

    path = os.path.join(tempfile.mkdtemp(), "raw_table")
    first = spark.createDataFrame([(1, "a")], "k long, v string")
    ingest_with_raw_merge(first, path, ["k"])
    shutil.copytree(path, path + ".__old")  # stale retired copy + live target
    delta = spark.createDataFrame([(2, "b")], "k long, v string")
    out = ingest_with_raw_merge(delta, path, ["k"])
    assert sorted(tuple(r) for r in out.collect()) == [(1, "a"), (2, "b")]
    assert not os.path.isdir(path + ".__old")
