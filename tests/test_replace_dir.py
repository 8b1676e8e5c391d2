"""replace_dir — the durable sibling-write + rename swap every index
compaction (and merge_into_raw's full-replace path) rewrites through.

The properties under test are the failure-mode ones the in-place
``mode("overwrite")`` rewrite lacked: the source dir is never truncated
before the replacement is durable parquet, a writer failure leaves the
old data untouched, and leftovers from a crashed prior run can't poison
the swap (ADVICE r6: operators/text.py:1042)."""

from __future__ import annotations

import os

import pytest

from etl_football_analytics_pipeline_spark.operators.tombstones import replace_dir


def test_replace_dir_swaps_and_cleans_leftovers(spark, tmp_path):
    dest = f"{tmp_path}/rel"
    spark.range(5).write.parquet(dest)
    # stale sibling dirs from a crashed prior run must not poison the swap
    os.makedirs(f"{dest}.__new/junk")
    os.makedirs(f"{dest}.__old/junk")
    replace_dir(spark, dest, lambda p: spark.range(7).write.parquet(p))
    assert spark.read.parquet(dest).count() == 7
    assert not os.path.exists(f"{dest}.__new")
    assert not os.path.exists(f"{dest}.__old")


def test_replace_dir_replacement_can_read_the_source(spark, tmp_path):
    """The canonical compaction shape: the replacement plan READS the
    dir being replaced — no checkpoint needed, because the source is
    only renamed away after the sibling write completed."""
    dest = f"{tmp_path}/rel"
    spark.range(10).write.parquet(dest)
    survivors = spark.read.parquet(dest).filter("id < 4")
    replace_dir(spark, dest, lambda p: survivors.write.parquet(p))
    assert spark.read.parquet(dest).count() == 4


def test_replace_dir_failed_write_leaves_dest_intact(spark, tmp_path):
    dest = f"{tmp_path}/rel"
    spark.range(9).write.parquet(dest)

    def boom(p):
        raise RuntimeError("writer failed")

    with pytest.raises(RuntimeError, match="writer failed"):
        replace_dir(spark, dest, boom)
    assert spark.read.parquet(dest).count() == 9

    def empty(p):  # a writer that produced nothing must also not swap
        pass

    with pytest.raises(IOError, match="produced nothing"):
        replace_dir(spark, dest, empty)
    assert spark.read.parquet(dest).count() == 9


def test_replace_dir_creates_missing_dest(spark, tmp_path):
    """First-write path (merge_into_raw on a fresh table): no dest to
    rename away."""
    dest = f"{tmp_path}/fresh"
    replace_dir(spark, dest, lambda p: spark.range(3).write.parquet(p))
    assert spark.read.parquet(dest).count() == 3


def test_replace_dir_recovers_between_renames_crash(spark, tmp_path):
    """The between-renames crash state (dest absent, old copy at
    .__old, finished replacement at .__new) must restore the old copy
    first, NOT delete it as a leftover — the retry then redoes the
    replacement from the recovered source."""
    dest = f"{tmp_path}/rel"
    spark.range(6).write.parquet(f"{dest}.__old")   # last complete copy
    spark.range(2).write.parquet(f"{dest}.__new")   # orphaned replacement
    survivors = None

    def write(p):
        nonlocal survivors
        survivors = spark.read.parquet(dest).filter("id < 5").collect()
        spark.read.parquet(dest).filter("id < 5").write.parquet(p)

    replace_dir(spark, dest, write)
    assert len(survivors) == 5  # writer saw the RECOVERED old copy
    assert spark.read.parquet(dest).count() == 5
    assert not os.path.exists(f"{dest}.__new")
    assert not os.path.exists(f"{dest}.__old")
