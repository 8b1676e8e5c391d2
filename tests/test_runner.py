"""End-to-end ETL runner: stage chaining, per-stage retries,
short-circuit on failure, and the versioned load landing — the
reference DAG's extract >> transform >> load contract as library code."""

from __future__ import annotations

import os
import tempfile

from etl_football_analytics_pipeline_spark.pipeline.runner import run_etl
from etl_football_analytics_pipeline_spark.sources.versioned import current_version

RAW = "/root/reference/data_raw"


def test_full_chain_runs_and_loads_versioned_warehouse(spark):
    tmp = tempfile.mkdtemp()
    processed, wh = os.path.join(tmp, "processed"), os.path.join(tmp, "warehouse")
    report = run_etl(spark, RAW, processed, wh)
    assert report.ok
    assert [s.name for s in report.stages] == ["transform", "load"]
    assert all(s.attempts == 1 for s in report.stages)
    # every loaded table committed as a v1 snapshot with rows
    for name, rows in report.table_rows.items():
        assert rows > 0, name
        assert current_version(os.path.join(wh, name)) == 1, name
    assert "dim_team" in report.table_rows
    # idempotent re-run: same rows, next version
    report2 = run_etl(spark, RAW, processed, wh)
    assert report2.ok
    assert report2.table_rows == report.table_rows
    assert current_version(os.path.join(wh, "dim_team")) == 2


def test_extract_retries_then_succeeds(spark):
    tmp = tempfile.mkdtemp()
    raw = os.path.join(tmp, "raw")
    os.makedirs(raw)
    calls = {"n": 0}

    def flaky_extract(s, raw_dir):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        # "fetch" = make the raw dir usable by pointing at real CSVs
        for f in os.listdir(RAW):
            if f.endswith(".csv"):
                os.symlink(os.path.join(RAW, f), os.path.join(raw_dir, f))

    report = run_etl(
        spark, raw, os.path.join(tmp, "p"), os.path.join(tmp, "w"),
        extract=flaky_extract, retries=2,
    )
    assert report.ok
    assert report.stages[0].name == "extract" and report.stages[0].attempts == 3
    # checkpoint stamped only after the successful attempt
    assert os.path.exists(os.path.join(raw, ".last_extract_date.txt"))


def test_failed_stage_short_circuits_chain(spark):
    tmp = tempfile.mkdtemp()

    def dead_extract(s, raw_dir):
        raise ConnectionError("down")

    report = run_etl(
        spark, os.path.join(tmp, "raw"), os.path.join(tmp, "p"), os.path.join(tmp, "w"),
        extract=dead_extract, retries=1,
    )
    assert not report.ok
    assert [s.name for s in report.stages] == ["extract"]
    assert report.stages[0].attempts == 2  # first try + 1 retry
    assert "ConnectionError" in report.stages[0].error
    assert report.table_rows == {}
    # no partial landing: transform/load never produced output dirs
    assert not os.path.isdir(os.path.join(tmp, "w"))


def test_corpus_runner_end_to_end(spark, tmp_path):
    """curate → assemble → publish over the sf documents table: all
    stages succeed, every fold lands as a versioned table, and a
    re-run is deterministic (same fold row counts, version advances)."""
    from etl_football_analytics_pipeline_spark.pipeline.corpus_runner import (
        run_corpus_pipeline,
    )
    from etl_football_analytics_pipeline_spark.sources.versioned import (
        current_version,
        read_latest,
    )

    out = str(tmp_path / "corpus_out")
    report = run_corpus_pipeline(
        spark, "/root/testdata/sf0.001/documents.parquet", out,
        min_quality=0.0, seq_len=256,
    )
    assert report.ok, [s.error for s in report.stages if not s.ok]
    assert [s.name for s in report.stages] == ["curate", "assemble", "publish"]
    folds = {"train", "val", "test", "decontam", "train_packed"}
    assert folds <= set(report.table_rows)
    assert report.table_rows["train"] > 0
    # published tables are readable snapshots
    train = read_latest(spark, f"{out}/train")
    assert train.count() == report.table_rows["train"]
    v1 = current_version(f"{out}/train")
    # deterministic re-run: identical fold sizes, version advances
    report2 = run_corpus_pipeline(
        spark, "/root/testdata/sf0.001/documents.parquet", out,
        min_quality=0.0, seq_len=256,
    )
    assert report2.ok
    assert report2.table_rows == report.table_rows
    assert current_version(f"{out}/train") > v1
