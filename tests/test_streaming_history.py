"""Streaming SCD2 sink (streaming/history.py): a file stream of change
observations maintains the same Type-2 history the batch tier builds."""

from __future__ import annotations

import datetime as dt

from etl_football_analytics_pipeline_spark.streaming.history import scd2_sink


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


SCHEMA = "team_id int, stadium string, ts timestamp, src_id int"


def _run_stream(spark, in_dir: str, table_dir: str, ckpt: str) -> None:
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        stream.writeStream.foreachBatch(
            scd2_sink(table_dir, ["team_id"], ["stadium"], "ts", "src_id")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_scd2_stream_matches_batch_history(spark, tmp_path):
    from etl_football_analytics_pipeline_spark.sources.versioned import read_latest

    in_dir, table_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "dim"),
        str(tmp_path / "ckpt"),
    )
    # batch 1 (bootstrap — multi-state key keeps full history)
    spark.createDataFrame(
        [
            (1, "home_a", _ts(1), 1),
            (1, "home_b", _ts(3), 2),  # team 1 moves within the backfill
            (2, "home_c", _ts(2), 3),
        ],
        SCHEMA,
    ).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, table_dir, ckpt)
    dim = read_latest(spark, table_dir)
    rows = {(r.team_id, r.version): r for r in dim.collect()}
    assert len(rows) == 3
    assert not rows[(1, 1)].is_current and rows[(1, 1)].effective_to == _ts(3)
    assert rows[(1, 2)].is_current and rows[(1, 2)].stadium == "home_b"
    # batch 2: team 2 moves at its OWN change time; team 3 appears
    spark.createDataFrame(
        [(2, "home_x", _ts(5), 4), (3, "home_y", _ts(6), 5)], SCHEMA
    ).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, table_dir, ckpt)
    dim = read_latest(spark, table_dir)
    rows = {(r.team_id, r.version): r for r in dim.collect()}
    assert len(rows) == 5
    closed = rows[(2, 1)]
    assert not closed.is_current and closed.effective_to == _ts(5)  # per-row ts
    assert rows[(2, 2)].is_current and rows[(2, 2)].effective_from == _ts(5)
    assert rows[(3, 1)].is_current and rows[(3, 1)].effective_from == _ts(6)


def test_scd2_stream_batch_replay_is_idempotent(spark, tmp_path):
    from etl_football_analytics_pipeline_spark.sources.versioned import read_latest

    in_dir, table_dir = str(tmp_path / "in"), str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "a", _ts(1), 1), (2, "b", _ts(2), 2)], SCHEMA
    ).write.mode("append").parquet(in_dir)
    _run_stream(spark, in_dir, table_dir, str(tmp_path / "ck1"))
    before = sorted(map(tuple, read_latest(spark, table_dir).collect()))
    # a fresh checkpoint replays the same files — the history must not
    # gain rows or versions (apply sees unchanged states)
    _run_stream(spark, in_dir, table_dir, str(tmp_path / "ck2"))
    after = sorted(map(tuple, read_latest(spark, table_dir).collect()))
    assert after == before


def test_expectations_sink_splits_and_reports(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_football_analytics_pipeline_spark.streaming.quality import (
        expectations_sink,
    )

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, 50.0)], "id int, v double"
    ).write.mode("append").parquet(in_dir)
    rules = lambda: {"pos": F.col("v") > 0, "small": F.col("v") < 10}  # noqa: E731
    stream = spark.readStream.schema("id int, v double").parquet(in_dir)
    q = (
        stream.writeStream.foreachBatch(expectations_sink(out_dir, rules))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    valid = spark.read.parquet(f"{out_dir}/valid")
    quar = spark.read.parquet(f"{out_dir}/quarantine")
    rep = spark.read.parquet(f"{out_dir}/report")
    assert [r.id for r in valid.collect()] == [1]
    assert {r.id: sorted(r.violations) for r in quar.collect()} == {
        2: ["pos"],
        3: ["small"],
    }
    got = {r.rule: r.n_violations for r in rep.collect()}
    assert got == {"pos": 1, "small": 1}
    # replay with a fresh checkpoint: batch-id partitioning overwrites,
    # never duplicates
    q = (
        spark.readStream.schema("id int, v double")
        .parquet(in_dir)
        .writeStream.foreachBatch(expectations_sink(out_dir, rules))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(f"{out_dir}/valid").count() == 1
