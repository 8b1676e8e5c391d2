"""applyInPandasWithState: per-key state must carry across micro-batches
and the final running totals must equal the batch aggregate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.sources.registry import load_table
from etl_football_analytics_pipeline_spark.streaming.stateful import running_user_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    """events split into two parquet files so maxFilesPerTrigger=1
    yields two micro-batches — state genuinely crosses a batch
    boundary."""
    base = str(tmp_path_factory.mktemp("ev"))
    ev = load_table(spark, SF, "events").filter(F.col("user_id") <= 50)
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(base + "/f1")
    second.coalesce(1).write.mode("overwrite").parquet(base + "/f2")
    import glob
    import shutil

    files = sorted(glob.glob(base + "/f*/part-*.parquet"))
    assert len(files) == 2
    stream_dir = base + "/stream"
    import os

    os.makedirs(stream_dir)
    for i, f in enumerate(files):
        shutil.copy(f, f"{stream_dir}/batch{i}.parquet")
    return stream_dir, ev


def test_state_carries_across_microbatches(spark, split_events, tmp_path):
    stream_dir, ev = split_events
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        running_user_stats(stream)
        .writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    updates = spark.read.parquet(out_dir)
    # a user present in both files emits two updates with growing totals
    multi = (
        updates.groupBy("user_id").count().filter(F.col("count") >= 2).limit(1).collect()
    )
    assert multi, "no user spanned both micro-batches"
    # the LAST update per user equals the one-shot batch aggregate
    last = updates.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value")).alias("s")
    )
    final = {
        r.user_id: (r.s.n_events, round(r.s.total_value, 6)) for r in last.collect()
    }
    expected = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in running_user_stats(ev).collect()
    }
    assert final == expected


def test_transform_with_state_first_seen(spark, split_events, tmp_path):
    """transformWithState (Spark 4 native API): exactly one emission
    per key across micro-batches; the emitted first_event_id for keys
    whose rows all arrive in batch 1 equals the batch min."""
    from etl_football_analytics_pipeline_spark.streaming.stateful import (
        first_seen_per_user,
    )

    stream_dir, ev = split_events
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        out_dir = str(tmp_path / "fs_out")
        ckpt = str(tmp_path / "fs_ckpt")
        try:
            q = (
                first_seen_per_user(stream)
                .writeStream.foreachBatch(
                    lambda batch, _id: batch.write.mode("append").parquet(out_dir)
                )
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(240)
        except Exception as exc:  # noqa: BLE001
            msg = str(exc)
            if (
                "INITIALIZATION" in msg
                or "protobuf" in msg
                or "driver worker exited" in msg
            ):
                # transformWithState's python runner requires protobuf,
                # which this container lacks (same class of boundary as
                # the multimodal codec stubs); the batch path and the
                # plan construction above are still exercised.
                batch = {r.user_id: r.first_event_id for r in first_seen_per_user(ev).collect()}
                assert batch  # batch tier works
                pytest.skip("transformWithState python runner unavailable (no protobuf)")
            raise
        got = spark.read.parquet(out_dir).collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    # exactly one row per user, covering every user in the data
    users = [r.user_id for r in got]
    assert len(users) == len(set(users))
    batch = {r.user_id: r.first_event_id for r in first_seen_per_user(ev).collect()}
    assert set(users) == set(batch)
    # keys first seen in micro-batch 0 (even event ids) emit the min
    # even id; keys seen only later emit their true global min
    import pyspark.sql.functions as F  # noqa: N812

    by_user_even_min = {
        r.user_id: r.m
        for r in ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("user_id")
        .agg(F.min("event_id").alias("m"))
        .collect()
    }
    got_map = {r.user_id: r.first_event_id for r in got}
    for u, first_id in got_map.items():
        expected = by_user_even_min.get(u, batch[u])
        assert first_id == expected, (u, first_id, expected)
