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
