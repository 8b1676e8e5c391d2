"""End-to-end Structured Streaming tests.

Each test runs a real `readStream` over the events parquet with
`trigger(availableNow=True)` and compares the streamed result with the
batch plan of the SAME function body — the engine's batch/stream
unification contract (streaming/windowed.py docstring).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.sources.registry import load_table
from etl_football_analytics_pipeline_spark.streaming.windowed import (
    dedup_within_watermark,
    merge_sink,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

SF = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in row) for row in df.select(*cols).collect())


def _run_stream_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture()
def events_stream(spark):
    return stream_events(spark, SF, watermark="2 hours")


def test_stream_source_rows_match_batch(spark, events_stream):
    """The readStream source must see exactly the batch rows (incl. the
    ns→µs timestamp conversion)."""
    tmp = tempfile.mkdtemp(prefix="stream_rows_")
    try:
        q = (
            events_stream.writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = spark.read.parquet(f"{tmp}/out")
        batch = load_table(spark, SF, "events")
        assert streamed.count() == batch.count()
        a = sorted(streamed.select("event_id", "ts").collect())
        b = sorted(batch.select("event_id", "ts").collect())
        assert a == b
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_tumbling_stream_equals_batch(spark, events_stream):
    streamed = _run_stream_to_memory(
        spark, tumbling_agg(events_stream, "1 hour"), "tumbling_mem"
    )
    batch = tumbling_agg(load_table(spark, SF, "events"), "1 hour")
    assert _canon(streamed) == _canon(batch)


def test_sliding_stream_equals_batch(spark, events_stream):
    streamed = _run_stream_to_memory(
        spark, sliding_agg(events_stream, "1 hour", "30 minutes"), "sliding_mem"
    )
    batch = sliding_agg(load_table(spark, SF, "events"), "1 hour", "30 minutes")
    assert _canon(streamed) == _canon(batch)


def test_session_stream_equals_batch(spark, events_stream):
    streamed = _run_stream_to_memory(
        spark, session_agg(events_stream, "30 minutes"), "session_mem"
    )
    batch = session_agg(load_table(spark, SF, "events"), "30 minutes")
    assert _canon(streamed) == _canon(batch)


def test_stream_dedup_drops_duplicate_keys(spark):
    """A stream carrying each event twice must come out with each key
    exactly once."""
    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        batch = load_table(spark, SF, "events").limit(500)
        doubled = batch.unionByName(batch)
        doubled.write.mode("overwrite").parquet(f"{tmp}/in")
        sdf = (
            spark.readStream.schema(doubled.schema).parquet(f"{tmp}/in")
            .withWatermark("ts", "10 minutes")
        )
        deduped = dedup_within_watermark(sdf, ["event_id"])
        q = (
            deduped.writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.read.parquet(f"{tmp}/out")
        assert out.count() == 500
        assert out.select("event_id").distinct().count() == 500
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_foreach_batch_merge_sink_idempotent_by_key(spark):
    """The foreachBatch MERGE sink must upsert by key: streaming the
    same data into the target twice leaves exactly one row per key
    (the reference's `scr/Extract.py:262-303` semantics)."""
    tmp = tempfile.mkdtemp(prefix="stream_merge_")
    try:
        src = load_table(spark, SF, "events").limit(200)
        src.write.mode("overwrite").parquet(f"{tmp}/in")
        target = f"{tmp}/target"
        for run in range(2):
            sdf = spark.readStream.schema(src.schema).parquet(f"{tmp}/in")
            q = (
                sdf.writeStream.foreachBatch(merge_sink(target, ["event_id"], f"{tmp}/ckpt{run}"))
                .option("checkpointLocation", f"{tmp}/ckpt{run}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        out = spark.read.parquet(target)
        assert out.count() == 200
        assert out.select("event_id").distinct().count() == 200
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-stream join (streaming.join.stream_stream_join)
# ---------------------------------------------------------------------------


def _write_one_file(df, path, mtime):
    """Write df as a single parquet file and pin its mtime (the file
    source orders batches by mtime; under load two writes can land in
    the same clock tick and flip batch order)."""
    import glob
    import os

    df.coalesce(1).write.mode("overwrite").parquet(path)
    for f in glob.glob(f"{path}/*.parquet"):
        os.utime(f, (mtime, mtime))


def test_stream_stream_inner_join_equals_batch(spark):
    """Watermarked inner stream-stream join (views x purchases within
    1 hour per user) must emit exactly the batch join's rows."""
    from etl_football_analytics_pipeline_spark.streaming.join import (
        stream_stream_join,
    )

    tmp = tempfile.mkdtemp(prefix="ss_join_")
    try:
        ev = load_table(spark, SF, "events")
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("event_id").alias("view_id")
        )
        buys = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("buy_id"), "value"
        )
        batch = stream_stream_join(
            views, buys, on=["user_id"], within="1 hour"
        )
        _write_one_file(views, f"{tmp}/l", 1_000_000)
        _write_one_file(buys, f"{tmp}/r", 1_000_000)
        sl = (
            spark.readStream.schema(views.schema).parquet(f"{tmp}/l")
            .withWatermark("ts", "2 hours")
        )
        sr = (
            spark.readStream.schema(buys.schema).parquet(f"{tmp}/r")
            .withWatermark("ts", "2 hours")
        )
        sj = stream_stream_join(sl, sr, on=["user_id"], within="1 hour")
        q = (
            sj.writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = spark.read.parquet(f"{tmp}/out")
        assert batch.count() > 0
        assert _canon(streamed) == _canon(batch)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_stream_left_outer_join_equals_batch(spark):
    """Left-outer stream-stream join: NULL-padded rows for unmatched
    views may only emit once the right watermark proves no match can
    arrive — a far-future sentinel file (second microbatch) advances
    both watermarks past every real event, so the streamed result must
    equal the batch left join exactly."""
    from etl_football_analytics_pipeline_spark.streaming.join import (
        stream_stream_join,
    )

    tmp = tempfile.mkdtemp(prefix="ss_louter_")
    try:
        ev = load_table(spark, SF, "events").filter(F.col("user_id") <= 200)
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("event_id").alias("view_id")
        )
        buys = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("buy_id"), "value"
        )
        batch = stream_stream_join(
            views, buys, on=["user_id"], within="1 hour", how="leftOuter"
        )
        far = "2100-01-01 00:00:00"
        sent_l = spark.sql(
            f"SELECT CAST(-1 AS BIGINT) user_id, TIMESTAMP'{far}' ts,"
            " CAST(-1 AS BIGINT) view_id"
        )
        sent_r = spark.sql(
            f"SELECT CAST(-1 AS BIGINT) user_id, TIMESTAMP'{far}' ts,"
            " CAST(-1 AS BIGINT) buy_id, CAST(0.0 AS DOUBLE) value"
        )
        _write_one_file(views, f"{tmp}/l/b0", 1_000_000)
        _write_one_file(sent_l, f"{tmp}/l/b1", 1_000_100)
        _write_one_file(buys, f"{tmp}/r/b0", 1_000_000)
        _write_one_file(sent_r, f"{tmp}/r/b1", 1_000_100)
        sl = (
            spark.readStream.schema(views.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(f"{tmp}/l")
            .withWatermark("ts", "1 minute")
        )
        sr = (
            spark.readStream.schema(buys.schema)
            .option("recursiveFileLookup", "true")
            .parquet(f"{tmp}/r")
            .withWatermark("ts", "1 minute")
        )
        sj = stream_stream_join(
            sl, sr, on=["user_id"], within="1 hour", how="leftOuter"
        )
        q = (
            sj.writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = spark.read.parquet(f"{tmp}/out").filter(
            F.col("user_id") >= 0
        )
        n_unmatched = batch.filter(F.col("buy_id").isNull()).count()
        assert n_unmatched > 0  # the outer semantics are actually exercised
        assert _canon(streamed) == _canon(batch)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_merge_sink_batch_repeating_key_keeps_one_survivor(spark, tmp_path):
    """A micro-batch carrying two rows for one key (two updates of the
    same entity in a single trigger) must leave the target key-unique
    with the deterministic survivor (lowest by non-key columns), not
    two rows — merge_replace passes duplicate source keys through by
    contract, so the sink dedups first."""
    target = f"{tmp_path}/tgt"
    sink = merge_sink(target, ["event_id"], f"{tmp_path}/ckpt")
    first = spark.createDataFrame(
        [(1, "old", 1.0)], "event_id long, event_type string, value double"
    )
    sink(first, 0)
    dup = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", 9.0), (2, "c", 2.0)],
        "event_id long, event_type string, value double",
    )
    sink(dup, 1)
    rows = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert rows == [(1, "a", 5.0), (2, "c", 2.0)]
    sink(dup, 1)  # replay: idempotent
    rows2 = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert rows2 == rows


def test_merge_sink_order_col_keeps_latest(spark, tmp_path):
    """ADVICE r7: the default lowest-by-attrs survivor can keep the
    OLDER payload when a trigger carries two updates of one key. With
    order_col, the HIGHEST event-time row wins (NULL loses to any real
    time), which is what multi-update batches mean."""
    target = f"{tmp_path}/tgt"
    sink = merge_sink(target, ["event_id"], f"{tmp_path}/ckpt", order_col="ts")
    batch = spark.createDataFrame(
        [
            (1, "newer", 30),
            (1, "older", 10),
            (1, None, None),  # null event time never beats a real one
            (2, "only", 5),
        ],
        "event_id long, payload string, ts int",
    )
    sink(batch, 0)
    rows = sorted(
        (r.event_id, r.payload)
        for r in spark.read.parquet(target).collect()
    )
    assert rows == [(1, "newer"), (2, "only")]
    # replay stays idempotent
    sink(batch, 0)
    assert sorted(
        (r.event_id, r.payload)
        for r in spark.read.parquet(target).collect()
    ) == rows


def test_merge_sink_tolerates_unorderable_map_columns(spark, tmp_path):
    """ADVICE r7: a batch carrying a map column must not crash the
    dedup sort — unorderable types are excluded from the tiebreak (the
    orderable columns still decide the survivor)."""
    target = f"{tmp_path}/tgt"
    sink = merge_sink(target, ["k"], f"{tmp_path}/ckpt")
    batch = spark.createDataFrame(
        [(1, "a", {"x": 1}), (1, "b", {"y": 2})],
        "k long, v string, m map<string,int>",
    )
    sink(batch, 0)  # previously: AnalysisException on the map sort
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 1 and rows[0].v == "a"  # lowest orderable attr
    # a batch with ONLY unorderable non-key columns still dedups
    target2 = f"{tmp_path}/tgt2"
    sink2 = merge_sink(target2, ["k"], f"{tmp_path}/ckpt2")
    only_map = spark.createDataFrame(
        [(1, {"x": 1}), (1, {"x": 1})], "k long, m map<string,int>"
    )
    sink2(only_map, 0)
    assert spark.read.parquet(target2).count() == 1


def test_merge_sink_manifest_mode_object_store_path(spark, tmp_path):
    """use_manifest=True commits each batch through the manifest
    pointer — no renames, so the per-batch commit is object-store-
    atomic. Exercised over a file:// URI (the Hadoop-FS code path an
    s3a:// target would take); readers resolve via read_relation."""
    from etl_football_analytics_pipeline_spark.manifest import (
        manifest_versions,
        read_relation,
    )

    target = f"file://{tmp_path}/tgt"
    sink = merge_sink(
        target, ["k"], f"{tmp_path}/ckpt", spark=spark, use_manifest=True
    )
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink(b1, 0)
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    sink(b2, 1)
    rows = sorted(map(tuple, read_relation(spark, target).collect()))
    assert rows == [(1, "a"), (2, "B"), (3, "c")]
    # replay: idempotent by key
    sink(b2, 1)
    assert sorted(map(tuple, read_relation(spark, target).collect())) == rows
    # keep=1 retention: exactly one live version on disk
    assert len(manifest_versions(spark, target)) == 1


def test_merge_sink_rejects_key_order_col(tmp_path):
    """An order_col that is also a key is constant within each key
    partition — refuse at sink construction (ADVICE r8), before any
    stream starts."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key column"):
        merge_sink(f"{tmp_path}/tgt", ["event_id"], f"{tmp_path}/ckpt",
                   order_col="event_id")


def test_merge_sink_refuses_manifest_target_without_flag(spark, tmp_path):
    """ADVICE r8: a target previously converted to the manifest layout
    holds only _-prefixed children, so the rename-swap branch failed
    every batch with Spark's opaque 'Unable to infer schema'. The sink
    must refuse with an explicit protocol-mismatch error instead."""
    import pytest as _pytest

    target = f"{tmp_path}/tgt"
    batch = spark.createDataFrame([(1, "a")], "event_id long, v string")
    manifest_sink = merge_sink(target, ["event_id"], f"{tmp_path}/ck1",
                               use_manifest=True)
    manifest_sink(batch, 0)
    plain_sink = merge_sink(target, ["event_id"], f"{tmp_path}/ck2")
    with _pytest.raises(IOError, match="use_manifest=True"):
        plain_sink(batch, 1)
