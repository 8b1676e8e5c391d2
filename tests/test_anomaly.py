"""trailing_zscore: baseline exclusion, history gating, determinism."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.anomaly import trailing_zscore


def _series(spark, vals, key="a"):
    rows = [
        (key, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "k string, bucket timestamp, x double")


def test_zscore_values_and_gates(spark):
    import statistics

    vals = [10, 10, 10, 10, 100]  # constant history then a spike
    df = trailing_zscore(_series(spark, vals), "bucket", ["k"], "x", lookback=24)
    rows = sorted(df.collect(), key=lambda r: r.bucket)
    # bucket 0: no history -> NULL; bucket 1: one point -> NULL (min_history)
    assert rows[0].zscore is None and rows[1].zscore is None
    # buckets 2-4: history is flat (stddev 0) -> NULL, including the spike
    assert rows[2].zscore is None and rows[3].zscore is None and rows[4].zscore is None
    # non-flat history scores: [10, 20, 30] then 60
    vals2 = [10, 20, 30, 60]
    rows2 = sorted(
        trailing_zscore(_series(spark, vals2), "bucket", ["k"], "x").collect(),
        key=lambda r: r.bucket,
    )
    mu = statistics.mean([10, 20, 30])
    sd = statistics.stdev([10, 20, 30])
    assert rows2[3].zscore == round((60 - mu) / sd, 4)
    # the current bucket is excluded from its own baseline: z of bucket 2
    # uses [10, 20] only
    assert rows2[2].zscore == round(
        (30 - statistics.mean([10, 20])) / statistics.stdev([10, 20]), 4
    )


def test_zscore_per_key_and_deterministic(spark):
    a = _series(spark, [1, 2, 3, 4, 50], key="a")
    b = _series(spark, [5, 5, 5, 5, 5], key="b")
    df = a.unionByName(b)
    r1 = sorted(map(tuple, trailing_zscore(df, "bucket", ["k"], "x").collect()))
    r2 = sorted(map(tuple, trailing_zscore(df.repartition(7), "bucket", ["k"], "x").collect()))
    assert r1 == r2
    zs = {(r[0], r[1]): r[3] for r in r1}
    assert all(v is None for (k, _), v in zs.items() if k == "b")  # flat key
    with pytest.raises(ValueError):
        trailing_zscore(df, "bucket", ["k"], "x", lookback=1, min_history=2)


def test_decayed_sum_halving_and_anchors(spark):
    from etl_football_analytics_pipeline_spark.operators.anomaly import decayed_sum

    rows = [
        # key a: events 0h, 24h, 48h with value 1 each (half_life 1 day)
        ("a", dt.datetime(2024, 1, 1, 0), 1.0),
        ("a", dt.datetime(2024, 1, 2, 0), 1.0),
        ("a", dt.datetime(2024, 1, 3, 0), 1.0),
        # key b: single old event — per-key anchor gives it weight 1
        ("b", dt.datetime(2023, 1, 1, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    got = {r.k: r for r in decayed_sum(df, ["k"], "ts", "x", "1 day").collect()}
    assert got["a"].decayed_sum == pytest.approx(1.0 + 0.5 + 0.25, abs=1e-9)
    assert got["a"].t_reference == dt.datetime(2024, 1, 3)
    assert got["b"].decayed_sum == pytest.approx(5.0, abs=1e-9)
    # explicit global anchor: key b's weight collapses toward zero
    anchored = {
        r.k: r.decayed_sum
        for r in decayed_sum(
            df, ["k"], "ts", "x", "1 day", reference_ts="2024-01-03 00:00:00"
        ).collect()
    }
    assert anchored["b"] == pytest.approx(0.0, abs=1e-6)
    assert anchored["a"] == pytest.approx(1.0 + 0.5 + 0.25, abs=1e-9)


def test_decayed_sum_deterministic_within_tolerance(spark):
    from etl_football_analytics_pipeline_spark.operators.anomaly import decayed_sum

    rows = [
        ("k", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(i % 7))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    a = decayed_sum(df, ["k"], "ts", "x", "6 hours").collect()[0].decayed_sum
    b = decayed_sum(df.repartition(13), ["k"], "ts", "x", "6 hours").collect()[0].decayed_sum
    assert a == pytest.approx(b, rel=1e-12)
    with pytest.raises(Exception):
        decayed_sum(df, ["k"], "ts", "x", "-1 day").collect()


def test_decayed_sum_exact_values_and_partitioning_independence(spark):
    """The deterministic power-of-two tier: bit-identical under any
    layout (integer/decimal arithmetic end to end), exact hand-checked
    weights, horizon + future events excluded."""
    from etl_football_analytics_pipeline_spark.operators.anomaly import (
        decayed_sum_exact,
    )

    rows = [
        ("a", dt.datetime(2024, 1, 30, 12), 10.00),   # k=0 → w=1
        ("a", dt.datetime(2024, 1, 29, 12), 10.00),   # k=1 → w=1/2
        ("a", dt.datetime(2024, 1, 28, 12), 4.00),    # k=2 → w=1/4
        ("a", dt.datetime(2020, 1, 1, 0), 99.0),      # beyond horizon → dropped
        ("a", dt.datetime(2024, 2, 5, 0), 99.0),      # after anchor → dropped
        ("b", dt.datetime(2024, 1, 30, 23, 59), 7.77),  # k=0
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    out = {
        r.k: r
        for r in decayed_sum_exact(
            df, ["k"], "ts", "x", "2024-01-31 00:00:00"
        ).collect()
    }
    assert out["a"].n_events == 3
    assert out["a"].decayed_sum == pytest.approx(10.0 + 5.0 + 1.0, abs=0)
    assert out["b"].decayed_sum == pytest.approx(7.77, abs=0)
    again = {
        r.k: r.decayed_sum
        for r in decayed_sum_exact(
            df.repartition(13), ["k"], "ts", "x", "2024-01-31 00:00:00"
        ).collect()
    }
    assert {k: v.decayed_sum for k, v in out.items()} == again
    with pytest.raises(ValueError):
        decayed_sum_exact(df, ["k"], "ts", "x", "2024-01-31", horizon_days=500)


def test_decayed_sum_exact_tracks_continuous_form(spark):
    """On day-aligned events the power-of-two tier IS the continuous
    halving sum — the deterministic tier approximates, not replaces,
    the library op."""
    from etl_football_analytics_pipeline_spark.operators.anomaly import (
        decayed_sum,
        decayed_sum_exact,
    )

    rows = [
        ("k", dt.datetime(2024, 1, 28, 0), 8.0),
        ("k", dt.datetime(2024, 1, 29, 0), 8.0),
        ("k", dt.datetime(2024, 1, 30, 0), 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    cont = decayed_sum(
        df, ["k"], "ts", "x", "1 day", reference_ts="2024-01-30 00:00:00"
    ).collect()[0].decayed_sum
    ex = decayed_sum_exact(
        df, ["k"], "ts", "x", "2024-01-30 00:00:00"
    ).collect()[0].decayed_sum
    assert ex == pytest.approx(cont, abs=1e-4)
    assert ex == pytest.approx(8.0 + 4.0 + 2.0, abs=0)


def test_decayed_sum_exact_overflow_raises_not_null(spark):
    """DECIMAL(38,0) headroom is enforced, not assumed: under Spark's
    default non-ANSI semantics an overflowing term would silently
    become NULL and the key's decayed_sum would come back NULL; the
    guard must instead raise the moment a per-(key, day) scaled sum
    exceeds the provable bound."""
    from etl_football_analytics_pipeline_spark.operators.anomaly import (
        decayed_sum_exact,
    )

    rows = [("a", dt.datetime(2024, 1, 30, 12), 1.0e7)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    # horizon 35: scaled sum 1e9 is deep inside headroom — exact value
    ok = decayed_sum_exact(df, ["k"], "ts", "x", "2024-01-31 00:00:00").collect()
    assert ok[0].decayed_sum == pytest.approx(1.0e7, abs=0)
    # horizon 90: bound is (10^38-1)/2^90/91 ~ 8.9e8 < 1e9 — must raise
    with pytest.raises(Exception, match="headroom"):
        decayed_sum_exact(
            df, ["k"], "ts", "x", "2024-01-31 00:00:00", horizon_days=90
        ).collect()


def test_decayed_sum_exact_null_values_propagate(spark):
    """An all-NULL (key, day) value group must keep yielding a NULL
    decayed_sum (nulls are data), not trip the overflow assert."""
    from etl_football_analytics_pipeline_spark.operators.anomaly import (
        decayed_sum_exact,
    )

    rows = [
        ("a", dt.datetime(2024, 1, 30, 12), None),
        ("b", dt.datetime(2024, 1, 30, 12), 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    out = {
        r.k: r
        for r in decayed_sum_exact(
            df, ["k"], "ts", "x", "2024-01-31 00:00:00"
        ).collect()
    }
    assert out["a"].decayed_sum is None
    assert out["b"].decayed_sum == pytest.approx(2.0, abs=0)
