"""As-of join tests: value-for-value parity with DuckDB's native
ASOF JOIN over the events table, plus tolerance and determinism."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.asof import asof_join
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").cache()


def _duck_asof(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con.execute(sql).fetchall()


def test_asof_matches_duckdb_native(spark, events):
    """Each 'click' event gains the latest same-user 'view' event at or
    before it — checked row-for-row against DuckDB ASOF JOIN."""
    left = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    # deduplicate right on (user_id, ts): keep max event_id — DuckDB's
    # ASOF picks ONE row per boundary and ties are engine-specific, so
    # both engines get a tie-free right side
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    right = right.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    got = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["event_id", "value"], suffix="_view",
    )
    got_rows = sorted(
        (r.event_id, str(r.ts_view), r.event_id_view, r.value)
        for r in got.collect()
    )
    exp = sorted(
        (eid, str(ts), veid, val)
        for eid, ts, veid, val in _duck_asof(
            """
            WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
                 r0 AS (SELECT user_id, ts, event_id, value,
                               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                        FROM events WHERE event_type = 'view'),
                 r AS (SELECT user_id, ts, event_id, value FROM r0 WHERE rn = 1)
            SELECT l.event_id, r.ts, r.event_id, r.value
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
            """
        )
    )
    assert got_rows == exp
    assert len(got_rows) > 50  # non-vacuous


def test_asof_tolerance_voids_stale_matches(spark, events):
    left = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    no_tol = asof_join(left, right, ["user_id"], value_cols=["value"])
    tol = asof_join(left, right, ["user_id"], value_cols=["value"], tolerance="30 minutes")
    n_matched_no = no_tol.filter(F.col("ts_right").isNotNull()).count()
    n_matched_tol = tol.filter(F.col("ts_right").isNotNull()).count()
    assert 0 < n_matched_tol < n_matched_no
    # every surviving match is within the window
    bad = tol.filter(
        F.col("ts_right").isNotNull()
        & (F.col("ts_right") < F.col("ts") - F.expr("INTERVAL 30 minutes"))
    ).count()
    assert bad == 0


def test_asof_deterministic_under_repartition(spark, events):
    left = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    a = sorted(map(tuple, asof_join(left, right, ["user_id"], value_cols=["value"]).collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(7), right.repartition(3), ["user_id"], value_cols=["value"]
            ).collect(),
        )
    )
    assert a == b


def test_asof_plan_is_single_key_shuffle(spark, events):
    """The plan must be union → ONE hash exchange on the key → window:
    no broadcast, no range/cartesian join, no extra exchanges."""
    left = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    plan = asof_join(left, right, ["user_id"], value_cols=["value"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("hashpartitioning(user_id") >= 1


def test_asof_no_value_smearing_across_right_rows(spark):
    """The matched right row travels as a unit: when the most recent
    right row has NULL in one value column, the output must NOT smear
    in that column's value from an older right row."""
    import datetime as dt

    from etl_football_analytics_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 3))], "key string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", dt.datetime(2024, 1, 1, 1), 10.0, None),
            ("k", dt.datetime(2024, 1, 1, 2), None, 5.0),
        ],
        "key string, ts timestamp, price double, qty double",
    )
    row = asof_join(left, right, on=["key"], value_cols=["price", "qty"]).collect()[0]
    assert row.ts_right == dt.datetime(2024, 1, 1, 2)
    assert row.price is None  # NOT 10.0 smeared from the ts=1 row
    assert row.qty == 5.0


def test_asof_null_keys_follow_sql_equality(spark):
    """NULL keys never match (SQL equality; DuckDB ASOF agrees): a
    NULL-key left row gets NULL enrichment even when a NULL-key right
    row precedes it."""
    import datetime as dt

    from etl_football_analytics_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, dt.datetime(2024, 1, 1, 5)), ("k", dt.datetime(2024, 1, 1, 5))],
        "key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, dt.datetime(2024, 1, 1, 3), 9.0), ("k", dt.datetime(2024, 1, 1, 3), 7.0)],
        "key string, ts timestamp, v double",
    )
    rows = {r.key: r for r in asof_join(left, right, on=["key"]).collect()}
    assert rows["k"].v == 7.0
    assert rows[None].v is None and rows[None].ts_right is None
