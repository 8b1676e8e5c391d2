"""Data-quality expectations (operators/expectations.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.expectations import (
    expect_report,
    expect_split,
    with_violations,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "B"),   # fails positive
            (3, None, "A"),   # fails positive (null-as-violation)
            (4, 3.0, "Z"),    # fails known_kind
            (5, -1.0, None),  # fails positive + known_kind
        ],
        "id int, v double, kind string",
    )


def _rules():
    # built lazily: pyspark 4 Column construction needs an active session
    return {
        "positive": F.col("v") > 0,
        "known_kind": F.col("kind").isin("A", "B"),
    }


def test_violation_tagging(spark):
    got = {
        r.id: sorted(r.violations)
        for r in with_violations(_df(spark), _rules()).collect()
    }
    assert got == {
        1: [],
        2: ["positive"],
        3: ["positive"],
        4: ["known_kind"],
        5: ["known_kind", "positive"],
    }


def test_split(spark):
    valid, quarantine = expect_split(_df(spark), _rules())
    assert [r.id for r in valid.orderBy("id").collect()] == [1]
    assert "violations" not in valid.columns
    assert sorted(r.id for r in quarantine.collect()) == [2, 3, 4, 5]


def test_report(spark):
    rep = {r.rule: r for r in expect_report(_df(spark), _rules()).collect()}
    assert rep["positive"].n_violations == 3
    assert rep["known_kind"].n_violations == 2
    assert all(r.n_checked == 5 for r in rep.values())
    assert rep["positive"].pass_rate == 0.4


def test_null_optout(spark):
    rules = {"positive_or_null": F.col("v").isNull() | (F.col("v") > 0)}
    rep = expect_report(_df(spark), rules).collect()[0]
    assert rep.n_violations == 2  # only the genuinely negative rows


def test_report_plan_is_single_partial_agg(spark, sf_dir):
    """The report folds to one partial-agg row per task: two
    HashAggregates around one (AQE-coalesced) exchange, no window,
    no join."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rules = {
        "qty_range": F.col("l_quantity").between(1, 50),
        "disc_range": F.col("l_discount").between(0, 1),
    }
    plan = expect_report(li, rules)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Join" not in plan and "Window" not in plan


def test_profile_table(spark):
    from etl_football_analytics_pipeline_spark.operators.expectations import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.0)],
        "k int, s string, v double",
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["k"].n_nulls == 0 and got["k"].n_distinct == 2
    assert got["k"].min_str == "1" and got["k"].max_str == "2"
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2
    assert got["v"].n_nulls == 1 and got["v"].min_str == "5.0"


def test_dq_suite_fusion_matches_operator_composition(spark, sf_dir):
    """r12: dq_expectations_suite derives report/quarantine/profile
    from ONE violation-combo aggregate (two lineitem passes instead of
    four). Pin value-equality against the direct operator composition
    it replaced."""
    from etl_football_analytics_pipeline_spark.operators.expectations import (
        expect_report,
        profile_table,
        with_violations,
    )
    from etl_football_analytics_pipeline_spark.plans.quality import (
        dq_expectations_suite,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rules = {
        "qty_le_25": F.col("l_quantity") <= 25,
        "discount_le_5pct": F.col("l_discount") <= 0.05,
        "flag_not_returned": F.col("l_returnflag") != "R",
        "shipped_by_1997": F.year("l_shipdate") <= 1997,
    }
    report = expect_report(li, rules).select(
        F.lit("report").alias("part"),
        F.col("rule").alias("s1"),
        F.col("n_violations").alias("k1"),
        F.col("n_checked").alias("k2"),
        F.col("pass_rate").alias("v1"),
    )
    quarantine = (
        with_violations(li, rules)
        .filter(F.size("violations") > 0)
        .groupBy(F.array_join("violations", ",").alias("s1"))
        .agg(F.count(F.lit(1)).alias("k1"))
        .select(
            F.lit("quarantine").alias("part"), "s1", "k1",
            F.lit(None).cast("long").alias("k2"),
            F.lit(None).cast("double").alias("v1"),
        )
    )
    profile = profile_table(
        li, ["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate", "l_quantity"]
    ).select(
        F.lit("profile").alias("part"),
        F.concat_ws(
            "|", "column",
            F.coalesce("min_str", F.lit("")), F.coalesce("max_str", F.lit("")),
        ).alias("s1"),
        F.col("n_nulls").alias("k1"),
        F.col("n_distinct").alias("k2"),
        F.lit(None).cast("double").alias("v1"),
    )
    want = report.unionByName(quarantine).unionByName(profile)
    got = dq_expectations_suite(spark, sf_dir)
    assert got.schema == want.schema
    key = lambda r: (r.part, r.s1)  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)
