"""Skew-mitigation rewrites: result-identity with the plain forms and
plan-shape evidence that the hot key actually spreads."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.skew import (
    distinct_count_skew_safe,
    salted_join,
)
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    """90%-hot-key frame: one key owns most rows, values repeat."""
    li = load_table(spark, SF, "lineitem")
    return li.select(
        F.when(F.col("l_orderkey") % 10 != 0, F.lit("HOT"))
        .otherwise(F.col("l_orderkey").cast("string"))
        .alias("key"),
        F.col("l_partkey").alias("value"),
        F.col("l_quantity").alias("qty"),
    ).cache()


def test_distinct_count_matches_exact(spark, skewed):
    got = sorted(tuple(r) for r in distinct_count_skew_safe(skewed, "key", "value").collect())
    exp = sorted(
        tuple(r)
        for r in skewed.groupBy("key")
        .agg(F.countDistinct("value").alias("n_distinct"))
        .collect()
    )
    assert got == exp
    hot = dict(got)["HOT"]
    assert hot > 100, "fixture is not actually skewed"


def test_distinct_count_first_shuffle_spreads_on_composite_key(spark, skewed):
    plan = (
        distinct_count_skew_safe(skewed, "key", "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the FIRST-EXECUTED exchange (textually LAST — plans print
    # top-down) must partition on (key, value): the hot key's dedup
    # work spreads across partitions
    exchanges = [
        line for line in plan.splitlines() if "Exchange hashpartitioning" in line
    ]
    assert len(exchanges) == 2, exchanges
    assert "key" in exchanges[-1] and "value" in exchanges[-1], exchanges[-1]
    assert "value" not in exchanges[0], exchanges[0]


def test_salted_join_matches_plain_inner_and_left(spark, skewed):
    right = (
        skewed.select("key").distinct()
        .withColumn("attr", F.concat(F.lit("a:"), F.col("key")))
    )
    # drop some right keys so 'left' exercises unmatched rows
    right_partial = right.filter(F.col("key") != "HOT")
    for how, r in (("inner", right), ("left", right), ("left", right_partial)):
        got = sorted(
            tuple(x)
            for x in salted_join(skewed, r, on=["key"], salts=5, how=how).collect()
        )
        exp = sorted(tuple(x) for x in skewed.join(r, ["key"], how).collect())
        assert got == exp, how


def test_salted_join_duplicate_multiplicity(spark):
    """Duplicate keys on both sides multiply exactly as in a plain
    join (the salt must not dedupe or double-count)."""
    left = spark.createDataFrame(
        [("k", i, "x" * (i % 3)) for i in range(20)] + [("j", 0, "y")],
        "key string, n int, pad string",
    )
    right = spark.createDataFrame(
        [("k", "r1"), ("k", "r2"), ("j", "r3")], "key string, tag string"
    )
    got = sorted(tuple(x) for x in salted_join(left, right, on=["key"], salts=3).collect())
    exp = sorted(tuple(x) for x in left.join(right, ["key"], "inner").collect())
    assert got == exp
    assert len(got) == 20 * 2 + 1


def test_distinct_count_keeps_all_null_keys(spark):
    """A key whose values are all NULL must appear with n_distinct=0,
    exactly like groupBy(key).agg(countDistinct(value)) — not vanish."""
    from etl_football_analytics_pipeline_spark.operators.skew import (
        distinct_count_skew_safe,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", None)], "k string, v int"
    )
    got = sorted(map(tuple, distinct_count_skew_safe(df, "k", "v").collect()))
    want = sorted(
        map(tuple, df.groupBy("k").agg(F.count_distinct("v").alias("n_distinct")).collect())
    )
    assert got == want == [("a", 2), ("b", 0)]


def test_salted_join_tolerates_shared_non_key_columns(spark):
    """salted_join must behave like the plain join when both sides
    share a non-key column name (duplicate output columns, no
    AMBIGUOUS_REFERENCE), and reject salts < 1 at the call site."""
    import pytest as _pytest

    from etl_football_analytics_pipeline_spark.operators.skew import salted_join

    l = spark.createDataFrame([(1, "x"), (2, "y")], "k long, name string")
    r = spark.createDataFrame([(1, "u")], "k long, name string")
    out = salted_join(l, r, ["k"])
    plain = l.join(r, ["k"])
    assert out.columns == plain.columns
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))
    with _pytest.raises(ValueError, match="salts"):
        salted_join(l, r, ["k"], salts=0)
