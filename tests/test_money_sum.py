"""Property tests for the scaled-long exact money aggregation
(`functions.cleaning.scaled_long` / `exact_scaled_sum`).

The contract under test: for fixed-point source data (≤ frac_digits
fractional decimal digits), the long-typed fast path is BIT-IDENTICAL
to the decimal formulation it replaces — `sum(dec(x))` — under any
grouping. This is what lets j6-style money aggregates stay inside
whole-stage codegen without risking the oracle hash.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.functions.cleaning import (
    dec,
    exact_scaled_sum,
    scaled_long,
)

# fixed-point money values as integer cents, covering sign, zero, and
# magnitudes past float32 exactness (up to 10^12 cents = $10^10)
cents = st.integers(min_value=-(10**12), max_value=10**12)


@settings(max_examples=12, deadline=None)
@given(st.lists(cents, min_size=1, max_size=40), st.data())
def test_scaled_long_matches_decimal_cast(spark, values, data):
    rows = [(i, c / 100.0) for i, c in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = df.select(
        scaled_long("v").alias("fast"),
        (dec("v", 18, 2) * 100).cast("long").alias("ref"),
    ).collect()
    for r in got:
        assert r.fast == r.ref


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), cents), min_size=1, max_size=60))
def test_exact_scaled_sum_matches_decimal_sum(spark, pairs):
    rows = [(g, c / 100.0) for g, c in pairs]
    df = spark.createDataFrame(rows, "g int, v double")
    fast = (
        df.groupBy("g")
        .agg(exact_scaled_sum(scaled_long("v"), 2).alias("s"))
        .collect()
    )
    ref = df.groupBy("g").agg(F.sum(dec("v")).cast("decimal(18,2)").alias("s")).collect()
    assert {r.g: r.s for r in fast} == {r.g: r.s for r in ref}


def test_exact_scaled_sum_product_scale(spark):
    """The j6 shape: e2 × e2 product summed at e4 scale equals the
    decimal product sum, including the final half-up rounding cast."""
    rows = [(i % 2, 100.0 + i + 0.25, round(0.01 * (i % 7), 2)) for i in range(200)]
    df = spark.createDataFrame(rows, "g int, price double, disc double")
    rev_e4 = scaled_long("price") * (F.lit(100) - scaled_long("disc"))
    fast = df.groupBy("g").agg(exact_scaled_sum(rev_e4, 4).alias("s")).collect()
    rev_dec = dec("price") * (F.lit(1) - dec("disc"))
    ref = df.groupBy("g").agg(F.sum(rev_dec).cast("decimal(18,2)").alias("s")).collect()
    assert {r.g: r.s for r in fast} == {r.g: r.s for r in ref}
    # sanity: the values are real decimals, not doubles
    assert all(isinstance(r.s, Decimal) for r in fast)
