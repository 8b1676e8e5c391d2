"""Engine-wide helpers (utils.py): the orderable-type filter behind
the dedup-survivor tiebreaks, and spread's no-op contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.utils import (
    orderable_columns,
    spread,
)


def test_orderable_columns_excludes_maps_at_any_nesting(spark):
    """Maps are unorderable wherever they hide — bare, inside arrays,
    inside structs, structs-inside-arrays — while every orderable
    composite passes; the tiebreak sorts only what Spark can ORDER BY
    (ADVICE r7: a map column crashed merge_sink's dedup sort)."""
    df = spark.range(1).select(
        F.col("id"),
        F.lit("s").alias("s"),
        F.array(F.lit(1)).alias("arr"),
        F.struct(F.lit(1).alias("a"), F.lit("b").alias("b")).alias("st"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.array(F.create_map(F.lit("k"), F.lit(1))).alias("arr_of_map"),
        F.struct(F.create_map(F.lit("k"), F.lit(1)).alias("m")).alias("st_of_map"),
        F.array(F.struct(F.lit(1).alias("x"))).alias("arr_of_st"),
    )
    cols = df.columns
    got = orderable_columns(df, cols)
    assert got == ["id", "s", "arr", "st", "arr_of_st"]
    # order of the input list is preserved (tiebreaks are order-sensitive)
    assert orderable_columns(df, ["s", "id"]) == ["s", "id"]
    # and the verdict of the filter matches Spark's own: sorting by the
    # accepted columns succeeds, sorting by a rejected one raises
    df.orderBy(*[F.asc(c) for c in got]).collect()
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException):
        df.orderBy(F.asc("m")).collect()


def test_spread_is_noop_when_already_wide(spark):
    df = spark.range(0, 1000, 1, 16)
    # r12: small frames (by Catalyst size estimate) may be repartitioned
    # to the target WITHOUT the physical width probe — the probe forced
    # full physical planning per call and cost more driver time than the
    # tiny redundant shuffle it avoided. The contract is ">= target
    # partitions", not frame identity.
    out = spread(df, 8)
    assert out.rdd.getNumPartitions() >= 8
    assert spread(df, 32).rdd.getNumPartitions() == 32
    # an explicit prior repartition IS recognized logically: no second
    # shuffle stacked on top, no physical probe
    assert spread(out, 8) is out
    wide = spread(df, 32)
    assert spread(wide, 32) is wide
    # r13: the prior-spread recognition walks through partitioning-
    # preserving wrappers — a projection/filter over a repartition must
    # not stack a second exchange
    proj = wide.select((F.col("id") * 2).alias("x")).filter("x >= 0")
    assert spread(proj, 32) is proj
    # ...but only a SHUFFLING repartition of >= target width counts:
    # coalesce() is also a Repartition node (shuffle=false) and a
    # narrower repartition must not satisfy a wider request
    narrow = df.coalesce(1).select((F.col("id") * 2).alias("x"))
    assert spread(narrow, 8).rdd.getNumPartitions() >= 8
    two = df.repartition(2).select((F.col("id") * 2).alias("x"))
    assert spread(two, 8).rdd.getNumPartitions() >= 8


def test_spread_widens_large_estimate_narrow_frame(spark):
    """r13 (VERDICT r12 #5): a frame whose Catalyst size estimate
    exceeds the small cutoff must still be widened when it is
    physically narrow — the large-estimate path falls through to the
    exact probe instead of returning early."""
    # 10M longs => Catalyst row-stats estimate ~80 MB (above the 64 MB
    # small cutoff), but physically ONE partition
    big = spark.range(0, 10_000_000, 1, 1).filter(F.col("id") >= 0)
    est = int(big._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert est > (64 << 20)  # the premise: Catalyst thinks it is large
    assert big.rdd.getNumPartitions() == 1
    assert spread(big, 8).rdd.getNumPartitions() >= 8
