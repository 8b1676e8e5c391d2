"""Sketch-based approximate aggregates (sketch_suite): error bounds
vs exact answers, and partitioning-independence of the HLL path."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.plans.relational import sketch_suite

SF = "/root/testdata/sf0.01"


def test_hll_within_rsd_of_exact(spark):
    out = {
        (r["part"], r["key"]): (r["v1"], r["v2"])
        for r in sketch_suite(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: (r["n_supp"], r["n_ord"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_orderkey").alias("n_ord"),
        )
        .collect()
    }
    assert {k for p, k in out if p == "hll"} == set(exact)
    for key, (n_supp, n_ord) in exact.items():
        est_supp, est_ord = out[("hll", key)]
        # rsd=0.02 → generous 5x bound; a sketch that drifts past this
        # is broken, not unlucky
        assert abs(est_supp - n_supp) / n_supp < 0.10, key
        assert abs(est_ord - n_ord) / n_ord < 0.10, key


def test_pct_within_tolerance_of_exact(spark):
    out = {
        r["key"]: (r["v1"], r["v2"])
        for r in sketch_suite(spark, SF).collect()
        if r["part"] == "pct"
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    for key, (p50, p95) in exact.items():
        a50, a95 = out[key]
        assert abs(a50 - p50) / p50 < 0.05, key
        assert abs(a95 - p95) / p95 < 0.05, key


def test_hll_is_partitioning_independent(spark):
    """HLL registers merge by max — the estimate must be bit-identical
    under any physical layout (what makes the sketch usable as a
    deterministic scale path)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    est = lambda df: sorted(  # noqa: E731
        tuple(r)
        for r in df.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_suppkey", rsd=0.02).alias("v"))
        .collect()
    )
    assert est(li) == est(li.repartition(17)) == est(li.repartition(3, "l_orderkey"))


def test_hllds_merged_sketches_track_exact(spark):
    """The pre-aggregated-sketch-table leg: per-segment DataSketches
    HLL unioned to the group estimate (v1) and the one-shot sketch
    (v2) both land within sketch error of the exact distinct count."""
    out = {
        r["key"]: (r["v1"], r["v2"])
        for r in sketch_suite(spark, SF).collect()
        if r["part"] == "hllds"
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    for key, n in exact.items():
        merged, direct = out[key]
        assert abs(merged - n) / n < 0.05, (key, merged, n)
        assert abs(direct - n) / n < 0.05, (key, direct, n)


def test_hllds_merge_is_partitioning_independent(spark):
    """Sketch union is a commutative merge: the unioned estimate must
    not depend on the physical layout of the segment build."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    def merged(df):
        return sorted(
            tuple(r)
            for r in df.groupBy("l_returnflag", "l_linestatus")
            .agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
            .groupBy("l_returnflag")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("v"))
            .collect()
        )

    assert merged(li) == merged(li.repartition(17)) == merged(li.repartition(3, "l_orderkey"))
