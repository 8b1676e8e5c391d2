"""Sketch-based approximate aggregates (sketch_suite): error bounds
vs exact answers, partitioning-independence of the HLL paths, and the
portable (cross-engine value-oracled) HLL tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.sketches import (
    phll_constants,
    portable_hll_distinct,
)
from etl_football_analytics_pipeline_spark.plans.relational import sketch_suite

SF = "/root/testdata/sf0.01"


def _suite(spark):
    return {
        (r["part"], r["key"]): (r["v1"], r["v2"])
        for r in sketch_suite(spark, SF).collect()
    }


def test_suite_exact_referees_and_bound_flags(spark):
    """Registered contract (r5): native-sketch parts emit (exact
    referee, bound flag) — v1 must equal the independently computed
    exact value and every flag must be 1.0 (a 0.0 means an
    engine-native sketch broke its documented error bound)."""
    out = _suite(spark)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: (r["ns"], r["no"], r["p50"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("ns"),
            F.countDistinct("l_orderkey").alias("no"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert {k for p, k in out if p == "hll"} == set(exact)
    for key, (ns, no, p50) in exact.items():
        assert out[("hll", key)] == (float(ns), 1.0), key
        assert out[("hllds", key)] == (float(no), 1.0), key
        v1, flag = out[("pct", key)]
        assert abs(v1 - round(p50, 4)) < 1e-9 and flag == 1.0, key
        est, ref = out[("phll", key)]
        assert ref == float(ns), key
        # 1024 registers → rsd ~3.25%; 3x bound
        assert abs(est - ns) / ns < 0.10, (key, est, ns)


def test_native_estimates_within_error_of_exact(spark):
    """The raw native estimates (no longer emitted by the registered
    row) stay pinned within generous error bounds of exact."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("ns"),
        F.countDistinct("l_orderkey").alias("no"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("es"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("eo"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("ap"),
    ).collect()
    for r in rows:
        # rsd=0.02 → generous 5x bound; a sketch that drifts past this
        # is broken, not unlucky
        assert abs(r["es"] - r["ns"]) / r["ns"] < 0.10, r["l_returnflag"]
        assert abs(r["eo"] - r["no"]) / r["no"] < 0.10, r["l_returnflag"]
        assert abs(r["ap"][0] - r["p50"]) / r["p50"] < 0.05, r["l_returnflag"]
        assert abs(r["ap"][1] - r["p95"]) / r["p95"] < 0.05, r["l_returnflag"]


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
    HLL unioned to the group estimate (merged) and the one-shot sketch
    both land within sketch error of the exact distinct count."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    merged = {
        r["key"]: r["v"]
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
        .groupBy(F.col("l_returnflag").alias("key"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("v"))
        .collect()
    }
    direct = {
        r["key"]: (r["v"], r["n"])
        for r in li.groupBy(F.col("l_returnflag").alias("key"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("v"),
            F.countDistinct("l_orderkey").alias("n"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for key, (one, n) in direct.items():
        assert abs(merged[key] - n) / n < 0.05, (key, merged[key], n)
        assert abs(one - n) / n < 0.05, (key, one, n)


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


def test_portable_hll_partitioning_independent_and_bounded(spark):
    """The portable md5 HLL: estimate identical under any layout
    (register max + exact integer sum), within 3x its rsd of exact on
    both tracked columns, and the scaled register sum can never
    overflow (m * 2^wbits = 2^60 < 2^63 by construction)."""
    c = phll_constants()
    assert c["m"] * (1 << c["wbits"]) == 1 << 60
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    for col in ("l_suppkey", "l_orderkey"):
        a = sorted(tuple(r) for r in portable_hll_distinct(li, "l_returnflag", col).collect())
        b = sorted(
            tuple(r)
            for r in portable_hll_distinct(li.repartition(17), "l_returnflag", col).collect()
        )
        assert a == b
        exact = {
            r["l_returnflag"]: r["n"]
            for r in li.groupBy("l_returnflag").agg(F.countDistinct(col).alias("n")).collect()
        }
        for key, est in ((k, v) for k, v in a):
            assert abs(est - exact[key]) / exact[key] < 0.10, (col, key, est)


def test_portable_hll_ignores_nulls(spark):
    """NULL values never count toward the distinct estimate (matching
    native approx_count_distinct): without the not-null filter,
    md5(NULL) makes a NULL register row that inflates cnt and skews
    both correction branches."""
    base = spark.createDataFrame(
        [("a", i % 50) for i in range(500)], "key string, v int"
    )
    with_nulls = base.union(
        spark.createDataFrame([("a", None)] * 25, "key string, v int")
    )
    a = portable_hll_distinct(base, "key", "v").collect()
    b = portable_hll_distinct(with_nulls, "key", "v").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    all_null = spark.createDataFrame([("a", None)] * 5, "key string, v int")
    assert portable_hll_distinct(all_null, "key", "v").collect() == []


# ---------------------------------------------------------------------------
# Portable count-min sketch + Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_portable_cms_never_undercounts_and_bounds_overcount(spark):
    """CMS guarantees: est >= exact always; est <= exact + eps*N with
    eps = e/w (here the deterministic md5 family makes the bound a
    fixed property of this dataset, not a probability)."""
    import math

    from etl_football_analytics_pipeline_spark.operators.sketches import (
        CMS_D,
        CMS_W,
        portable_cms,
        portable_cms_point,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    vals = li.select(
        F.col("l_returnflag").alias("g"),
        (F.col("l_suppkey") % 100).cast("string").alias("v"),
    )
    cms = portable_cms(vals, "g", "v")
    qs = [str(i) for i in range(0, 100, 9)]
    est = {
        (r.key, r.q): r.est for r in portable_cms_point(cms, qs).collect()
    }
    exact = {
        (r.g, r.v): r["count"]
        for r in vals.filter(F.col("v").isin(qs)).groupBy("g", "v").count().collect()
    }
    n_per_g = {r.g: r["count"] for r in vals.groupBy("g").count().collect()}
    eps = math.e / CMS_W
    assert est, "no estimates produced"
    for (g, q), e in est.items():
        true = exact.get((g, q), 0)
        assert e >= true, (g, q, e, true)
        assert e <= true + eps * n_per_g[g], (g, q, e, true, n_per_g[g])


def test_portable_cms_partitioning_independent(spark):
    from etl_football_analytics_pipeline_spark.operators.sketches import (
        portable_cms,
        portable_cms_point,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet").limit(5000)
    vals = li.select(
        F.col("l_returnflag").alias("g"),
        (F.col("l_suppkey") % 100).cast("string").alias("v"),
    )
    a = sorted(
        map(tuple, portable_cms_point(portable_cms(vals, "g", "v"), ["7", "42"]).collect())
    )
    b = sorted(
        map(
            tuple,
            portable_cms_point(
                portable_cms(vals.repartition(13), "g", "v"), ["7", "42"]
            ).collect(),
        )
    )
    assert a == b


def test_misra_gries_survival_and_error_bounds(spark):
    """Every value with true frequency > n/(k+1) must appear, and for
    each reported value est <= true <= est + err_bound."""
    from etl_football_analytics_pipeline_spark.operators.sketches import (
        misra_gries_topk,
    )

    # skewed synthetic stream: value i has frequency ~ 6000/i
    rows = [(f"v{i}",) for i in range(1, 80) for _ in range(6000 // i)]
    df = spark.createDataFrame(rows, "x string").repartition(8)
    n = len(rows)
    k = 16
    got = {r.value: (r.est, r.err_bound) for r in misra_gries_topk(df, "x", k=k).collect()}
    true = {}
    for (v,) in rows:
        true[v] = true.get(v, 0) + 1
    thresh = n / (k + 1)
    for v, c in true.items():
        if c > thresh:
            assert v in got, (v, c, thresh, sorted(got))
    for v, (est, err) in got.items():
        assert est <= true.get(v, 0) <= est + err, (v, est, err, true.get(v, 0))


def test_misra_gries_bounded_rows_per_partition(spark):
    """The summary pass emits <= k+1 rows per partition — nothing
    corpus-sized ever leaves the executors."""
    from etl_football_analytics_pipeline_spark.operators.sketches import (
        misra_gries_topk,
    )

    df = (
        spark.range(20000)
        .select((F.col("id") % 500).cast("string").alias("x"))
        .repartition(10)
    )
    out = misra_gries_topk(df, "x", k=8)
    assert out.count() <= 8


def test_misra_gries_point_est_bounds(spark):
    """Point lookups honor the MG theory on a skewed stream: a value
    past the n/(k+1) threshold survives with a sandwich bound
    [est, est+err]; an absent value's true count is ≤ err_bound; the
    frame is literal (broadcast-join ready, no extra shuffle)."""
    from etl_football_analytics_pipeline_spark.operators.sketches import (
        misra_gries_point_est,
    )

    rows = [("hot",)] * 5000 + [(f"v{i % 400}",) for i in range(4000)]
    df = spark.createDataFrame(rows, "q string").repartition(8)
    pts = {
        r.q: r
        for r in misra_gries_point_est(df, "q", ["hot", "v7", "zzz"], k=8).collect()
    }
    exact = {"hot": 5000, "v7": 10, "zzz": 0}
    hot = pts["hot"]
    assert hot.est is not None  # freq 5000 > 9000/9 → guaranteed survivor
    assert hot.est <= exact["hot"] <= hot.est + hot.err_bound
    for q in ("v7", "zzz"):
        r = pts[q]
        if r.est is None:
            assert exact[q] <= r.err_bound
        else:
            assert r.est <= exact[q] <= r.est + r.err_bound


def test_misra_gries_mid_stream_cap_reduction(spark):
    """A partition whose distinct domain outgrows the kernel's cap
    (max(8k, 1024)) triggers the mid-stream mergeable-summaries
    reduction — the path a bounded-memory MG exists for. The classic
    guarantees must survive multiple reductions: the heavy value is
    reported, every reported est is a lower bound within the summary's
    decrement weight, and an absent value's true count never exceeds
    err_bound."""
    from etl_football_analytics_pipeline_spark.operators.sketches import (
        misra_gries_topk,
    )

    # 6000 distinct singletons + one value at ~25% of the stream, in 2
    # partitions -> ~3000+ distinct per partition, well past cap=1024
    rows = [(f"u{i}",) for i in range(6000)] + [("hot",)] * 2000
    df = spark.createDataFrame(rows, "x string").repartition(2)
    n = len(rows)
    k = 16
    got = {
        r.value: (r.est, r.err_bound)
        for r in misra_gries_topk(df, "x", k=k).collect()
    }
    assert "hot" in got, sorted(got)
    est, err = got["hot"]
    assert est <= 2000 <= est + err, (est, err)
    # every reported value's sandwich bound holds (singletons: true=1)
    for v, (e, b) in got.items():
        true = 2000 if v == "hot" else 1
        assert e <= true <= e + b, (v, e, b)
    # absent values are bounded by the total decrement weight
    assert err < n / (k + 1) * 2 + 1  # <= n_p/(k+1) summed over P=2


def test_misra_gries_flat_stream_keeps_bound(spark):
    """When every merged counter cancels (uniform stream) the summary
    must be a (NULL, 0, err_bound) carrier row, never an empty frame:
    the MG contract is "any absent value's true count <= err_bound",
    and a dropped decrement total would assert all counts are 0."""
    from etl_football_analytics_pipeline_spark.operators.sketches import (
        misra_gries_point_est,
        misra_gries_topk,
    )

    rows = [(f"v{i}",) for i in range(5000)]  # uniform singletons
    df = spark.createDataFrame(rows, "x string").repartition(1)
    out = misra_gries_topk(df, "x", k=4).collect()
    assert out, "the decrement weight must survive an all-cancel merge"
    err = out[0].err_bound
    assert err >= 1  # any singleton's true count (1) must fit the bound
    for r in out:
        true = 1 if r.value is not None else 0
        lo = r.est or 0
        assert lo <= true <= lo + err, (r.value, lo, err)
    pts = {
        r.q: r
        for r in misra_gries_point_est(df, "x", ["v1", "zzz"], k=4).collect()
    }
    for q, true in (("v1", 1), ("zzz", 0)):
        r = pts[q]
        lo = r.est or 0
        assert lo <= true <= lo + r.err_bound, (q, r)
    # genuinely empty input still yields an empty summary
    empty = spark.createDataFrame([], "x string")
    assert misra_gries_topk(empty, "x", k=4).count() == 0


def test_misra_gries_merge_reduction_cancel_keeps_bound(spark):
    """The DRIVER-side merge reduction can itself cancel every counter
    (near-uniform partial weights across partitions) — the carrier row
    must survive that path too, not only the partials-empty path."""
    from etl_football_analytics_pipeline_spark.operators.sketches import (
        misra_gries_topk,
    )

    # two partitions with DISJOINT uniform domains: each partial's
    # survivors share one weight, the merged 2k counters all tie, and
    # the (k+1)-th-weight subtraction cancels every one of them
    rows = [(f"p0_{i % 8}",) for i in range(4000)] + [
        (f"p1_{i % 8}",) for i in range(4000)
    ]
    df = (
        spark.createDataFrame(rows, "x string")
        .repartition(2, F.col("x"))
    )
    out = misra_gries_topk(df, "x", k=4).collect()
    assert out, "merge-reduction cancel must not drop the bound"
    err = out[0].err_bound
    # every value's true count (500) must satisfy est <= true <= est+err
    got = {r.value: r.est for r in out if r.value is not None}
    for v in ("p0_3", "p1_5"):
        lo = got.get(v, 0) or 0
        assert lo <= 500 <= lo + err, (v, lo, err)
