"""zip_with_index (fact-scale T6): dense, unique, order-correct ids
with no single-partition window stage."""

from __future__ import annotations

from etl_football_analytics_pipeline_spark.operators.surrogate import zip_with_index


def test_ids_dense_and_order_correct(spark):
    df = spark.range(0, 10_000).selectExpr("id * 7 % 10000 AS k", "id AS payload")
    out = zip_with_index(df, ["k"], num_partitions=8).collect()
    assert len(out) == 10_000
    ids = sorted(r.surrogate_id for r in out)
    assert ids == list(range(1, 10_001))  # dense 1..n
    by_id = sorted(out, key=lambda r: r.surrogate_id)
    ks = [r.k for r in by_id]
    assert ks == sorted(ks)  # id order == key order


def test_deterministic_across_partitionings(spark):
    df = spark.range(0, 5_000).selectExpr("id AS k")
    a = {r.k: r.surrogate_id for r in zip_with_index(df, ["k"], num_partitions=3).collect()}
    b = {r.k: r.surrogate_id for r in zip_with_index(df.repartition(17), ["k"], num_partitions=9).collect()}
    assert a == b  # total order key → identical ids under any layout


def test_generic_sampled_path_string_keys(spark):
    """Non-numeric leading keys take the sampled-range fallback; ids
    must still be dense, order-correct, and layout-independent."""
    df = spark.range(0, 3_000).selectExpr(
        "concat('k', lpad(cast(id * 13 % 3000 as string), 5, '0')) AS k"
    )
    out = zip_with_index(df, ["k"], num_partitions=6).collect()
    ids = sorted(r.surrogate_id for r in out)
    assert ids == list(range(1, 3_001))
    by_id = sorted(out, key=lambda r: r.surrogate_id)
    ks = [r.k for r in by_id]
    assert ks == sorted(ks)
    again = {r.k: r.surrogate_id for r in zip_with_index(df.repartition(11), ["k"], num_partitions=4).collect()}
    assert again == {r.k: r.surrogate_id for r in out}


def test_no_single_partition_window(spark):
    df = spark.range(0, 1_000).selectExpr("id AS k")
    out = zip_with_index(df, ["k"], num_partitions=8)
    out.collect()
    executed = out._jdf.queryExecution().executedPlan().toString()
    # a global-window plan would carry `Window [...] ORDER BY` with a
    # SinglePartition exchange; ours partitions the window by __pid
    assert "SinglePartition" not in executed
