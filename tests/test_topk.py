"""grouped_topk: the salted two-stage per-group top-k must equal the
plain window under a total order, at any salt count or layout."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_football_analytics_pipeline_spark.operators.topk import grouped_topk


def _data(spark):
    # ties in score within groups — the id tie-break makes it total
    return spark.createDataFrame(
        [(g, i, float((i * 7) % 13)) for g in ("a", "b", "c") for i in range(200)],
        "g string, id long, score double",
    )


def _plain(df, k):
    w = W.partitionBy("g").orderBy(F.desc("score"), F.asc("id"))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("g", "id", "score", "rank")
    )


@pytest.mark.parametrize("salt_buckets", [1, 4, 64])
def test_grouped_topk_equals_plain_window(spark, salt_buckets):
    df = _data(spark)
    want = sorted(map(tuple, _plain(df, 10).collect()))
    got = sorted(
        map(
            tuple,
            grouped_topk(
                df, ["g"], [F.desc("score"), F.asc("id")], 10,
                salt_col="id", salt_buckets=salt_buckets,
            ).select("g", "id", "score", "rank").collect(),
        )
    )
    assert got == want


def test_grouped_topk_default_salt_layout_independent(spark):
    df = _data(spark)
    a = sorted(
        map(tuple, grouped_topk(df, ["g"], [F.desc("score"), F.asc("id")], 7)
            .select("g", "id", "rank").collect())
    )
    b = sorted(
        map(tuple, grouped_topk(df.repartition(17), ["g"], [F.desc("score"), F.asc("id")], 7)
            .select("g", "id", "rank").collect())
    )
    assert a == b


def test_grouped_topk_rejects_nonpositive_k(spark):
    df = _data(spark)
    with pytest.raises(ValueError):
        grouped_topk(df, ["g"], [F.desc("score")], 0)
