"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's central query registry
(etl_football_analytics_pipeline_spark.plans.registry): every operator from
SURVEY.md §2 plus the LLM-pipeline extensions is registered there with
a Spark plan builder and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_football_analytics_pipeline_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the top-revenue
    grouped-sum/having/top-k star join (scan → join → agg → having →
    orderBy → limit in one Catalyst plan)."""
    return QUERIES["a1_grouped_sum_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents; keys missing here (the
    xxhash64-based probabilistic dedup/LSH ops) get the driver's
    rows-only check and are verified against exact baselines in
    tests/ instead."""
    return dict(ORACLES)
