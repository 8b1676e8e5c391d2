"""Differential test mirroring the driver's correctness gate: every
registered query runs on Spark AND its DuckDB oracle on the same
parquet; row count, column names/types, and order-insensitive values
must match.

Runs at sf0.001 by default (fast inner loop); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to reproduce the
driver's exact scale.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_football_analytics_pipeline_spark.plans import ORACLES, QUERIES
from etl_football_analytics_pipeline_spark.sources.registry import TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, then
    rows, comparing plain str() of every value — NO float rounding.
    Matches scripts/parity.py: the registry's DOUBLE output-boundary
    convention makes engine outputs bit-identical, so the test should
    hold them to that (a lax %.9g canon would mask the decimal-string
    divergences that fail the driver's hasher)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    try:
        res = con.execute(ORACLES[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} (spark) != {len(duck_rows)} (duckdb)"
    )
    sc = _canon(spark_rows, spark_cols)
    dc = _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first value mismatch {mismatches[0]}"


def test_every_query_runs(spark, sf_dir):
    """Queries without oracles must still execute and return a stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
