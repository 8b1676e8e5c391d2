"""Oracle result-schema hygiene: no DuckDB HUGEINT (int128) columns.

DuckDB types a bare integer `SUM(...)` as HUGEINT. Under a pandas /
Arrow fetch — the path the driver's value hasher uses — HUGEINT
renders as float64 while the Spark side stays int64, so the value
hash diverges even though every value is numerically identical (the
r4 `dq_expectations_suite` red row). The repo convention is
`CAST(SUM(...) AS BIGINT)` on every final-SELECT integer aggregate;
this test enforces it mechanically across ALL registered oracles so
the hazard can't silently recur when new legs land.

DuckDB-only (no Spark session) — runs in milliseconds.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_football_analytics_pipeline_spark.plans import ORACLES
from etl_football_analytics_pipeline_spark.sources.registry import TABLES


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_schema_has_no_hugeint(sf_dir, name):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        rel = con.sql(ORACLES[name])
        hazards = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
        ]
    finally:
        con.close()
    assert not hazards, (
        f"{name}: oracle emits int128 columns {hazards} — a pandas/Arrow "
        "fetch renders these float64 and the driver's value hash diverges; "
        "CAST the aggregate to BIGINT in the oracle SQL"
    )
