"""JDBC Load-stage transport — statement-level tests (no PostgreSQL in
this container; the writer config path is exercised up to the driver
boundary)."""

from __future__ import annotations

from etl_football_analytics_pipeline_spark.pipeline.warehouse import (
    WAREHOUSE_KEYS,
    jdbc_upsert_sql,
)


def test_dim_upsert_statement_do_update():
    sql = jdbc_upsert_sql(
        "dim_team", ["team_id", "team_name", "stadium_id"], ["team_id"], True
    )
    assert sql.startswith("INSERT INTO dim_team (team_id, team_name, stadium_id)")
    assert "FROM dim_team__stage" in sql
    assert "ON CONFLICT (team_id) DO UPDATE SET" in sql
    assert "team_name = EXCLUDED.team_name" in sql
    assert "team_id = EXCLUDED.team_id" not in sql  # PK never updated


def test_fact_statement_do_nothing():
    pk, is_dim = WAREHOUSE_KEYS["fact_team_match"]
    assert not is_dim
    sql = jdbc_upsert_sql("fact_team_match", pk + ["gf", "ga"], pk, is_dim)
    assert sql.endswith("ON CONFLICT (season, game_id, team_id) DO NOTHING")


def test_pk_only_dim_degrades_to_do_nothing():
    sql = jdbc_upsert_sql("dim_season", ["season_id"], ["season_id"], True)
    assert sql.endswith("DO NOTHING")
