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
    assert sql.startswith(
        'INSERT INTO "dim_team" ("team_id", "team_name", "stadium_id")'
    )
    assert 'FROM "dim_team__stage"' in sql
    assert 'ON CONFLICT ("team_id") DO UPDATE SET' in sql
    assert '"team_name" = EXCLUDED."team_name"' in sql
    assert '"team_id" = EXCLUDED."team_id"' not in sql  # PK never updated


def test_fact_statement_do_nothing():
    pk, is_dim = WAREHOUSE_KEYS["fact_team_match"]
    assert not is_dim
    sql = jdbc_upsert_sql("fact_team_match", pk + ["gf", "ga"], pk, is_dim)
    assert sql.endswith(
        'ON CONFLICT ("season", "game_id", "team_id") DO NOTHING'
    )


def test_pk_only_dim_degrades_to_do_nothing():
    sql = jdbc_upsert_sql("dim_season", ["season_id"], ["season_id"], True)
    assert sql.endswith("DO NOTHING")


def test_stage_frame_deduped_by_pk(spark):
    """The staging table must carry one row per PK — a set-based
    ON CONFLICT DO UPDATE fails in PostgreSQL on source duplicates
    ("command cannot affect row a second time"). Dims keep the
    last-wins row (executemany re-updates), facts the first-wins row
    (later duplicates conflict and are skipped), both deterministic."""
    from etl_football_analytics_pipeline_spark.pipeline.warehouse import dedupe_stage_frame

    dup = spark.createDataFrame(
        [(1, "Alpha", 10), (1, "Alpha-v2", 10), (2, "Beta", 11)],
        "team_id long, team_name string, stadium_id long",
    )
    dim = sorted(tuple(r) for r in dedupe_stage_frame(dup, ["team_id"], True).collect())
    assert dim == [(1, "Alpha-v2", 10), (2, "Beta", 11)]
    fact = sorted(tuple(r) for r in dedupe_stage_frame(dup, ["team_id"], False).collect())
    assert fact == [(1, "Alpha", 10), (2, "Beta", 11)]
    # PK-only frame: plain dropDuplicates
    pk_only = spark.createDataFrame([(1,), (1,), (2,)], "season_id long")
    assert sorted(
        tuple(r) for r in dedupe_stage_frame(pk_only, ["season_id"], True).collect()
    ) == [(1,), (2,)]
