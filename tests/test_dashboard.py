"""End-to-end dashboard surface test: raw reference CSVs → star-schema
pipeline → warehouse schema → the 15 dashboard SQL queries
(`scr/ui.py:44-314`) through spark.sql.

fact_team_point / fact_player_match raw sources are stripped from the
snapshot, so those two warehouse tables are synthesized with real
dim keys; every query still runs against the exact warehouse
table/column names the reference UI uses.
"""

from __future__ import annotations

import os

import pytest

from etl_football_analytics_pipeline_spark.pipeline.football import (
    build_dim_match,
    build_dim_player,
    build_dim_season,
    build_dim_team,
    build_fact_team_match,
    read_csv_with_order,
)
from etl_football_analytics_pipeline_spark.pipeline.warehouse import (
    register_warehouse,
    to_warehouse,
)
from etl_football_analytics_pipeline_spark.plans.dashboard import (
    DASHBOARD_QUERIES,
    run_dashboard_query,
)

RAW = "/root/reference/data_raw"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RAW), reason="reference snapshot not available"
)


@pytest.fixture(scope="module")
def warehouse(spark):
    raw_team_match = read_csv_with_order(spark, f"{RAW}/fbref_fact_team_match.csv").cache()
    season_stats = read_csv_with_order(spark, f"{RAW}/fbref_fact_player_season_stats.csv")
    raw_team = read_csv_with_order(spark, f"{RAW}/dim_team.csv")

    processed = {}
    processed["dim_player"] = build_dim_player(season_stats)
    processed["dim_team"] = build_dim_team(raw_team)
    processed["dim_match"] = build_dim_match(raw_team_match)
    processed["dim_season"] = build_dim_season(raw_team_match)
    processed["fact_team_match_clean"] = build_fact_team_match(
        raw_team_match, processed["dim_team"], processed["dim_match"], processed["dim_player"]
    )
    wh = to_warehouse(processed)

    # synthesize the two tables whose raw sources were stripped, keyed
    # on real dim rows so the star joins exercise genuine FKs
    season = wh["dim_season"].orderBy("season_id").collect()[-1]
    teams = wh["dim_team"].orderBy("team_id").limit(2).collect()
    players = wh["dim_player"].orderBy("player_id").limit(2).collect()
    t1, t2 = teams[0], teams[1]
    wh["fact_team_point"] = spark.createDataFrame(
        [
            (season.season_id, "overall", 1, t1.team_id, 38, 25, 8, 5, 80, 30, 50, 83, "WWWDW"),
            (season.season_id, "home", 1, t1.team_id, 19, 14, 3, 2, 45, 12, 33, 45, "WWWWW"),
            (season.season_id, "away", 2, t1.team_id, 19, 11, 5, 3, 35, 18, 17, 38, "WDWLW"),
            (season.season_id, "overall", 2, t2.team_id, 38, 22, 10, 6, 70, 35, 35, 76, "DWWLW"),
            (season.season_id, "home", 2, t2.team_id, 19, 12, 5, 2, 40, 15, 25, 41, "WWDWW"),
            (season.season_id, "away", 3, t2.team_id, 19, 10, 5, 4, 30, 20, 10, 35, "LWWDW"),
        ],
        "season_id long, Match_Category string, Rank long, team_id long, MP long, "
        "W long, D long, L long, GF long, GA long, GD long, Pts long, Recent_Form string",
    )
    game_id = wh["dim_match"].limit(1).collect()[0].match_id
    wh["fact_player_match"] = spark.createDataFrame(
        [
            (season.season_id, game_id, t1.team_id, players[0].player_id, 3, 1),
            (season.season_id, game_id, t1.team_id, players[1].player_id, 0, 2),
            (season.season_id, game_id, t2.team_id, players[1].player_id, 1, 0),
        ],
        "season long, game_id long, team_id long, player_id long, goals long, assists long",
    )
    register_warehouse(spark, wh)
    return {
        "season_name": season.season_name,
        "team1": t1.team_name,
        "scorer": players[0].player_name,
        "wh": wh,
    }


def test_every_dashboard_query_runs(spark, warehouse):
    params = {
        "season_name": warehouse["season_name"],
        "team_name": warehouse["team1"],
        "limit": 10,
    }
    import contextlib
    import io

    for name in DASHBOARD_QUERIES:
        df = run_dashboard_query(spark, name, **params)
        df.collect()  # must execute, not just parse
        # every dim join must broadcast (hinted) — no dashboard query
        # may shuffle its fact side for a dimension lookup
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        assert "SortMergeJoin" not in buf.getvalue(), name


def test_seasons_and_league_table(spark, warehouse):
    seasons = [r.season_name for r in run_dashboard_query(spark, "seasons").collect()]
    assert warehouse["season_name"] in seasons
    assert seasons == sorted(seasons, reverse=True)

    table = run_dashboard_query(
        spark, "league_table", season_name=warehouse["season_name"]
    ).collect()
    assert [r.Rank for r in table] == [1, 2]
    assert table[0].team_name == warehouse["team1"]


def test_top_scorers_aggregates_and_orders(spark, warehouse):
    rows = run_dashboard_query(
        spark, "top_scorers", season_name=warehouse["season_name"], limit=10
    ).collect()
    assert rows[0].player_name == warehouse["scorer"] and rows[0].total_goals == 3
    # player 2 appears once per team (grouped by player, team)
    totals = [r.total_goals for r in rows]
    assert totals == sorted(totals, reverse=True)


def test_season_overview_counts_real_matches(spark, warehouse):
    row = run_dashboard_query(
        spark, "season_overview", season_name=warehouse["season_name"]
    ).collect()[0]
    # snapshot taken mid-season (2026-03) — the latest season has ~133
    # of its ~380 matches played
    assert row.total_matches > 100
    assert row.total_goals > 200


def test_home_away_pivot(spark, warehouse):
    rows = run_dashboard_query(
        spark, "home_away", season_name=warehouse["season_name"]
    ).collect()
    assert rows[0].home_pts == 45 and rows[0].away_pts == 38  # ordered by total desc
    assert rows[1].home_wins == 12


def test_defensive_stats_div0_guard(spark, warehouse):
    rows = run_dashboard_query(
        spark, "defensive_stats", season_name=warehouse["season_name"]
    ).collect()
    assert [float(r.avg_goals_conceded) for r in rows] == sorted(
        float(r.avg_goals_conceded) for r in rows
    )


def test_team_recent_form_self_join(spark, warehouse):
    rows = run_dashboard_query(
        spark,
        "team_recent_form",
        season_name=warehouse["season_name"],
        team_name=warehouse["team1"],
        limit=5,
    ).collect()
    assert len(rows) <= 5
    for r in rows:
        assert r.opponent_name is not None and r.opponent_name != warehouse["team1"]
    dates = [r.match_date for r in rows]
    assert dates == sorted(dates, reverse=True)
