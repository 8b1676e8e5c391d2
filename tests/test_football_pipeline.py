"""Golden-file parity: the Spark pipeline replays the reference's
`data_raw → data_processed` transformation and must reproduce the
committed outputs (SURVEY.md §5 — the reference's own regression
fixtures are the strongest available ground truth).

Sources available in the snapshot: fbref_fact_team_match,
fbref_fact_player_season_stats, dim_team. The raw player-MATCH stats
and standings files were stripped (`.MISSING_LARGE_BLOBS`), so
dim_player is verified as a golden SUBSET and fact_team_point /
dim_stadium are covered by synthetic unit tests instead.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.pipeline.football import (
    build_dim_match,
    build_dim_player,
    build_dim_season,
    build_dim_stadium,
    build_dim_team,
    build_fact_team_match,
    build_fact_team_point,
    read_csv_with_order,
)

RAW = "/root/reference/data_raw"
GOLD = "/root/reference/data_processed"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RAW), reason="reference snapshot not available"
)


@pytest.fixture(scope="module")
def raw_team_match(spark):
    return read_csv_with_order(spark, f"{RAW}/fbref_fact_team_match.csv").cache()


@pytest.fixture(scope="module")
def golden(spark):
    def load(name: str):
        return (
            spark.read.option("header", "true")
            .csv(f"{GOLD}/{name}.csv")
        )

    return load


def _rows(df, cols):
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_dim_match_matches_golden_exactly(spark, raw_team_match, golden):
    ours = build_dim_match(raw_team_match)
    gold = golden("dim_match").select(
        F.col("game_id").cast("long"),
        "game",
        F.to_date("date").alias("date"),
        "round",
        "day",
    )
    assert ours.count() == gold.count() == 2293
    assert _rows(ours, ours.columns) == _rows(gold, ours.columns)


def test_dim_team_matches_golden_exactly(spark, golden):
    raw = read_csv_with_order(spark, f"{RAW}/dim_team.csv")
    ours = build_dim_team(raw)
    gold = golden("dim_team").select(
        F.col("team_id").cast("long"),
        "team_name",
        F.col("founded_year").cast("long"),
        F.col("stadium_id").cast("long"),
        "short_name",
    )
    assert _rows(ours, ours.columns) == _rows(gold, ours.columns)


def test_dim_season_generated_matches_golden_seed(spark, raw_team_match, golden):
    """SURVEY §1.4: the reference's static seed must be derivable from
    data — and it is, exactly."""
    ours = build_dim_season(raw_team_match)
    gold = golden("dim_season").select(
        F.col("season_id").cast("long"),
        "season_name",
        F.col("start_year").cast("long"),
        F.col("end_year").cast("long"),
        F.to_date("actual_start_date").alias("actual_start_date"),
        F.to_date("actual_end_date").alias("actual_end_date"),
    )
    assert _rows(ours, ours.columns) == _rows(gold, ours.columns)


def test_dim_player_is_golden_subset(spark, golden):
    """The raw player-match source is missing from the snapshot, so our
    season-only rebuild must be an attribute-exact subset of the golden
    (ids shift, attributes don't)."""
    season = read_csv_with_order(spark, f"{RAW}/fbref_fact_player_season_stats.csv")
    ours = build_dim_player(season, match_stats=None)
    gold = golden("dim_player")
    attr = ["player", "pos", "nation", "born"]
    ours_rows = set(_rows(ours.withColumn("born", F.col("born").cast("string")), attr))
    gold_rows = set(
        _rows(gold.withColumn("born", F.col("born").cast("long").cast("string")), attr)
    )
    assert ours_rows <= gold_rows
    # season stats cover the large majority of the golden player dim
    assert len(ours_rows) >= 1000
    # ids are dense 1..N in name order
    ids = [r.player_id for r in ours.orderBy("player_id").collect()]
    assert ids == list(range(1, len(ids) + 1))


def test_fact_team_match_matches_golden_exactly(spark, raw_team_match, golden):
    """The core fact build: golden dims in (as the reference's own run
    consumed them), golden fact out — 4,066 rows, value-identical."""
    dim_team = golden("dim_team")
    dim_match = golden("dim_match")
    dim_player = golden("dim_player")
    ours = build_fact_team_match(raw_team_match, dim_team, dim_match, dim_player)

    gold = golden("fact_team_match_clean").select(
        F.col("season").cast("long"),
        F.col("game_id").cast("long"),
        F.col("team_id").cast("long"),
        F.col("opponent_id").cast("long"),
        "round",
        "venue",
        "result",
        F.col("GF").cast("double"),
        F.col("GA").cast("double"),
        F.col("xG").cast("double"),
        F.col("xGA").cast("double"),
        F.col("Poss").cast("double"),
        F.col("captain_id").cast("double"),
        "Formation",
        F.col("Opp Formation"),
    )
    assert ours.count() == gold.count() == 4066
    cols = gold.columns
    ours_cast = ours.select(
        *[F.col(c).cast(dict(gold.dtypes)[c]).alias(c) for c in cols]
    )
    assert _rows(ours_cast, cols) == _rows(gold, cols)


def test_fact_team_point_synthetic(spark):
    """Raw standings are absent from the snapshot; the transform logic
    (X7 season encode, name-clean chain, J8 lookup-drop, N2 rank, X5
    GF:GA split) is exercised on a synthetic frame instead."""
    raw = spark.createDataFrame(
        [
            ("2024-2025", "overall", "1.", "Arsenal", "38", "20", "14", "4", "69:34", "35", "74", "WWDLD", 0),
            ("2024/2025", "home", "2.0", "Nottingham", "19", "12", "4", "3", "37:20", "17", "40", "WWWDL", 1),
            ("2425", "away", "3", "Sunderland A.", "19", "8", "5", "6", "25:21", "4", "29", "LWDWL", 2),
            ("2425", "overall", "bad", "Arsenal", "38", "20", "14", "4", "69:34", "35", "74", "WWDLD", 3),
            ("2425", "overall", "4", "No Such Team", "38", "1", "2", "3", "10:30", "-20", "5", "LLLLL", 4),
        ],
        "season_id string, Match_Category string, Rank string, Team string, MP string, "
        "W string, D string, L string, `GF:GA` string, GD string, Pts string, "
        "Recent_Form string, __row long",
    )
    dim_team = spark.createDataFrame(
        [(9617, "Arsenal"), (111, "Nott'ham forest"), (222, "Sunderland")],
        "team_id long, team_name string",
    )
    out = build_fact_team_point(raw, dim_team).collect()
    by_rank = {r.Rank: r for r in out}
    # unmatched team and unparseable rank rows dropped
    assert len(out) == 3 and set(by_rank) == {1, 2, 3}
    assert by_rank[1].season_id == 2425 and by_rank[1].team_id == 9617
    assert by_rank[1].GF == 69 and by_rank[1].GA == 34
    assert by_rank[2].team_id == 111  # Nottingham → Nott'ham forest
    assert by_rank[3].team_id == 222  # Sunderland A. → sunderland


def test_dim_stadium_synthetic(spark):
    raw = spark.createDataFrame(
        [
            ("Q619094", "Dean Court", "12000", 0),
            ("stadium_id", "statium_name", "capacity", 1),  # embedded header
            ("Q163995", "Emirates Stadium", "60338.0", 2),
            ("Q1", None, "5", 3),  # malformed: missing name
            ("Q2", "Somewhere", "capacity", 4),  # literal 'capacity'
        ],
        "stadium_id string, statium_name string, capacity string, __row long",
    )
    out = sorted(build_dim_stadium(raw).collect())
    assert [(r.stadium_id, r.statium_name, r.capacity) for r in out] == [
        (163995, "Emirates Stadium", 60338),
        (619094, "Dean Court", 12000),
    ]


def test_fact_player_match_synthetic(spark):
    """Raw player-match stats are absent from the snapshot
    (`.MISSING_LARGE_BLOBS`); the transform (`scr/Transform.py:507-696`)
    is exercised on a synthetic frame: embedded-header drop, the
    function's own pre-lowercase name map, the X2 clean chain, three
    dim lookups, FK drops, and the 29-column typed projection."""
    from etl_football_analytics_pipeline_spark.pipeline.football import (
        build_fact_player_match,
    )

    stats = ["12"] * 22 + ["0.5", "0.2", "88.9"]  # 22 ints + xG/xA/pass%

    def row(season, game, team, player):
        return (
            season, game, team, player,
            "90", "1", "0.5", "0.2", "0", "0", "0", "3", "1", "0", "0",
            "55", "2", "1", "1", "4", "1", "30", "40", "75.0", "5",
            "20", "3", "2", "1", 0,
        )

    schema = (
        "season string, game string, team string, player string, "
        "min string, Performance_Gls string, Expected_xG string, Expected_xAG string, "
        "Performance_Ast string, Performance_PK string, Performance_PKatt string, "
        "Performance_Sh string, Performance_SoT string, Performance_CrdY string, "
        "Performance_CrdR string, Performance_Touches string, Performance_Tkl string, "
        "Performance_Int string, Performance_Blocks string, SCA_SCA string, SCA_GCA string, "
        "Passes_Cmp string, Passes_Att string, `Passes_Cmp%` string, Passes_PrgP string, "
        "Carries_Carries string, Carries_PrgC string, `Take-Ons_Att` string, "
        "`Take-Ons_Succ` string, __row long"
    )
    raw = spark.createDataFrame(
        [
            ("season", "game", "team", "player") + ("x",) * 25 + (0,),  # embedded header
            row("2425", "2025-01-01 Arsenal-Chelsea", "Arsenal F.C.", "Bukayo Saka"),
            row("2425", "2025-01-01 Arsenal-Chelsea", "Manchester United", "Bruno Fernandes"),
            row("2425", "2025-01-01 Arsenal-Chelsea", "No Such Team", "Bukayo Saka"),  # team FK drop
            row("2425", "unknown-game", "Arsenal F.C.", "Bukayo Saka"),  # game FK drop
            row("2425", "2025-01-01 Arsenal-Chelsea", "Arsenal F.C.", "Nobody"),  # player FK drop
        ],
        schema,
    )
    dim_match = spark.createDataFrame(
        [(7, "2025-01-01 Arsenal-Chelsea")], "game_id long, game string"
    )
    dim_player = spark.createDataFrame(
        [(1, "Bukayo Saka"), (2, "Bruno Fernandes")], "player_id long, player string"
    )
    dim_team = spark.createDataFrame(
        [(9617, "Arsenal"), (100, "Manchester Utd")], "team_id long, team_name string"
    )
    out = build_fact_player_match(raw, dim_match, dim_player, dim_team)
    rows = {r.player_id: r for r in out.collect()}
    assert len(out.columns) == 29
    assert set(rows) == {1, 2}  # header + 3 FK-violating rows dropped
    saka = rows[1]
    assert (saka.season, saka.game_id, saka.team_id) == (2425, 7, 9617)
    assert saka.min_played == 90 and saka.goals == 1 and saka.touches == 55
    assert saka.xG == 0.5 and saka.pass_completion_percent == 75.0
    assert rows[2].team_id == 100  # Manchester United -> manchester utd
    # all 25 stat columns carry the Load-DDL types (ints + 3 doubles)
    types = dict(out.dtypes)
    assert types["goals"] == "bigint" and types["xG"] == "double"
    assert types["pass_completion_percent"] == "double"


def test_cleaning_helpers_edge_semantics(spark):
    """X5/X6/X7 edge contracts: split_two treats the separator as a
    LITERAL (metacharacters escaped); zero_pad never truncates
    (str.zfill semantics); encode_season reads the LAST two digits so
    the abbreviated '2024-25' form encodes correctly."""
    from pyspark.sql import functions as F

    from etl_football_analytics_pipeline_spark.functions.cleaning import (
        encode_season,
        split_two,
        zero_pad,
    )

    df = spark.createDataFrame(
        [("GF|GA", "100", "2024-25"), ("1|2", "7", "2024-2025")],
        "s string, n string, season string",
    )
    a, b = split_two("s", "|")
    rows = df.select(
        a.alias("a"), b.alias("b"),
        zero_pad("n", 2).alias("p"),
        encode_season("season").alias("code"),
    ).collect()
    assert (rows[0].a, rows[0].b) == ("GF", "GA")
    assert (rows[1].a, rows[1].b) == ("1", "2")
    assert rows[0].p == "100"  # zfill never truncates
    assert rows[1].p == "07"
    assert rows[0].code == 2425  # abbreviated form
    assert rows[1].code == 2425
