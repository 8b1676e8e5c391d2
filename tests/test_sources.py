"""CSV utilities + column resolver unit tests (reference S3/S4/S5,
P3/P4 behaviors)."""

from __future__ import annotations

import os
import tempfile

import pytest

from etl_football_analytics_pipeline_spark.functions.resolver import (
    find_column,
    resolve_columns,
)
from etl_football_analytics_pipeline_spark.sources.csv_utils import (
    flatten_header_levels,
    read_csv_dropmalformed,
    read_two_row_header_csv,
)


def test_flatten_header_levels_reference_semantics():
    # `scr/Extract.py:29-51`: join non-empty levels, drop Unnamed
    assert flatten_header_levels(
        ["Performance", "Performance", "Unnamed: 2", ""],
        ["Gls", "Ast", "player", "season"],
    ) == ["Performance_Gls", "Performance_Ast", "player", "season"]


def test_flatten_header_levels_dedupes():
    assert flatten_header_levels(["A", "A"], ["x", "x"]) == ["A_x", "A_x_1"]


def test_two_row_header_reader(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.csv")
        with open(path, "w") as fh:
            fh.write("Perf,Perf,Unnamed: 2\n")
            fh.write("gls,ast,player\n")
            fh.write("3,1,alice\n")
            fh.write("0,2,bob\n")
        df = read_two_row_header_csv(spark, path)
        assert df.columns == ["Perf_gls", "Perf_ast", "player"]
        rows = sorted((r.player, r.Perf_gls) for r in df.collect())
        assert rows == [("alice", "3"), ("bob", "0")]


def test_dropmalformed(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bad.csv")
        with open(path, "w") as fh:
            fh.write("k,v\n1,a\nnot_an_int,b\n2,c\n3,d,EXTRA,FIELDS\n4,e\n")
        df = read_csv_dropmalformed(spark, path, "k int, v string")
        rows = sorted((r.k, r.v) for r in df.collect())
        assert rows == [(1, "a"), (2, "c"), (4, "e")]


def test_find_column_case_insensitive_and_alias(spark):
    df = spark.createDataFrame([(1, "x")], "Team_ID int, Venue_Label string")
    assert find_column(df, "team_id") == "Team_ID"
    assert find_column(df, "club_id", "team_id") == "Team_ID"
    # MultiIndex-style suffix fallback: `label` matches `Venue_Label`
    assert find_column(df, "label") == "Venue_Label"
    with pytest.raises(KeyError):
        find_column(df, "missing_col")


def test_resolve_columns_projection(spark):
    df = spark.createDataFrame([(7, "anfield")], "CLUB_ID int, statium_name string")
    out = resolve_columns(
        df,
        {
            "team_id": ["club_id", "team_id"],
            # the reference's [sic] alias list, `scr/Transform.py:301-305`
            "stadium_name": ["venue_label", "stadium_name", "statium_name"],
        },
    )
    assert out.columns == ["team_id", "stadium_name"]
    assert out.collect()[0].team_id == 7
