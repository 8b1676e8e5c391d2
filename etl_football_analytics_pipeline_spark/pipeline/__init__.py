"""The football star-schema build pipeline (reference §3 lifecycle),
re-expressed as lazy Spark plans over the raw CSV layer."""

from .football import (
    build_dim_match,
    build_dim_player,
    build_dim_season,
    build_dim_stadium,
    build_dim_team,
    build_fact_team_match,
    build_fact_team_point,
    read_csv_with_order,
    run_pipeline,
)

__all__ = [
    "build_dim_match",
    "build_dim_player",
    "build_dim_season",
    "build_dim_stadium",
    "build_dim_team",
    "build_fact_team_match",
    "build_fact_team_point",
    "read_csv_with_order",
    "run_pipeline",
]
