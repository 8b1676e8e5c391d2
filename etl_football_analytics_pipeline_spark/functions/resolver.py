"""Flexible column resolution (reference P3).

The reference resolves column *presence and naming* at runtime with
`_get_column` (case-insensitive, MultiIndex-or-flat lookup,
`scr/Transform.py:25-66`) and `pick_column` (alias lists — e.g.
`team_id` ← `club_id`|`team_id`, `stadium_name` ← `venue_label`|
`stadium_name`|`statium_name` [sic], `scr/Transform.py:146-163,
292-307`). Both are pure driver-side metadata logic over `df.columns`
— they cost nothing at execution time and keep the data pass a plain
projection.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_column(df: DataFrame, *candidates: str) -> str:
    """First existing column among `candidates`, case-insensitively;
    also matches flattened `level0_level1` composites by their level1
    suffix (the reference's MultiIndex fallback). Raises KeyError if
    none match — same contract as `_get_column`."""
    lower = {c.lower(): c for c in df.columns}
    for cand in candidates:
        hit = lower.get(cand.lower())
        if hit is not None:
            return hit
    for cand in candidates:
        suffix = "_" + cand.lower()
        for lc, orig in lower.items():
            if lc.endswith(suffix):
                return orig
    raise KeyError(f"none of {candidates!r} found in {df.columns}")


def resolve_columns(df: DataFrame, spec: Mapping[str, Sequence[str]]) -> DataFrame:
    """Project `df` to canonical names: for each `canonical: [aliases]`
    entry, pick the first alias present (find_column rules) and alias
    it. The resulting plan is a plain `select` — Catalyst sees only the
    final projection."""
    cols = [F.col(find_column(df, *aliases)).alias(canonical) for canonical, aliases in spec.items()]
    return df.select(*cols)
