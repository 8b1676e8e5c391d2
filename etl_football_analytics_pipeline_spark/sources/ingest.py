"""External-source ingestion adapters (reference S6/S7) — the bronze
boundary where out-of-engine data (API fetches, scraped DOM text)
becomes DataFrames.

The reference's two ingestion paths are:
- S6 API source (`scr/Extract.py:318-399`): fetch a table via an
  external client, `pd.DataFrame(...).reset_index()`, keyed merge with
  the existing raw CSV (`merge_with_existing_raw_data`), save;
- S7 web scrape (`scr/Extract.py:70-220`): four parallel element
  lists (ranks / teams / flat stat values / recent forms), the flat
  value list chunked into fixed 7-wide rows (`values[i:i+7]`,
  `:177`), dict rows assembled per team index with ""-padding for
  ragged data (`:183-198`).

Network clients (selenium, soccerdata) are not in this container and
ingestion fetch loops are driver-side by nature (rate-limited external
endpoints — NOT a distributed workload; the data only becomes "big"
after it lands in the bronze layer). So the fetch step is a
caller-supplied callable, the row-assembly semantics are exact and
unit-tested offline, and everything downstream (createDataFrame with
explicit schema → keyed raw MERGE → atomic parquet swap) is the real
Spark path the driver's parquet harness models.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_replace
from ..utils import commit_staged_dir, recover_swapped_dir

STANDINGS_COLUMNS = [
    "season",
    "match_category",
    "rank",
    "team",
    "mp",
    "w",
    "d",
    "l",
    "gf_ga",
    "gd",
    "pts",
    "recent_form",
]

# the reference's Vietnamese/display headers for the same row dict
# (`scr/Extract.py:184-198`): kept as the documented mapping, engine
# tables use the ASCII names above
REFERENCE_HEADER_MAP = {
    "season": "Mùa giải",
    "match_category": "Match_Category",
    "rank": "Rank",
    "team": "Team",
    "mp": "MP",
    "w": "W",
    "d": "D",
    "l": "L",
    "gf_ga": "GF:GA",
    "gd": "GD",
    "pts": "Pts",
    "recent_form": "Recent_Form",
}


def standings_rows(
    season: str,
    category: str,
    ranks: Sequence[str],
    teams: Sequence[str],
    values: Sequence[str],
    recent_forms: Sequence[str],
    row_width: int = 7,
) -> list[dict[str, str]]:
    """Assemble standings rows from the scrape's four parallel element
    lists — semantics exactly `scr/Extract.py:177-198`:

    - the flat stat-value list chunks into `row_width`-wide rows
      (`values[i:i+7]` — MP, W, D, L, GF:GA, GD, Pts);
    - a row is emitted only while a team exists at that index
      (`if i < len(teams)`);
    - every missing element (short chunk, short ranks/forms list)
      pads to "" rather than erroring — scraped DOMs are ragged.
    """
    if row_width < 7:
        # seven stat fields are read positionally below (mp..pts, the
        # reference's values[i:i+7] shape) — a narrower chunk would
        # IndexError on every row deep in the loop
        raise ValueError(f"row_width must be >= 7, got {row_width}")
    chunks = [list(values[i : i + row_width]) for i in range(0, len(values), row_width)]
    rows: list[dict[str, str]] = []
    for i, row in enumerate(chunks):
        if i >= len(teams):
            break
        row = row + [""] * (row_width - len(row))
        rows.append(
            {
                "season": season,
                "match_category": category,
                "rank": ranks[i] if i < len(ranks) else "",
                "team": teams[i],
                "mp": row[0],
                "w": row[1],
                "d": row[2],
                "l": row[3],
                "gf_ga": row[4],
                "gd": row[5],
                "pts": row[6],
                "recent_form": recent_forms[i] if i < len(recent_forms) else "",
            }
        )
    return rows


def ingest_table(
    spark: SparkSession,
    fetch: Callable[[], Sequence[Mapping[str, object]]],
    schema: str,
    max_retries: int = 3,
) -> DataFrame:
    """S6 — one external table fetch → typed DataFrame.

    `fetch` is the external client call (soccerdata table read, a
    paged REST loop, a scrape session — anything returning row
    mappings); it runs driver-side with bounded retries, mirroring
    the reference's fetch-then-frame step
    (`pd.DataFrame(player_season).reset_index()`,
    `scr/Extract.py:326-328`). The explicit schema string is the
    bronze contract — no inference on external data.
    """
    last: Exception | None = None
    for _ in range(max_retries):
        try:
            rows = fetch()
            break
        except Exception as exc:  # noqa: BLE001 — external call, retry then surface
            last = exc
    else:
        raise RuntimeError(f"fetch failed after {max_retries} attempts") from last
    # pass the mappings THEMSELVES: createDataFrame matches dict rows
    # by field NAME against the schema, whereas tuple(r.values()) is
    # positional — JSON APIs do not guarantee key order, so a row with
    # reordered keys would silently land values in the wrong columns
    return spark.createDataFrame(list(rows) if rows else [], schema)


def ingest_with_raw_merge(
    new_df: DataFrame,
    raw_path: str,
    keys: Sequence[str],
) -> DataFrame:
    """The reference's `merge_with_existing_raw_data` lifecycle
    (`scr/Extract.py:262-303`, called at `:335,354,374,394,205`):
    keyed MERGE of the fresh fetch into the existing raw table,
    new-wins, then persist — here a bulk anti-join MERGE (M1) and a
    crash-recovering parquet stage-and-rename swap instead of a CSV
    rewrite (an orphaned `.__old` from a crash between the renames is
    restored before the merge, so committed rows are never lost).
    Returns the merged frame re-read from the swapped path."""
    from ..utils import _hadoop_fs

    spark = new_df.sparkSession
    recover_swapped_dir(raw_path, spark)
    # existence through the Hadoop FS: os.path.isdir is always-false
    # for an HDFS/S3 raw table, and the swap below (which IS remote-
    # capable) would then retire and DELETE the live table, keeping
    # the new batch alone — same hazard class as merge_sink's probe
    fs, hp = _hadoop_fs(raw_path, spark)
    if fs.exists(hp(raw_path)):
        merged = merge_replace(spark.read.parquet(raw_path), new_df, list(keys))
    else:
        merged = new_df
    tmp = raw_path + ".__stage"
    merged.write.mode("overwrite").parquet(tmp)
    commit_staged_dir(raw_path, tmp, spark)
    spark.catalog.refreshByPath(raw_path)
    return spark.read.parquet(raw_path)
