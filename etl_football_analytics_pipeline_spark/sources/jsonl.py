"""JSONL document-corpus source — the raw format web-scale text dumps
arrive in (one JSON object per line, frequently with malformed lines
mid-file).

Spark's native json source covers this with the right knobs; this
module pins the contract an LLM bronze layer needs:

- explicit schema (no inference pass over terabytes of text);
- PERMISSIVE mode with a named corrupt-record column, so malformed
  lines become auditable rows instead of lost data (the JSONL analog
  of the CSV layer's DROPMALFORMED, reference S4 —
  `scr/Transform.py:274-283`);
- a split into (good, bad) frames so the pipeline can load good rows
  and quarantine bad ones in one pass each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read JSONL with an explicit schema; malformed lines land in
    `corrupt_col` with every schema column NULL. The returned frame
    includes the corrupt column — use `split_corrupt` to separate."""
    full_schema = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, quarantined_raw_lines).

    Spark refuses to answer queries that reference ONLY the internal
    corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the
    scanned frame is materialized first (localCheckpoint) — the
    spirit of the documented cache() workaround, with storage that
    releases when the frames are dropped; a quarantining loader wants
    the single read anyway (good and bad rows share one scan)."""
    df = df.localCheckpoint()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad
