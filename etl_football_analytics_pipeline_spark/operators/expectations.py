"""Data-quality expectations: declarative rules → valid / quarantine
splits and a per-rule violation report, all in one scan.

The reference's quality layer is implicit — malformed-row drops during
CSV ingest (`scr/Transform.py:60-75`, modeled by plans/coverage S4)
and the FK audit join (`scr/Load.py:210-239`, J8/A11). This module
generalizes both into the expectations pattern (the shape Delta Live
Tables / Great Expectations standardized): a rule is a named boolean
Column; rows failing any rule are quarantined with the list of rules
they failed; a report counts violations per rule.

Null semantics: a rule PASSES only when its predicate evaluates to
TRUE — a null predicate (e.g. `col > 0` on a null) counts as a
violation, matching DQ-tool convention rather than SQL CHECK's
null-passes convention. Write `col.isNull() | (col > 0)` to opt out
per rule.

Scale shape: everything is computed from ONE projection that attaches
the violation array to each row — no per-rule pass, no join, no
shuffle for the splits (narrow filters), and the report is a single
map-side-combined global aggregate (one row per task reaches the
exchange) unpivoted to (rule, n_violations) rows.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_violations", "expect_split", "expect_report", "profile_table"]

VIOLATIONS_COL = "violations"


def _violation_array(rules: Mapping[str, F.Column]) -> F.Column:
    """Array of names of failed rules (null-as-violation semantics),
    empty when the row passes everything."""
    tagged = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in rules.items()
    ]
    return F.array_compact(F.array(*tagged))


def with_violations(df: DataFrame, rules: Mapping[str, F.Column]) -> DataFrame:
    """df plus a `violations: array<string>` column naming every rule
    the row fails. Pure projection — zero shuffle."""
    return df.withColumn(VIOLATIONS_COL, _violation_array(rules))


def expect_split(
    df: DataFrame, rules: Mapping[str, F.Column]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): valid rows drop the violations column,
    quarantined rows keep it for triage. Two narrow filters over the
    same tagged projection — Catalyst shares the scan when both sides
    are consumed in one action, and either side alone reads the
    source exactly once."""
    tagged = with_violations(df, rules)
    valid = tagged.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    quarantine = tagged.filter(F.size(VIOLATIONS_COL) > 0)
    return valid, quarantine


def expect_report(df: DataFrame, rules: Mapping[str, F.Column]) -> DataFrame:
    """One row per rule: (rule, n_violations, n_checked, pass_rate).

    Single global aggregate — each rule folds to one SUM(CASE) slot,
    so the scan emits ONE partial row per task regardless of input
    size, and the unpivot to per-rule rows runs on that single merged
    row. Adding rules widens the row, never adds passes.
    """
    names = list(rules)
    aggs = [
        F.sum(
            F.when(~F.coalesce(rules[n], F.lit(False)), F.lit(1)).otherwise(F.lit(0))
        ).alias(f"__v_{i}")
        for i, n in enumerate(names)
    ] + [F.count(F.lit(1)).alias("__n")]
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"), F.col(f"__v_{i}").alias("n_violations")
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"), F.col("__n").alias("n_checked"))
        .select(
            F.col("p.rule").alias("rule"),
            F.col("p.n_violations").alias("n_violations"),
            "n_checked",
            F.round(
                (F.col("n_checked") - F.col("p.n_violations"))
                / F.col("n_checked").cast("double"),
                4,
            ).alias("pass_rate"),
        )
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column profile: one row per column with (column, n_nulls,
    n_distinct, min_str, max_str) — the summary a data engineer pulls
    before writing expectations (which null rates are real, which
    "enum" column has 40 values, whether a date column leaks 1970s).

    n_distinct is EXACT (count distinct excludes nulls, SQL
    semantics); min/max are canonicalized to strings so one schema
    profiles every column type.

    Two passes, each the cheap shape for its statistic:
    - nulls/min/max fold into ONE global aggregate (a slot per
      column, one partial row per task — no distinct machinery);
    - distinct counts AVOID the multi-count-distinct Expand plan
      (which multiplies scan rows by the column count and runs one
      distinct aggregation per column — measured ~7× slower):
      explode to (column_idx, value) pairs, let the map-side partial
      aggregate dedup them (the exchange carries distinct values
      only, not rows), and count per column. Swap the groupBy for
      approx_count_distinct when estimates suffice at 100 TB.
    The two small results broadcast-join on the column index.
    """
    names = cols if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(names):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{i}"),
        ]
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("__idx"),
                F.lit(c).alias("column"),
                F.col(f"__nn_{i}").alias("n_nulls"),
                F.col(f"__mn_{i}").alias("min_str"),
                F.col(f"__mx_{i}").alias("max_str"),
            )
            for i, c in enumerate(names)
        ]
    )
    base = row.select(F.explode(pairs).alias("p")).select("p.*")
    exploded = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("__idx"), F.col(c).cast("string").alias("__v")
                    )
                    for i, c in enumerate(names)
                ]
            )
        ).alias("p")
    ).select("p.*")
    distinct_counts = (
        exploded.filter(F.col("__v").isNotNull())
        .groupBy("__idx", "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__idx")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return (
        base.join(F.broadcast(distinct_counts), "__idx", "left")
        .select(
            "column",
            "n_nulls",
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            "min_str",
            "max_str",
        )
    )
