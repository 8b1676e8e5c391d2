"""Distributed per-group top-k.

A plain `row_number() OVER (PARTITION BY group ...)` sends EVERY row
of a group to one task — for few groups over a big table (per-query
retrieval lists, per-language corpora) that single task sorts a
corpus-sized partition. This operator is the standard two-stage fix:

  stage 1: row_number within (group, salt) keeps k per salt bucket —
           group-local work spreads over `salt_buckets` tasks;
  stage 2: the final (group) window ranks the <= k * salt_buckets
           survivors — bounded input by construction.

The result is EXACTLY the plain window's answer whenever the order
key is a TOTAL order within each group (stage 1 can only discard rows
that stage 2 would rank > k; with ties unbroken the discarded row
could be a legitimate winner, so the helper requires a tie-breaker).
Used by BM25 retrieval (operators/text.py); exposed because the shape
recurs anywhere "top k per key" meets "few keys, many rows".

Reference scope: generalizes T1/T2/T5 (top-k, recent-k per group —
`scr/ui.py` LIMIT queries) to the scale regime; no reference
counterpart for the salted form.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["grouped_topk"]


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt_col: str | Column | None = None,
    salt_buckets: int = 64,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per group under ``order_cols`` (pass fully
    specified directions, e.g. ``[F.desc("score"), F.asc("id")]`` —
    the combination MUST totally order rows within a group, or the
    salted prune may disagree with the plain window).

    ``salt_col`` picks the stage-1 spreading key. The FINAL result
    never depends on the salt (stage 2 re-ranks the survivors under
    the same total order), so the default — ``spark_partition_id() %
    salt_buckets``, free to compute and pre-shuffled by definition —
    is safe; pass a stable column (an id) when the intermediate
    stage-1 frame itself must be reproducible across input layouts.

    Adds ``rank_col`` (1..k per group)."""
    if k <= 0:
        raise ValueError("k must be positive")
    groups = list(group_cols)
    if salt_col is None:
        salt: Column = F.spark_partition_id() % salt_buckets
    elif isinstance(salt_col, str):
        salt = F.pmod(F.hash(F.col(salt_col)), F.lit(salt_buckets))
    else:
        salt = F.pmod(F.hash(salt_col), F.lit(salt_buckets))
    w1 = W.partitionBy(*groups, salt).orderBy(*order_cols)
    w2 = W.partitionBy(*groups).orderBy(*order_cols)
    return (
        df.withColumn("__rp", F.row_number().over(w1))
        .filter(F.col("__rp") <= k)
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop("__rp")
    )
