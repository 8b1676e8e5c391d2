"""Coverage queries for the §2 operators not exercised by the core
suites: M2 upsert, A2/A8 aggregates, X3/X5/X8 string ops, F6 parse
filter, and the CSV ingestion layer S3/S4/S5 + P3 resolver as
end-to-end roundtrips. Each carries a DuckDB oracle; the CSV queries
materialize a deterministic temp copy and the oracle reads the same
parquet source, proving the roundtrip lossless.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import canonicalize_via_map, split_two, zero_pad
from ..functions.resolver import resolve_columns
from ..operators.merge import insert_if_absent, merge_replace
from ..sources.csv_utils import read_csv_dropmalformed, read_two_row_header_csv, write_csv
from ..sources.registry import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _tmp(sf_dir: str, tag: str) -> str:
    base = os.path.join(tempfile.gettempdir(), "spark_graft_csv", os.path.basename(sf_dir.rstrip("/")))
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, tag)


# ---------------------------------------------------------------------------
# M2 — upsert (ON CONFLICT DO UPDATE)
# ---------------------------------------------------------------------------


@query(
    "m2_upsert_dims",
    oracle="""
    WITH src AS (
      SELECT s_suppkey, s_name || '-v2' AS s_name, s_nationkey
      FROM supplier WHERE s_suppkey % 10 = 0
    )
    SELECT t.s_suppkey, t.s_name, t.s_nationkey
    FROM supplier t WHERE t.s_suppkey NOT IN (SELECT s_suppkey FROM src)
    UNION ALL
    SELECT s_suppkey, s_name, s_nationkey FROM src
    """,
)
def m2_upsert_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 — dimension UPSERT, new-wins (`INSERT ... ON CONFLICT (pk)
    DO UPDATE`, `scr/Load.py:79-89`): a delta updating every 10th
    supplier's name replaces the target rows by PK, unique target rows
    survive. Anti-join + union — one broadcastable join, no per-row
    round-trips."""
    target = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    src = target.filter(F.col("s_suppkey") % 10 == 0).withColumn(
        "s_name", F.concat(F.col("s_name"), F.lit("-v2"))
    )
    return merge_replace(target, src, ["s_suppkey"], broadcast_src=True)


@query(
    "m3_audit_counts",
    oracle="""
    WITH src AS (
      SELECT s_suppkey + 100000 AS s_suppkey, s_name, s_nationkey FROM supplier
      WHERE s_suppkey <= 50
      UNION ALL
      SELECT s_suppkey, s_name, s_nationkey FROM supplier WHERE s_suppkey <= 25
    )
    SELECT CAST((SELECT COUNT(*) FROM supplier) AS BIGINT) AS target_rows,
           CAST((SELECT COUNT(*) FROM src) AS BIGINT) AS source_rows,
           CAST((SELECT COUNT(*) FROM supplier)
                + (SELECT COUNT(*) FROM src WHERE s_suppkey >= 100000) AS BIGINT) AS result_rows
    """,
)
def m3_audit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 + M3 — the reference's inserted/skipped audit around an
    insert-if-absent load (`scr/Load.py:291-302`): 50 genuinely new
    keys and 25 conflicting ones; the audit row shows 25 skipped."""
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    fresh = sup.filter(F.col("s_suppkey") <= 50).withColumn(
        "s_suppkey", F.col("s_suppkey") + 100000
    )
    dup = sup.filter(F.col("s_suppkey") <= 25)
    src = fresh.unionByName(dup)
    result = insert_if_absent(sup, src, ["s_suppkey"])
    # one plan, one job: cross-join of three single-row aggregates
    # (the reference issues three separate COUNT round-trips)
    return (
        sup.agg(F.count(F.lit(1)).alias("target_rows"))
        .crossJoin(src.agg(F.count(F.lit(1)).alias("source_rows")))
        .crossJoin(result.agg(F.count(F.lit(1)).alias("result_rows")))
    )


# ---------------------------------------------------------------------------
# A2 / A8 — aggregates
# ---------------------------------------------------------------------------


@query(
    "a2_grouped_multisum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
           CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_tax
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a2_grouped_multisum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — grouped multi-SUM (`SUM(GF), SUM(xG) GROUP BY team_name`,
    `scr/ui.py:178-188`). One partial/final hash aggregate; decimal
    sums are order-independent under any partitioning."""
    li = _t(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(d("l_extendedprice")).cast("decimal(18,2)").alias("sum_price"),
        F.sum(d("l_quantity")).cast("decimal(18,2)").alias("sum_qty"),
        F.sum(d("l_tax")).cast("decimal(18,2)").alias("sum_tax"),
    )


@query(
    "a8_global_mean",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS mean_price,
           ROUND(CAST(SUM(CAST(c_acctbal   AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS mean_acctbal
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def a8_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — global means for the quadrant-split lines
    (`attack_defense[...].mean()`, `scr/ui.py:697-698`), computed over
    a join. Stated as exact decimal SUM / COUNT with one double
    division on both engines (engine-native AVG result types differ)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return j.agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_price"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_acctbal"),
    )


# ---------------------------------------------------------------------------
# X3 / X5 / X8 / X6 — string layer
# ---------------------------------------------------------------------------

_NATION_CANON = {
    "UNITED STATES": "USA",
    "UNITED KINGDOM": "UK",
    "GERMANY": "DEU",
    "FRANCE": "FRA",
}


@query(
    "x3_dict_mapping",
    oracle="""
    SELECT n_nationkey, n_name,
           CASE n_name
             WHEN 'UNITED STATES' THEN 'USA'
             WHEN 'UNITED KINGDOM' THEN 'UK'
             WHEN 'GERMANY' THEN 'DEU'
             WHEN 'FRANCE' THEN 'FRA'
             ELSE n_name END AS n_name_canonical
    FROM nation
    """,
)
def x3_dict_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — dictionary-based canonicalization (team-name maps,
    `scr/Transform.py:176-221,245-257`) as a broadcast mapping join
    with coalesce(mapped, original) — constant plan depth vs an
    O(|map|) when/otherwise chain."""
    nat = _t(spark, sf_dir, "nation")
    return canonicalize_via_map(nat, "n_name", _NATION_CANON, out_col="n_name_canonical").select(
        "n_nationkey", "n_name", "n_name_canonical"
    )


@query(
    "x5_x6_split_pad",
    oracle="""
    WITH j AS (
      SELECT o_orderkey,
             CAST(o_orderkey AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR) AS joined,
             o_custkey
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey,
           CAST(string_split(joined, ':')[1] AS BIGINT) AS left_part,
           CAST(string_split(joined, ':')[2] AS BIGINT) AS right_part,
           lpad(CAST(o_custkey % 100 AS VARCHAR), 3, '0') AS padded_bucket
    FROM j
    """,
)
def x5_x6_split_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 + X6 — split one column into two (`GF:GA` →
    `str.split(':', expand=True)`, `scr/Transform.py:788-790`) and
    zero-padding (`round.zfill(2)`, `:482`). The composite column is
    built then split back — the same shape as the reference's data."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    joined = orders.withColumn(
        "joined", F.concat_ws(":", F.col("o_orderkey"), F.col("o_custkey"))
    )
    left, right = split_two("joined", ":")
    return joined.select(
        "o_orderkey",
        left.cast("long").alias("left_part"),
        right.cast("long").alias("right_part"),
        zero_pad((F.col("o_custkey") % 100).cast("string"), 3).alias("padded_bucket"),
    )


@query(
    "x8_recent_form_string",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderstatus,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey,
           concat_ws('',
             MAX(CASE WHEN rn = 1 THEN o_orderstatus END),
             MAX(CASE WHEN rn = 2 THEN o_orderstatus END),
             MAX(CASE WHEN rn = 3 THEN o_orderstatus END),
             MAX(CASE WHEN rn = 4 THEN o_orderstatus END),
             MAX(CASE WHEN rn = 5 THEN o_orderstatus END)) AS recent_form
    FROM ranked WHERE rn <= 5
    GROUP BY o_custkey
    """,
)
def x8_recent_form_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 — the recent-form string: last-5 result letters concatenated
    newest-first (`scr/Extract.py:168-174` joins W/D/L tokens). The
    per-position max-case construction keeps concatenation order
    deterministic under any partitioning (collect_list order is not)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    ranked = orders.select(
        "o_custkey", "o_orderstatus", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 5)
    slots = [
        F.max(F.when(F.col("rn") == i, F.col("o_orderstatus"))).alias(f"__s{i}")
        for i in range(1, 6)
    ]
    agg = ranked.groupBy("o_custkey").agg(*slots)
    return agg.select(
        "o_custkey",
        F.concat_ws("", *[F.col(f"__s{i}") for i in range(1, 6)]).alias("recent_form"),
    )


# ---------------------------------------------------------------------------
# F6 — numeric-parseable filter
# ---------------------------------------------------------------------------


@query(
    "f6_numeric_parseable",
    oracle="""
    WITH mixed AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus
                  ELSE string_split(o_orderpriority, '-')[1] END AS rank_raw
      FROM orders
    )
    SELECT o_orderkey, CAST(rank_raw AS BIGINT) AS rank_num
    FROM mixed WHERE TRY_CAST(rank_raw AS BIGINT) IS NOT NULL
    """,
)
def f6_numeric_parseable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 + N2 — keep rows whose string parses as a number, then cast
    (the reference's Rank fallback, `scr/Transform.py:779-785`): a
    mixed column of digits and letters; `try_cast` NULL rows drop."""
    orders = _t(spark, sf_dir, "orders")
    mixed = orders.withColumn(
        "rank_raw",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderstatus")).otherwise(
            F.split(F.col("o_orderpriority"), "-").getItem(0)
        ),
    )
    return (
        mixed.withColumn("rank_num", F.col("rank_raw").try_cast("long"))
        .filter(F.col("rank_num").isNotNull())
        .select("o_orderkey", "rank_num")
    )


# ---------------------------------------------------------------------------
# S3 / S4 / S5 / P3 — CSV ingestion roundtrips
# ---------------------------------------------------------------------------


@query(
    "s5_csv_roundtrip",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations,
           SUM(n_nationkey) AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
)
def s5_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + S1 — CSV sink then CSV scan with explicit schema
    (`save_table` → `pd.read_csv`, `scr/Transform.py:19-22,74-77`):
    the nation table roundtrips through CSV losslessly, proven by the
    oracle aggregating the original parquet."""
    path = _tmp(sf_dir, "nation_csv")
    nat = _t(spark, sf_dir, "nation")
    write_csv(nat, path)
    back = spark.read.schema("n_nationkey int, n_name string, n_regionkey int").option(
        "header", "true"
    ).csv(path)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
    )


@query(
    "s4_dropmalformed",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def s4_dropmalformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — malformed-row-tolerant CSV scan (`on_bad_lines='skip'`,
    `scr/Transform.py:274-283`): the region CSV is written with two
    injected garbage lines; DROPMALFORMED drops exactly those, so the
    result equals the clean parquet."""
    path = _tmp(sf_dir, "region_bad.csv")
    reg = _t(spark, sf_dir, "region").orderBy("r_regionkey").collect()
    with open(path, "w") as fh:
        fh.write("r_regionkey,r_name\n")
        for i, row in enumerate(reg):
            if i == 1:
                fh.write("not_a_number,too,many,fields,entirely\n")
            fh.write(f"{row.r_regionkey},{row.r_name}\n")
        fh.write("also;not;csv;for;this;schema,x\n")
    return read_csv_dropmalformed(
        spark, path, "r_regionkey int, r_name string"
    ).select("r_regionkey", "r_name")


@query(
    "s3_two_row_header",
    oracle="""
    SELECT CAST(s_nationkey AS BIGINT) AS nation,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def s3_two_row_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 + P4 + P3 — two-row (MultiIndex) header CSV: the supplier
    table is written with FBref-style split headers
    (`Ident / key`, `Ident / nation`, `Balance / acct`), read back via
    the two-row-header reader (flattened `level0_level1` names), column-
    resolved to canonical names, and aggregated — matching the original
    parquet exactly (`scr/Extract.py:29-67`, `scr/Transform.py:25-66`)."""
    path = _tmp(sf_dir, "supplier_2row.csv")
    sup = _t(spark, sf_dir, "supplier").orderBy("s_suppkey").collect()
    with open(path, "w") as fh:
        fh.write("Ident,Ident,Balance\n")
        fh.write("key,nation,acct\n")
        for row in sup:
            fh.write(f"{row.s_suppkey},{row.s_nationkey},{row.s_acctbal!r}\n")
    raw = read_two_row_header_csv(spark, path)
    resolved = resolve_columns(
        raw,
        {
            "s_suppkey": ["Ident_key", "key"],
            "nation": ["Ident_nation"],
            "acct": ["Balance_acct"],
        },
    )
    return resolved.groupBy(F.col("nation").cast("long").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("acct").cast("decimal(18,2)")).cast("decimal(18,2)").alias("total_bal"),
    )
