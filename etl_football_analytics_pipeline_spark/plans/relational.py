"""Relational operator inventory as named queries (SURVEY.md §2.1-2.9).

Each query re-expresses one reference operator (cited per-function as
`scr/<file>:<lines>`) against the driver's TPC-H-ish synthetic tables,
as an idiomatic Catalyst-optimizable DataFrame plan, with a DuckDB
oracle proving value-level equivalence.

Scale notes that apply across the module:
- dimension lookups broadcast explicitly (`F.broadcast`) — at 100 TB the
  fact side never shuffles for these joins;
- aggregates over double columns are computed in DECIMAL (exact,
  order-independent → identical under any partitioning; see
  `functions.cleaning.dec`);
- every top-k carries a unique tiebreak column, so `TakeOrderedAndProject`
  is deterministic across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import dec, div0, encode_season, normalize_str, strip_tokens
from ..sources.registry import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scans / projections / filters (S1, P1-P7, F1-F6)
# ---------------------------------------------------------------------------


@query(
    "s1_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_quantity < 10 AND l_shipdate >= TIMESTAMP '1995-01-01'
    """,
)
def s1_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 + P1 + F5 + D1 — scan with filter/projection pushdown.

    Reference: `pd.read_csv` full-file parse then subset
    (`scr/Transform.py:74-77,84`). Here the filter and the 4-column
    projection reach the parquet reader (PushedFilters / ReadSchema in
    the physical plan) — at 100 TB this is the difference between
    reading 4 columns of a row-group subset and reading everything.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") < 10) & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
    )


@query(
    "p_projection_suite",
    oracle="""
    SELECT p_partkey AS part_id,
           p_name    AS part_name,
           CAST(CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.9 AS DECIMAL(2,1)), 2) AS DECIMAL(18,2)) AS DOUBLE) AS discounted_price,
           CAST(NULL AS BIGINT) AS placeholder
    FROM part
    WHERE p_size > 40
    """,
)
def p_projection_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P5/P6/P7 — subset projection, bulk rename, derived column,
    constant (NULL) column, dropped columns.

    Reference: final fact/dim projections + renames
    (`scr/Transform.py:84-85,125,165-173`), derived columns
    (`scr/ui.py:190,620`), constant `df['born'] = pd.NA`
    (`scr/Transform.py:104`), drops (`scr/Transform.py:446,649`).

    Output-boundary convention (applies to every money column in the
    registry): the arithmetic runs in DECIMAL (exact, order-
    independent), the FINAL column is cast to DOUBLE on both engines —
    decimal→double is correctly rounded in both Spark and DuckDB, so
    the doubles are bit-identical, while engine-native decimal values
    canonicalize differently under the driver's value hasher.
    """
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_size") > 40)
        .select(
            F.col("p_partkey").alias("part_id"),
            F.col("p_name").alias("part_name"),
            (dec("p_retailprice", 18, 2) * F.lit(0.9).cast("decimal(2,1)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("discounted_price"),
            F.lit(None).cast("long").alias("placeholder"),
        )
    )


@query(
    "f1_notnull_filter",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
    """,
)
def f1_notnull_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3 — multi-column not-null key filter (`dropna(subset=...)`,
    `scr/Transform.py:113,320,333`; arity filter `:286`)."""
    ev = _t(spark, sf_dir, "events")
    return ev.na.drop(subset=["user_id", "event_type", "value"]).select(
        "event_id", "user_id", "event_type"
    )


@query(
    "f2_embedded_header_filter",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE NOT (lang = 'lang' AND source = 'source')
    """,
)
def f2_embedded_header_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — embedded-header-row filter: drop rows whose values equal the
    column names (`scr/Transform.py:143-144,288-290,527-529`). The
    synthetic tables contain no such rows, so this is a semantic no-op
    here; the predicate shape is what's under test.
    """
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        ~((F.col("lang") == F.lit("lang")) & (F.col("source") == F.lit("source")))
    ).select("doc_id", "lang", "source")


@query(
    "f4_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def f4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — key-membership anti-filter (`~isin`, `scr/Extract.py:285-289`)
    as a left_anti join: customers with no orders. At scale this is a
    shuffled anti-join on the key — Spark's native EXCEPT-by-key."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Joins (J1-J8)
# ---------------------------------------------------------------------------


@query(
    "j2_dim_lookup_left_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, s_name, s_nationkey
    FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_quantity >= 49
    """,
)
def j2_dim_lookup_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2/J4/J5 — left equi-join dimension-key lookup
    (`scr/Transform.py:449-453,466-470,664-668`). The dim side is
    broadcast: no shuffle of the fact table, which is the only plan
    shape that survives a 100 TB fact side."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    sup = _t(spark, sf_dir, "supplier")
    return li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey, "left").select(
        "l_orderkey", "l_linenumber", "s_name", "s_nationkey"
    )


@query(
    "j3_self_join_two_roles",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    GROUP BY cn.n_name, sn.n_name
    """,
)
def j3_self_join_two_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — the same dimension joined twice in two roles (reference:
    dim_team as team + opponent, `scr/Transform.py:456-463`,
    `scr/ui.py:284-285`). Spark expresses role separation with aliased
    plans; both nation joins broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    cn = nat.alias("cn")
    sn = nat.alias("sn")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(F.broadcast(sn), sup.s_nationkey == F.col("sn.n_nationkey"))
        .groupBy(
            F.col("cn.n_name").alias("cust_nation"),
            F.col("sn.n_name").alias("supp_nation"),
        )
        .agg(F.count(F.lit(1)).alias("n_lineitems"))
    )


@query(
    "j6_star_join_agg",
    oracle="""
    SELECT r_name AS region_name,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j6_star_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — multi-way star join + aggregate (the dashboard's fact ⋈ dims
    pattern, `scr/ui.py:66-67,85-87,283-287`). lineitem⋈orders is the
    only large-large join (sort-merge / shuffled-hash at scale); the
    dims broadcast so the star adds no further shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.sum(revenue).cast("decimal(18,2)").cast("double").alias("revenue"))
    )


@query(
    "j7_post_agg_join",
    oracle="""
    WITH ord AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_spend
      FROM orders GROUP BY o_custkey
    ), bal AS (
      SELECT c_custkey, c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
      FROM customer
    )
    SELECT c_custkey, c_name, acctbal, n_orders, CAST(total_spend AS DOUBLE) AS total_spend
    FROM bal JOIN ord ON c_custkey = o_custkey
    WHERE n_orders >= 8
    """,
)
def j7_post_agg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — join of two independently aggregated/derived inputs
    (offensive ⋈ defensive stats, `scr/ui.py:675-678`)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    ord_agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("decimal(18,2)").cast("double").alias("total_spend"),
    )
    bal = cust.select("c_custkey", "c_name", dec("c_acctbal").cast("double").alias("acctbal"))
    return (
        bal.join(ord_agg, bal.c_custkey == ord_agg.o_custkey)
        .filter(F.col("n_orders") >= 8)
        .select("c_custkey", "c_name", "acctbal", "n_orders", "total_spend")
    )


@query(
    "j8_fk_validation_audit",
    oracle="""
    WITH big_parts AS (SELECT p_partkey, p_brand FROM part WHERE p_size > 25)
    SELECT p_brand, COUNT(*) AS n_matched
    FROM lineitem JOIN big_parts ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def j8_fk_validation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — FK validation as left-join + null-filter (inner join with
    audit of dropped rows; `scr/Transform.py:634-645,671-683`). The
    audit count itself is a11_row_count_audit."""
    li = _t(spark, sf_dir, "lineitem")
    parts = _t(spark, sf_dir, "part").filter(F.col("p_size") > 25).select("p_partkey", "p_brand")
    joined = li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left")
    matched = joined.filter(F.col("p_partkey").isNotNull())
    return matched.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_matched"))


@query(
    "a11_row_count_audit",
    oracle="""
    WITH big_parts AS (SELECT p_partkey FROM part WHERE p_size > 25)
    SELECT COUNT(*) AS total_rows,
           COUNT(p_partkey) AS matched_rows,
           COUNT(*) - COUNT(p_partkey) AS dropped_rows
    FROM lineitem LEFT JOIN big_parts ON l_partkey = p_partkey
    """,
)
def a11_row_count_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 + J8 — the reference's inserted/skipped/total audit counts
    (`scr/Load.py:291-302,351-363,443-455`) as one aggregate over the
    validation join instead of three separate count() actions."""
    li = _t(spark, sf_dir, "lineitem")
    parts = _t(spark, sf_dir, "part").filter(F.col("p_size") > 25).select("p_partkey")
    joined = li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left")
    return joined.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count("p_partkey").alias("matched_rows"),
        (F.count(F.lit(1)) - F.count("p_partkey")).alias("dropped_rows"),
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A11)
# ---------------------------------------------------------------------------


@query(
    "a1_grouped_sum_topk",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    GROUP BY c_custkey, c_name
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) > 0
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def a1_grouped_sum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + A6 + T1 + J6 — the flagship "top scorers" shape: grouped SUM
    over a star join, HAVING, ORDER BY DESC, LIMIT (`scr/ui.py:78-92`).
    Spark plans this as partial+final hash agg then
    TakeOrderedAndProject — no global sort is materialized. The
    c_custkey tiebreak makes top-k deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(revenue).cast("decimal(18,2)").cast("double").alias("revenue"))
        .filter(F.col("revenue") > 0)
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 + A8 + N4 — multi-aggregate grouped summary (TPC-H Q1 shape;
    reference analog: grouped multi-SUM `scr/ui.py:178-188`, means
    `scr/ui.py:697-698`). Decimal sums are exact under any partitioning;
    the avg divides two exact values in double and rounds, so both
    engines agree."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("decimal(18,2)").cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "avg_qty",
            F.round(F.col("sum_qty") / F.col("count_order"), 2),
        )
    )


@query(
    "a3_global_agg_coalesce",
    oracle="""
    SELECT COALESCE(COUNT(DISTINCT o_orderkey), 0) AS n_orders,
           CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus = 'Z'
    """,
)
def a3_global_agg_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + N6 — global (no GROUP BY) aggregate with COALESCE defaults
    over an empty-match predicate (`scr/ui.py:120-127`)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "Z").agg(
        F.coalesce(F.countDistinct("o_orderkey"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.sum(dec("o_totalprice")), F.lit(0))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("total_price"),
    )


@query(
    "a4_count_distinct_grouped",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a4_count_distinct_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — grouped COUNT DISTINCT (`scr/ui.py:258-267`). Spark expands
    this to a two-phase aggregate; at scale prefer
    approx_count_distinct when exactness isn't required."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "a5_conditional_agg_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DECIMAL(18,2)) AS DOUBLE) AS urgent_price,
           CAST(CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'    THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DECIMAL(18,2)) AS DOUBLE) AS low_price,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_count,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'    THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a5_conditional_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — conditional aggregation (pivot-style SUM(CASE WHEN ...),
    the home/away points split at `scr/ui.py:199-215`)."""
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    low = F.col("o_orderpriority") == "5-LOW"
    price = dec("o_totalprice")
    zero = F.lit(0).cast("decimal(18,2)")
    return orders.groupBy("o_orderstatus").agg(
        F.sum(F.when(urgent, price).otherwise(zero))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("urgent_price"),
        F.sum(F.when(low, price).otherwise(zero))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("low_price"),
        F.sum(F.when(urgent, 1).otherwise(0)).alias("urgent_count"),
        F.sum(F.when(low, 1).otherwise(0)).alias("low_count"),
    )


@query(
    "a7_agg_arithmetic_div0",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / NULLIF(COUNT(DISTINCT l_orderkey), 0) AS DOUBLE), 2) AS avg_price_per_order
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a7_agg_arithmetic_div0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 + N3 + N4 — aggregate arithmetic with zero-guarded division
    (`ROUND(SUM(GF)::DECIMAL / NULLIF(COUNT(DISTINCT game_id),0), 2)`,
    `scr/ui.py:263,227,245`)."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(dec("l_extendedprice")).cast("double").alias("__sum"),
        F.countDistinct("l_orderkey").alias("__n"),
    )
    return agg.select(
        "l_returnflag",
        F.round(div0(F.col("__sum"), F.col("__n")), 2).alias("avg_price_per_order"),
    )


@query(
    "a9_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def a9_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — distinct projection (`SELECT DISTINCT dt.team_name`,
    `scr/ui.py:134-141`)."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "a10_dedup_keep_first",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC, l_partkey ASC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def a10_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — keep-first dedup by key with an explicit priority order
    (`drop_duplicates(subset=..., keep='first')`,
    `scr/Transform.py:107-110,346`). pandas keep-first depends on frame
    order; distributed shuffles destroy that, so the deterministic form
    is row_number over an explicit priority window."""
    li = _t(spark, sf_dir, "lineitem")
    # The synthetic lineitem has duplicate (l_orderkey, l_linenumber)
    # pairs, so the priority order must be made total with a tiebreaker
    # or the keep-first pick is nondeterministic across engines.
    w = Window.partitionBy("l_orderkey").orderBy(F.asc("l_linenumber"), F.asc("l_partkey"))
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / surrogate keys (T1-T6)
# ---------------------------------------------------------------------------


@query(
    "t2_recent_k_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def t2_recent_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T5 — recent-k per key (last 5 matches, `scr/ui.py:289-290`),
    generalized from the reference's global LIMIT to the per-group
    window form that actually distributes."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
    )


@query(
    "t5_bottom_k",
    oracle="""
    SELECT s_suppkey, s_name, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
    FROM supplier
    ORDER BY acctbal ASC, s_suppkey ASC
    LIMIT 10
    """,
)
def t5_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — bottom-k slicing (`tail(5)`/`nlargest`, `scr/ui.py:621,738-761`)
    as ORDER BY ASC + LIMIT with unique tiebreak."""
    sup = _t(spark, sf_dir, "supplier")
    return (
        sup.select("s_suppkey", "s_name", dec("s_acctbal").cast("double").alias("acctbal"))
        .orderBy(F.asc("acctbal"), F.asc("s_suppkey"))
        .limit(10)
    )


@query(
    "t6_surrogate_keys",
    oracle="""
    SELECT ROW_NUMBER() OVER (ORDER BY n_name ASC, n_nationkey ASC) AS surrogate_id,
           n_name, n_nationkey
    FROM nation
    """,
)
def t6_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 + T6 — deterministic sequential surrogate-key assignment
    (`np.arange(len)+1` after sort, `scr/Transform.py:116-119,351,372`).
    A global row_number window is a single-partition shuffle — correct
    and fine for dimension tables (≤ millions of rows). For fact-scale
    key assignment use operators.surrogate.zip_with_index (per-partition
    offsets, no single-partition bottleneck)."""
    nat = _t(spark, sf_dir, "nation")
    w = Window.orderBy(F.asc("n_name"), F.asc("n_nationkey"))
    return nat.select(
        F.row_number().over(w).cast("long").alias("surrogate_id"), "n_name", "n_nationkey"
    )


@query(
    "t6_surrogate_keys_scale",
    oracle="""
    SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey ASC) AS surrogate_id,
           o_orderkey
    FROM orders
    """,
)
def t6_surrogate_keys_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 at fact scale — operators.surrogate.zip_with_index: dense
    sequential ids over the full orders table WITHOUT the global-window
    single-partition funnel (range repartition → partition-local
    row_number + driver prefix-summed offsets; only one long per
    partition reaches the driver). o_orderkey is unique, so the
    assignment is total-order deterministic and hash-matches the
    oracle's global ROW_NUMBER."""
    from ..operators.surrogate import zip_with_index

    orders = _t(spark, sf_dir, "orders").select("o_orderkey")
    return zip_with_index(orders, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Set ops / MERGE (U1, M1-M3)
# ---------------------------------------------------------------------------


@query(
    "u1_union_by_name",
    oracle="""
    SELECT c_name AS name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS kind FROM supplier
    """,
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — schema-aligned UNION ALL (`pd.concat`,
    `scr/Transform.py:107`; `scr/Extract.py:291,296`)."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    )
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    return cust.unionByName(sup)


@query(
    "m1_merge_replace",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      FROM orders WHERE o_orderkey % 3 <> 0
    ), new AS (
      SELECT o_orderkey, CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1 AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT o_orderkey, totalprice FROM new
    UNION ALL
    SELECT o.o_orderkey, o.totalprice FROM old o
    WHERE NOT EXISTS (SELECT 1 FROM new n WHERE n.o_orderkey = o.o_orderkey)
    """,
)
def m1_merge_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2 — key-based incremental MERGE, new-wins (the reference's
    raw-layer upsert `scr/Extract.py:262-303` and dim ON CONFLICT DO
    UPDATE `scr/Load.py:79-89`): anti-join old against new keys, union
    new. Implemented by operators.merge.merge_replace; this query
    simulates old/new snapshots by splitting orders on key predicates."""
    from ..operators.merge import merge_replace

    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", dec("o_totalprice").cast("double").alias("totalprice")
    )
    new = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (dec("o_totalprice") + F.lit(1)).cast("decimal(18,2)").cast("double").alias("totalprice"),
    )
    return merge_replace(old, new, ["o_orderkey"])


@query(
    "m3_insert_if_absent",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0
    ), src AS (
      SELECT o_orderkey, 'NEW' AS o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT o_orderkey, o_orderstatus FROM target
    UNION ALL
    SELECT s.o_orderkey, s.o_orderstatus FROM src s
    WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)
    """,
)
def m3_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — insert-if-absent, old-wins (`ON CONFLICT DO NOTHING`,
    `scr/Load.py:276-302`): src anti-join target, append."""
    from ..operators.merge import insert_if_absent

    orders = _t(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 3 != 0).select("o_orderkey", "o_orderstatus")
    src = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.lit("NEW").alias("o_orderstatus")
    )
    return insert_if_absent(target, src, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Scalar functions (X1-X9, D1, N1-N6)
# ---------------------------------------------------------------------------


@query(
    "x1_x2_string_cleaning",
    oracle="""
    SELECT p_partkey,
           LOWER(TRIM(p_name)) AS name_norm,
           TRIM(REPLACE(REPLACE(p_type, 'BRUSHED', ''), 'PLATED', '')) AS type_stripped
    FROM part WHERE p_partkey <= 500
    """,
)
def x1_x2_string_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 + X2 — trim/lower normalization (`scr/Transform.py:395-404`)
    and ordered literal-token removal (the F.C./AFC suffix chains,
    `scr/Transform.py:235-242`)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        normalize_str("p_name").alias("name_norm"),
        strip_tokens("p_type", ["BRUSHED", "PLATED"]).alias("type_stripped"),
    )


@query(
    "x4_x6_split_pad",
    oracle="""
    SELECT p_partkey,
           SPLIT_PART(p_type, ' ', 1) AS type_first,
           LIST_EXTRACT(STRING_SPLIT(p_type, ' '), LEN(STRING_SPLIT(p_type, ' '))) AS type_last,
           LPAD(CAST(p_size AS VARCHAR), 2, '0') AS size_padded
    FROM part WHERE p_partkey <= 500
    """,
)
def x4_x6_split_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 + X5 + X6 — split + element extraction (`split(' ')[0]`,
    `split()[-1]`, `scr/Transform.py:358,482,780`) and zero-padding
    (`zfill(2)`, `scr/Transform.py:482`)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    parts_arr = F.split(F.col("p_type"), " ")
    return part.select(
        "p_partkey",
        parts_arr.getItem(0).alias("type_first"),
        F.element_at(parts_arr, -1).alias("type_last"),
        F.lpad(F.col("p_size").cast("string"), 2, "0").alias("size_padded"),
    )


@query(
    "x7_season_encode",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS VARCHAR) || '-' || CAST(YEAR(o_orderdate) + 1 AS VARCHAR) AS season_name,
           CAST(SUBSTRING(CAST(YEAR(o_orderdate) AS VARCHAR), 3, 2)
                || SUBSTRING(CAST(YEAR(o_orderdate) + 1 AS VARCHAR), 3, 2) AS INT) AS season_code
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def x7_season_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — season string encode `"2024-2025"` → 2425
    (`convert_season`, `scr/Transform.py:711-725`), built from a date
    column so the whole path (derive → encode) is exercised."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    year = F.year("o_orderdate")
    season_name = F.concat(year.cast("string"), F.lit("-"), (year + 1).cast("string"))
    return orders.select(
        "o_orderkey",
        season_name.alias("season_name"),
        encode_season(season_name).alias("season_code"),
    )


@query(
    "d1_n1_lenient_casts",
    oracle="""
    SELECT event_id,
           CAST(ts AS DATE) AS event_date,
           TRY_CAST(props AS BIGINT) AS props_as_long,
           TRY_CAST(event_type AS DOUBLE) AS type_as_double
    FROM events WHERE event_id <= 2000
    """,
)
def d1_n1_lenient_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 + N1/N2 — date derivation and lenient casts where invalid
    input yields NULL (`pd.to_numeric(errors='coerce')`,
    `scr/Transform.py:122,261`; date parse `:358-359`). Spark's CAST has
    coerce semantics natively (≡ DuckDB TRY_CAST)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return ev.select(
        "event_id",
        F.col("ts").cast("date").alias("event_date"),
        F.col("props").try_cast("long").alias("props_as_long"),
        F.col("event_type").try_cast("double").alias("type_as_double"),
    )
