"""Registry entries for the warehouse-history and data-quality layers:
SCD Type-2 + snapshot CDC, declarative expectations, and blocked fuzzy
matching — every leg fully value-oracled (no RNG, no hash seeds the
oracle can't mirror).

These extend the reference's warehouse semantics the way production
deployments do: its dims are current-state-only (`scr/Load.py:79-89`
overwrites in place), its quality checks are implicit (malformed-row
drops + the FK audit), and its name canonicalization is a static
dictionary (`scr/Transform.py:137-176`). SCD2 adds history, the
expectations suite generalizes the checks, fuzzy matching finds the
name variants no dictionary anticipated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import dec
from ..operators.expectations import with_violations
from ..operators.fuzzy import fuzzy_pairs
from ..operators.scd import scd2_build, scd2_lookup, table_diff
from ..sources.registry import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "warehouse_history_suite",
    oracle="""
    WITH feed AS (
      SELECT o_custkey AS k, o_orderstatus AS attr, o_orderdate AS ts, o_orderkey AS tb
      FROM orders WHERE o_custkey <= 2000
    ), prev AS (
      SELECT k, attr, ts, tb,
             LAG(attr) OVER w AS pattr, LAG(ts) OVER w AS pts
      FROM feed WINDOW w AS (PARTITION BY k ORDER BY ts ASC, tb ASC)
    ), starts AS (
      SELECT * FROM prev WHERE pts IS NULL OR attr IS DISTINCT FROM pattr
    ), hist AS (
      SELECT k, attr, ts,
             LEAD(ts) OVER w2 AS eff_to,
             ROW_NUMBER() OVER w2 AS version
      FROM starts WINDOW w2 AS (PARTITION BY k ORDER BY ts ASC, tb ASC)
    ), old AS (
      SELECT o_orderkey, o_orderstatus AS status,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 3 <> 0
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS status,
             CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                  + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS DECIMAL(18,2)) AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 2 = 0
    ), diff AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
             CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                  WHEN n.o_orderkey IS NULL THEN 'delete'
                  WHEN o.status IS DISTINCT FROM n.status
                       OR o.price IS DISTINCT FROM n.price THEN 'update' END AS change_type,
             o.status AS old_status, n.status AS new_status,
             o.price AS old_price, n.price AS new_price
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT 'scd2' AS part, k AS k1, CAST(version AS BIGINT) AS k2,
           attr AS s1, CAST(ts AS VARCHAR) AS s2, CAST(eff_to AS VARCHAR) AS s3,
           CASE WHEN eff_to IS NULL THEN 1.0 ELSE 0.0 END AS v1,
           CAST(NULL AS DOUBLE) AS v2
    FROM hist
    UNION ALL
    SELECT 'cdc' AS part, k AS k1, CAST(NULL AS BIGINT) AS k2,
           change_type AS s1, old_status AS s2, new_status AS s3,
           old_price AS v1, new_price AS v2
    FROM diff WHERE change_type IS NOT NULL
    UNION ALL
    SELECT 'lookup' AS part, o.tb AS k1, CAST(h.version AS BIGINT) AS k2,
           h.attr AS s1, CAST(NULL AS VARCHAR) AS s2, CAST(NULL AS VARCHAR) AS s3,
           CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2
    FROM feed o JOIN hist h ON h.k = o.k
     AND o.ts >= h.ts AND (h.eff_to IS NULL OR o.ts < h.eff_to)
    """,
)
def warehouse_history_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 + snapshot CDC (operators/scd.py), one suite.

    - part='scd2': full Type-2 history of each customer's order-status
      state over time (scd2_build: one key-partitioned window pass,
      consecutive no-op changes collapse, effective_from/to + version);
    - part='cdc': insert/update/delete change rows between two
      simulated warehouse snapshots of orders (table_diff: ONE
      full-outer hash join, null-safe compares, output bounded by the
      churn). The snapshots reuse the merge-suite convention of
      carving old/new from orders by key predicates;
    - part='lookup': POINT-IN-TIME enrichment (scd2_lookup) — every
      order joined to the status state valid at its own order date
      (half-open intervals; one hash equi-join, ≤1 match per fact by
      construction). The join the reference's current-state-only dims
      cannot express.
    """
    orders = _t(spark, sf_dir, "orders")
    feed = orders.filter(F.col("o_custkey") <= 2000).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderstatus").alias("attr"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tb"),
    )
    hist = scd2_build(feed, ["k"], ["attr"], "ts", "tb")
    scd2 = hist.select(
        F.lit("scd2").alias("part"),
        F.col("k").alias("k1"),
        F.col("version").cast("long").alias("k2"),
        F.col("attr").alias("s1"),
        F.col("effective_from").cast("string").alias("s2"),
        F.col("effective_to").cast("string").alias("s3"),
        F.when(F.col("is_current"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("v1"),
        F.lit(None).cast("double").alias("v2"),
    )
    old = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        dec("o_totalprice").cast("double").alias("price"),
    )
    new = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        (
            dec("o_totalprice")
            + F.when(F.col("o_orderkey") % 7 == 0, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("decimal(18,2)")
        .cast("double")
        .alias("price"),
    )
    cdc = table_diff(old, new, ["o_orderkey"], ["status", "price"]).select(
        F.lit("cdc").alias("part"),
        F.col("o_orderkey").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.col("change_type").alias("s1"),
        F.col("old_status").alias("s2"),
        F.col("new_status").alias("s3"),
        F.col("old_price").alias("v1"),
        F.col("new_price").alias("v2"),
    )
    lookup = scd2_lookup(feed.select("k", "ts", "tb"), hist, ["k"], "ts").select(
        F.lit("lookup").alias("part"),
        F.col("tb").alias("k1"),
        F.col("version").cast("long").alias("k2"),
        F.col("attr").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.lit(None).cast("string").alias("s3"),
        F.lit(None).cast("double").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
    )
    return scd2.unionByName(cdc).unionByName(lookup)


# rule order matters: the quarantine leg joins violation names in
# DEFINITION order, and the oracle's concat_ws mirrors it
_DQ_RULES = (
    ("qty_le_25", "l_quantity <= 25"),
    ("discount_le_5pct", "l_discount <= 0.05"),
    ("flag_not_returned", "l_returnflag <> 'R'"),
    ("shipped_by_1997", "YEAR(l_shipdate) <= 1997"),
)


@query(
    "dq_expectations_suite",
    oracle=f"""
    WITH t AS (
      SELECT (NOT COALESCE({_DQ_RULES[0][1]}, FALSE)) AS v0,
             (NOT COALESCE({_DQ_RULES[1][1]}, FALSE)) AS v1x,
             (NOT COALESCE({_DQ_RULES[2][1]}, FALSE)) AS v2x,
             (NOT COALESCE({_DQ_RULES[3][1]}, FALSE)) AS v3x
      FROM lineitem
    ), rep AS (
      SELECT '{_DQ_RULES[0][0]}' AS rule, CAST(SUM(CASE WHEN v0 THEN 1 ELSE 0 END) AS BIGINT) AS nv, COUNT(*) AS nc FROM t
      UNION ALL
      SELECT '{_DQ_RULES[1][0]}', CAST(SUM(CASE WHEN v1x THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM t
      UNION ALL
      SELECT '{_DQ_RULES[2][0]}', CAST(SUM(CASE WHEN v2x THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM t
      UNION ALL
      SELECT '{_DQ_RULES[3][0]}', CAST(SUM(CASE WHEN v3x THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM t
    )
    SELECT 'report' AS part, rule AS s1, nv AS k1, nc AS k2,
           ROUND((nc - nv) / CAST(nc AS DOUBLE), 4) AS v1
    FROM rep
    UNION ALL
    SELECT 'quarantine' AS part, viol AS s1, COUNT(*) AS k1,
           CAST(NULL AS BIGINT) AS k2, CAST(NULL AS DOUBLE) AS v1
    FROM (
      SELECT concat_ws(',',
               CASE WHEN v0 THEN '{_DQ_RULES[0][0]}' END,
               CASE WHEN v1x THEN '{_DQ_RULES[1][0]}' END,
               CASE WHEN v2x THEN '{_DQ_RULES[2][0]}' END,
               CASE WHEN v3x THEN '{_DQ_RULES[3][0]}' END) AS viol
      FROM t
    ) WHERE viol <> '' GROUP BY viol
    UNION ALL
    SELECT 'profile' AS part,
           'l_orderkey' || '|' || CAST(MIN(l_orderkey) AS VARCHAR) || '|' || CAST(MAX(l_orderkey) AS VARCHAR) AS s1,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k1,
           COUNT(DISTINCT l_orderkey) AS k2, CAST(NULL AS DOUBLE) AS v1
    FROM lineitem
    UNION ALL
    SELECT 'profile',
           'l_linenumber' || '|' || CAST(MIN(l_linenumber) AS VARCHAR) || '|' || CAST(MAX(l_linenumber) AS VARCHAR),
           CAST(SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_linenumber), CAST(NULL AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'profile',
           'l_returnflag' || '|' || MIN(l_returnflag) || '|' || MAX(l_returnflag),
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_returnflag), CAST(NULL AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'profile',
           'l_shipdate' || '|' || CAST(MIN(l_shipdate) AS VARCHAR) || '|' || CAST(MAX(l_shipdate) AS VARCHAR),
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_shipdate), CAST(NULL AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'profile',
           'l_quantity' || '|' || CAST(MIN(l_quantity) AS VARCHAR) || '|' || CAST(MAX(l_quantity) AS VARCHAR),
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_quantity), CAST(NULL AS DOUBLE)
    FROM lineitem
    """,
)
def dq_expectations_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over lineitem
    (operators/expectations.py), one suite.

    - part='report': per-rule (violations, checked, pass_rate) — one
      map-side-combined global aggregate, every rule a SUM(CASE) slot;
    - part='quarantine': quarantined-row counts grouped by the exact
      violation set (the triage view) — violation names join in rule
      DEFINITION order on both engines.

    - part='profile': exact column profile — per column null count,
      exact distinct count, canonicalized min/max (the
      operators.expectations.profile_table statistics; fused here, see
      below, with equality to the operator composition pinned by
      tests/test_expectations.py).

    The rules deliberately include failing ones; a report full of
    100% pass rates would test nothing.

    Physical shape (r12, guide §1.2/§2.4 — remove passes before
    tuning anything else): ONE wide aggregate keyed by the violation
    combo (≤ 2^|rules| groups) replaces three of the suite's former
    four lineitem passes. The combo counts ARE the quarantine rows;
    the report re-derives per-rule violation totals from the ≤16-row
    combo frame (a rule's violations = the sum of combo counts whose
    set contains it, n_checked = the sum of all combo counts — exactly
    expect_report's SUM(CASE) slots, associativity making the two
    plans value-identical); and the per-column null/min/max slots ride
    the same pass as combo-level partials re-aggregated on the tiny
    frame (min of per-combo typed mins = the global typed min). The
    exact-distinct pass keeps its own explode shape (distinct
    machinery cannot fold into the combo key), so lineitem is scanned
    TWICE per run instead of four times. The combo frame is
    localCheckpoint'ed (≤16 rows — the same bounded-materialization
    discipline as the dedup suites' shared frames, freed on GC): per-
    branch column pruning would otherwise specialize the aggregate
    under each consumer and re-scan lineitem three times (measured —
    canonical-plan reuse does NOT survive pruning), whereas the
    checkpoint pins exactly one fact-table pass for all three."""
    li = _t(spark, sf_dir, "lineitem")
    rules = {
        "qty_le_25": F.col("l_quantity") <= 25,
        "discount_le_5pct": F.col("l_discount") <= 0.05,
        "flag_not_returned": F.col("l_returnflag") != "R",
        "shipped_by_1997": F.year("l_shipdate") <= 1997,
    }
    names = list(rules)
    prof_cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate", "l_quantity"]
    aggs = [F.count(F.lit(1)).alias("__c")]
    for i, c in enumerate(prof_cols):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{i}"),
            F.min(c).alias(f"__mn_{i}"),
            F.max(c).alias(f"__mx_{i}"),
        ]
    combo = (
        with_violations(li, rules)
        .groupBy(F.array_join("violations", ",").alias("s1"))
        .agg(*aggs)
        .localCheckpoint()
    )
    quarantine = combo.filter(F.col("s1") != "").select(
        F.lit("quarantine").alias("part"),
        "s1",
        F.col("__c").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("double").alias("v1"),
    )
    # report: expect_report's slots re-derived from the combo frame.
    # Rule names never contain ',' (the join delimiter), so membership
    # of a rule in a combo's split set is exact.
    rep_row = combo.agg(
        *[
            F.sum(
                F.when(F.array_contains(F.split("s1", ","), n), F.col("__c"))
                .otherwise(F.lit(0))
            ).alias(f"__v_{i}")
            for i, n in enumerate(names)
        ],
        F.sum("__c").alias("__n"),
    )
    rpairs = F.array(
        *[
            F.struct(F.lit(n).alias("rule"), F.col(f"__v_{i}").alias("nv"))
            for i, n in enumerate(names)
        ]
    )
    report = (
        rep_row.select(F.explode(rpairs).alias("p"), F.col("__n").alias("n_checked"))
        .select(
            F.lit("report").alias("part"),
            F.col("p.rule").alias("s1"),
            F.col("p.nv").alias("k1"),
            F.col("n_checked").alias("k2"),
            F.round(
                (F.col("n_checked") - F.col("p.nv"))
                / F.col("n_checked").cast("double"),
                4,
            ).alias("v1"),
        )
    )
    # profile nulls/min/max: re-aggregate the combo partials (typed;
    # the string canonicalization happens after the final min/max,
    # exactly as profile_table does it)
    prow = combo.agg(
        *[
            x
            for i in range(len(prof_cols))
            for x in (
                F.sum(f"__nn_{i}").alias(f"__sn_{i}"),
                F.min(f"__mn_{i}").alias(f"__fmn_{i}"),
                F.max(f"__mx_{i}").alias(f"__fmx_{i}"),
            )
        ]
    )
    ppairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("__idx"),
                F.lit(c).alias("column"),
                F.col(f"__sn_{i}").alias("n_nulls"),
                F.col(f"__fmn_{i}").cast("string").alias("min_str"),
                F.col(f"__fmx_{i}").cast("string").alias("max_str"),
            )
            for i, c in enumerate(prof_cols)
        ]
    )
    pbase = prow.select(F.explode(ppairs).alias("p")).select("p.*")
    # exact distinct counts: profile_table's explode shape (map-side
    # partial dedup; the exchange carries distinct values, not rows)
    exploded = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("__idx"), F.col(c).cast("string").alias("__v")
                    )
                    for i, c in enumerate(prof_cols)
                ]
            )
        ).alias("p")
    ).select("p.*")
    distinct_counts = (
        exploded.filter(F.col("__v").isNotNull())
        .groupBy("__idx", "__v")
        .agg(F.count(F.lit(1)).alias("__dc"))
        .groupBy("__idx")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    profile = (
        pbase.join(F.broadcast(distinct_counts), "__idx", "left")
        .select(
            F.lit("profile").alias("part"),
            F.concat_ws(
                "|", "column",
                F.coalesce("min_str", F.lit("")), F.coalesce("max_str", F.lit("")),
            ).alias("s1"),
            F.col("n_nulls").alias("k1"),
            F.coalesce("n_distinct", F.lit(0)).alias("k2"),
            F.lit(None).cast("double").alias("v1"),
        )
    )
    return report.unionByName(quarantine).unionByName(profile)


@query(
    "fuzzy_match_dedup",
    oracle="""
    WITH n AS (
      SELECT s_suppkey AS id, LOWER(TRIM(s_name)) AS nm FROM supplier
    ), k AS (
      SELECT id, nm, 0 AS bi, SUBSTRING(nm, 13, 6) AS bk FROM n
      UNION ALL
      SELECT id, nm, 1 AS bi, SUBSTRING(nm, 10, 3) || SUBSTRING(nm, 16, 3) AS bk FROM n
      UNION ALL
      SELECT id, nm, 2 AS bi, SUBSTRING(nm, 10, 6) AS bk FROM n
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS name_a, b.nm AS name_b
      FROM k a JOIN k b ON a.bi = b.bi AND a.bk = b.bk AND a.id < b.id
      WHERE levenshtein(a.nm, b.nm) <= 1
    ), rt AS (
      SELECT id + 100000 AS rid,
             SUBSTRING(nm, 1, 11) || 'x' || SUBSTRING(nm, 13) AS rnm
      FROM n
    ), rk AS (
      SELECT rid, rnm, 0 AS bi, SUBSTRING(rnm, 13, 6) AS bk FROM rt
      UNION ALL
      SELECT rid, rnm, 1 AS bi, SUBSTRING(rnm, 10, 3) || SUBSTRING(rnm, 16, 3) AS bk FROM rt
      UNION ALL
      SELECT rid, rnm, 2 AS bi, SUBSTRING(rnm, 10, 6) AS bk FROM rt
    ), xmatch AS (
      SELECT DISTINCT l.id, r.rid, l.nm, r.rnm, levenshtein(l.nm, r.rnm) AS dist
      FROM k l JOIN rk r ON l.bi = r.bi AND l.bk = r.bk
      WHERE levenshtein(l.nm, r.rnm) <= 1
    ), best AS (
      SELECT id, rid, nm, rnm, dist,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist ASC, rid ASC) AS rn
      FROM xmatch
    )
    SELECT 'self' AS part, id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
    FROM cand
    UNION ALL
    SELECT 'join' AS part, id AS id_a, rid AS id_b, nm AS name_a, rnm AS name_b,
           CAST(dist AS INTEGER) AS dist
    FROM best WHERE rn = 1
    """,
)
def fuzzy_match_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching over supplier names
    (operators/fuzzy.py + pigeonhole_blocks), one suite.

    - part='self': within-table pairs within Levenshtein 1
      (fuzzy_pairs). The name shape 'supplier#ddddddddd' is the
      degenerate regime for naive prefix blocking (every name shares
      the prefix), so the blocks are the 3-region pigeonhole over the
      9 varying digits: each key concatenates 2 of the 3 digit
      regions, so one substitution anywhere leaves a full key intact
      (TOTAL recall at distance 1) while key cardinality grows with
      the corpus and block sizes stay bounded;
    - part='join': cross-table RECORD LINKAGE (fuzzy_join,
      best_match_only) — every supplier linked to its closest name in
      a deterministically typo'd copy (digit 3 replaced by 'x'), ties
      broken by lowest right id; the systematic form of the
      reference's hand-maintained name dictionary.

    shuffle_hash candidate joins, exact verify before the cross-block
    dedup, nothing broadcast. Fully deterministic, hence the complete
    value oracle.
    """
    from ..operators.fuzzy import fuzzy_join, pigeonhole_blocks

    sup = _t(spark, sf_dir, "supplier")
    blocks = pigeonhole_blocks(10, 9)
    self_part = fuzzy_pairs(
        sup, "s_suppkey", "s_name", max_dist=1, blocks=blocks
    ).select(
        F.lit("self").alias("part"),
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.col("dist").cast("int").alias("dist"),
    )
    typod = sup.select(
        (F.col("s_suppkey") + 100000).alias("rid"),
        F.concat(
            F.substring("s_name", 1, 11), F.lit("x"), F.substring("s_name", 13, 1 << 20)
        ).alias("rnm"),
    )
    join_part = fuzzy_join(
        sup, typod, "s_suppkey", "s_name", "rid", "rnm",
        max_dist=1, blocks=blocks, best_match_only=True,
    ).select(
        F.lit("join").alias("part"),
        F.col("left_id").alias("id_a"),
        F.col("right_id").alias("id_b"),
        F.col("left_name").alias("name_a"),
        F.col("right_name").alias("name_b"),
        F.col("dist").cast("int").alias("dist"),
    )
    return self_part.unionByName(join_part)
