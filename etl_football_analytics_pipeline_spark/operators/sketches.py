"""Portable sketch aggregates.

Engine-native sketches (`approx_count_distinct`, `hll_sketch_agg`,
`percentile_approx`) are the production 100 TB tier — fixed-size
mergeable state per group instead of expanded rows or global sorts —
but their estimates are engine-specific bit patterns no other system
can reproduce, so a cross-engine value oracle is impossible for them.

This module adds a PORTABLE HyperLogLog whose every intermediate is
recomputable from ANSI SQL: md5-derived 60-bit hashes, register index
from the top `p` bits, rho from the bit-length of the remainder, and
an exact integer register sum (the 2^-M terms are scaled by 2^(60-p)
so the merge arithmetic is integer, not float).  DuckDB replays the
identical pipeline and the estimates match bit-for-bit after the
output rounding — the same portable-family pattern as the md5 MinHash
/ SimHash tiers (operators/dedup.py).

Scale shape matches native HLL exactly: one map-side-combinable
(key, register) max — the shuffle carries at most m rows per group —
then one tiny per-key fold.  The md5 hash is ~3× slower per row than
xxhash64, which is the price of oracle portability; production callers
wanting the cheaper hash should use `approx_count_distinct`.

Reference scope: the reference pipeline has no sketch tier (its
distinct counts are exact pandas `nunique`, `scr/Transform.py`); this
is a scale extension, paired with the exact tier in
`plans/relational.py` (a4_count_distinct_grouped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "portable_hll_distinct",
    "PHLL_P",
    "phll_constants",
    "portable_cms",
    "portable_cms_point",
    "misra_gries_topk",
    "misra_gries_point_est",
    "misra_gries_point_from_summary",
    "CMS_D",
    "CMS_W",
]

# 60-bit hash (15 md5 hex chars — the repo's portable-family width,
# chosen so the signed-64 cast can never overflow in either engine).
_HASH_BITS = 60
PHLL_P = 10  # register-index bits → m = 1024 registers (rsd ≈ 3.25%)


def phll_constants(p: int = PHLL_P) -> dict:
    """The literal constants both engines must share, computed ONCE in
    Python and embedded verbatim (repr round-trips doubles exactly) so
    neither engine re-derives them with different associativity."""
    m = 1 << p
    wbits = _HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return {
        "m": m,
        "wbits": wbits,
        "wmask": (1 << wbits) - 1,
        # raw estimate numerator alpha * m^2 * 2^wbits, one double
        "num": alpha * m * m * float(1 << wbits),
        "lc_cutoff": 2.5 * m,  # linear-counting switchover
    }


def _rho(w: Column, wbits: int) -> Column:
    """Position of the first set bit in a wbits-wide word (1-based
    from the left) — bin() strips leading zeros in both engines, so
    rho = wbits + 1 - bit_length(w), and the all-zero word takes the
    conventional maximum wbits + 1."""
    return F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )


def portable_hll_distinct(
    df: DataFrame,
    group_col: str,
    val_col: str,
    p: int = PHLL_P,
    round_to: int = 4,
    assume_distinct: bool = False,
) -> DataFrame:
    """Per-group approximate COUNT DISTINCT via the portable HLL.

    Returns (key, phll double, n_exactable long is NOT computed here —
    pair with an exact aggregate when a referee is wanted).  Flajolet
    et al.'s estimator with the standard linear-counting small-range
    correction; no large-range branch (a 60-bit hash space never
    saturates at any realistic cardinality).

    Determinism: registers merge by MAX (order-free), the register sum
    is exact integer arithmetic (each 2^-M term scaled to the integer
    2^(wbits-M)), and the only float steps — one division by the
    integer total and the ln() of the linear-counting branch — are
    computed from identical operands in any engine, so the estimate is
    partitioning-independent AND cross-engine reproducible (asserted
    in tests/test_sketches.py; value-oracled via sketch_suite)."""
    c = phll_constants(p)
    h = F.conv(
        F.substring(F.md5(F.col(val_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    reg = F.shiftright(h, c["wbits"])
    w = h.bitwiseAND(F.lit(c["wmask"]))
    # NULLs never count toward a distinct estimate (native
    # approx_count_distinct ignores them); without this filter md5(NULL)
    # yields a NULL register row that inflates cnt by one and shrinks
    # both the absent-register mass and the linear-counting v.
    #
    # Hash the DISTINCT (key, val) domain, not every row: registers
    # are a MAX over values, so duplicates contribute nothing, and the
    # pre-distinct replaces an md5+base-conversion per input row with
    # one per distinct value — the distinct itself is a map-side-
    # combined shuffle of two narrow columns, far cheaper than the
    # hashing it removes (measured ~200x fewer digests on lineitem
    # suppkeys). Values are bit-identical either way.
    # `assume_distinct`: callers that already hold the distinct
    # (key, val) frame (e.g. one shared with an exact referee) skip
    # the second distinct pass.
    dedup = (
        df.filter(F.col(val_col).isNotNull())
        .select(F.col(group_col).alias("key"), F.col(val_col))
    )
    if not assume_distinct:
        dedup = dedup.distinct()
    regs = (
        dedup
        .select(
            "key",
            reg.alias("reg"),
            _rho(w, c["wbits"]).alias("rho"),
        )
        .groupBy("key", "reg")
        .agg(F.max("rho").alias("m_j"))
    )
    # present registers have m_j >= 1 so each scaled term 2^(wbits-m_j)
    # fits a long; the absent-register contribution is (m - cnt) whole
    # 2^wbits units.  Total <= m * 2^wbits = 2^(wbits+p) = 2^60: exact
    # in BIGINT in both engines.
    stats = regs.groupBy("key").agg(
        F.sum(F.expr(f"shiftleft(1L, {c['wbits']} - m_j)")).alias("s_present"),
        F.count(F.lit(1)).alias("cnt"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(c["m"]) - F.col("cnt")) * F.lit(1 << c["wbits"])
    ).cast("double")
    raw = F.lit(c["num"]) / s_total
    v = (F.lit(c["m"]) - F.col("cnt")).cast("double")  # zero registers
    est = F.when(
        (raw <= F.lit(c["lc_cutoff"])) & (v > 0),
        F.lit(float(c["m"])) * F.log(F.lit(float(c["m"])) / v),
    ).otherwise(raw)
    return stats.select("key", F.round(est, round_to).alias("phll"))


# ---------------------------------------------------------------------------
# Portable count-min sketch (point frequency estimates)
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 64  # counters per row


def _cms_bucket(h60: Column, j: int, w: int) -> Column:
    """Row-j bucket from a value's 60-bit md5 hash: row j reads its
    own non-overlapping 15-bit slice of the ONE hash long and reduces
    it mod w — d independent addresses for the price of a single md5 +
    single base conversion per input row (both dominate the build
    scan; hashing/converting once instead of d times is a straight d×
    saving), pure bit arithmetic after. Nonnegative in both engines."""
    return (F.shiftright(h60, 15 * j).bitwiseAND(F.lit(32767))) % w


def _cms_bucket_py(val: str, j: int, w: int) -> int:
    """Driver-side mirror of _cms_bucket for literal query values."""
    import hashlib

    h60 = int(hashlib.md5(val.encode()).hexdigest()[:15], 16)
    return ((h60 >> (15 * j)) & 32767) % w


def portable_cms(
    df: DataFrame,
    group_col: str,
    val_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Per-group count-min sketch as a RELATION: (key, j, bucket, c)
    with one counter row per non-empty cell — at most d×w rows per
    group regardless of input size, the CMS analog of the phll
    register table. Build is ONE scan: each input row explodes to its
    d (row, bucket) cells and a map-side-combined groupBy sums them.
    Every intermediate is md5/modular arithmetic, so any ANSI engine
    replays the sketch bit-for-bit (the portable-family contract)."""
    h60 = F.conv(
        F.substring(F.md5(F.col(val_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cms_bucket(h60, j, w).alias("bucket")
            )
            for j in range(d)
        ]
    )
    # Pre-aggregate (key, val) counts BEFORE hashing: cell counters are
    # sums over values, so hashing each distinct value once and summing
    # its count is bit-identical to hashing every row — and the cheap
    # narrow-column pre-agg (map-side combined) replaces an md5 + base
    # conversion + d-cell explode per input row with one per distinct
    # value (the explode alone was d x the corpus in intermediate rows).
    pre = (
        df.select(F.col(group_col).alias("key"), F.col(val_col))
        .groupBy("key", val_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        pre.select("key", F.col("__n"), F.explode(cells).alias("__c"))
        .select(
            "key", "__n", F.col("__c.j").alias("j"), F.col("__c.bucket").alias("bucket")
        )
        .groupBy("key", "j", "bucket")
        .agg(F.sum("__n").alias("c"))
    )


def portable_cms_point(
    cms: DataFrame,
    queries: list[str],
    d: int = CMS_D,
    w: int = CMS_W,
    keys: DataFrame | None = None,
) -> DataFrame:
    """Point frequency estimates for literal query values against a
    portable_cms relation: est(key, q) = min over the d rows of the
    addressed counters (absent counter = 0). CMS never underestimates
    — est >= true count always, and est <= true + eps*N with
    probability 1-delta (eps = e/w, delta = e^-d) — the classic
    Cormode-Muthukrishnan bounds, asserted in tests.

    Returns (key, q, est long) for EVERY (group key, query) pair.
    Scale shape: the (q, j, bucket) probe table is d×|queries| literal
    rows broadcast against the sketch relation; per (key, q) the MIN
    folds d values — no corpus-side work at all once the sketch
    exists (the pre-aggregated sketch-table pattern: store the CMS
    per partition/day, answer point queries by probing)."""
    spark = cms.sparkSession
    probe = spark.createDataFrame(
        [(q, j, _cms_bucket_py(q, j, w)) for q in queries for j in range(d)],
        "q string, j int, bucket long",
    )
    # `keys` (optional): the distinct group keys, when the caller
    # already has them (a suite's referee aggregate, a dimension
    # table) — they must COVER the sketch's groups (a missing key
    # silently yields no estimates for that group; a surplus key
    # yields all-zero estimates, which is correct for an empty group).
    # Without them the probe must derive keys FROM the sketch,
    # which evaluates the sketch lineage twice — so that path
    # materializes it once via an eager localCheckpoint
    # (ContextCleaner-freed). With keys supplied the probe is a single
    # lazy evaluation, free to overlap with sibling stages in one job.
    if keys is None:
        cms = cms.localCheckpoint(eager=True)
        keys = cms.select("key").distinct()
    else:
        keys = keys.select("key").distinct()
    full = keys.crossJoin(F.broadcast(probe))
    return (
        full.join(cms, ["key", "j", "bucket"], "left")
        .groupBy("key", "q")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Misra-Gries / Space-Saving heavy hitters (mergeable summaries)
# ---------------------------------------------------------------------------


def misra_gries_topk(
    df: DataFrame,
    val_col: str,
    k: int = 64,
) -> DataFrame:
    """Approximate heavy hitters with a k-counter Misra-Gries summary
    per partition, merged once: returns (value, est, err_bound) where
    est is a LOWER bound on the true count and est + err_bound an
    upper bound (err_bound = the summary's total decrement weight).
    If every merged counter cancels (flat streams) the summary is one
    (NULL, 0, err_bound) carrier row — never an empty frame with the
    bound silently dropped; empty input returns an empty frame.

    GUARANTEE (asserted in tests): every value with true frequency
    > n/(k+1) survives; reported est is within n·P/(k+1) of truth
    for P merged partials. Use when the value domain is too large for
    an exact groupBy (the full shuffle would carry every distinct
    value) but only the dominant items matter — domain skimming for
    dedup policy, hot-key detection before a join, vocabulary caps.

    Scale shape: ONE mapInPandas pass emits <= k+1 rows per partition
    ((value, weight) survivors plus one (NULL, decrements) row); the
    driver-side merge touches only P·(k+1) rows. Nothing corpus-sized
    leaves the executors, and there is no shuffle at all.

    Kernel form: per Arrow batch a vectorized value_counts folds into
    a counter dict, and whenever the dict outgrows its cap the
    standard mergeable-summaries reduction (Agarwal et al.) runs —
    subtract the (k+1)-th largest weight t from every counter, drop
    non-positives, accumulate t into the decrement total. Each
    reduction's t satisfies (k+1)·t <= weight seen so far, so the
    classic MG error bound (err <= n/(k+1) per partial) and the
    survival guarantee are preserved (asserted in tests), while the
    per-element Python loop of textbook MG — whose state mutates on
    every element — collapses to per-DISTINCT-per-batch dict updates.
    Memory stays bounded by cap + one batch's distinct set (Arrow
    batches are size-capped), never the partition's domain."""
    import pandas as pd

    def _reduce(counters: dict, limit: int) -> tuple[dict, int]:
        if len(counters) <= limit:
            return counters, 0
        t = sorted(counters.values(), reverse=True)[limit]
        return {v: c - t for v, c in counters.items() if c - t > 0}, t

    def partials(batches):
        counters: dict = {}
        dec = 0
        cap = max(8 * k, 1024)
        for pdf in batches:
            vc = pdf[val_col].astype("string").dropna().value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                counters, t = _reduce(counters, k)
                dec += t
        counters, t = _reduce(counters, k)
        dec += t
        out = pd.DataFrame(
            {
                "value": list(counters) + [None],
                "weight": list(counters.values()) + [0],
                "dec": [0] * len(counters) + [dec],
            }
        )
        yield out

    summaries = df.select(val_col).mapInPandas(
        partials, "value string, weight long, dec long"
    ).collect()
    counters: dict = {}
    total_dec = 0
    for r in summaries:
        if r.value is None:
            total_dec += r.dec
        else:
            counters[r.value] = counters.get(r.value, 0) + r.weight
    spark = df.sparkSession
    # proper MG merge reduction (Agarwal et al., mergeable summaries):
    # summed weights can exceed k counters, so subtract the (k+1)-th
    # largest weight from all and drop non-positives — NOT a plain
    # top-k cut, which could evict a guaranteed heavy hitter whose
    # lower-bound est trails an overcounted light item
    if len(counters) > k:
        t = sorted(counters.values(), reverse=True)[k]
        total_dec += t
        counters = {v: c - t for v, c in counters.items() if c - t > 0}
    # the empty-survivor check must run AFTER the merge reduction —
    # the reduction itself can cancel every counter (near-uniform
    # merged weights), and that path must ALSO preserve the bound
    if not counters:
        if total_dec == 0:  # genuinely empty input
            return spark.createDataFrame(
                [], "value string, est long, err_bound long"
            )
        # every merged counter cancelled (flat/near-uniform stream) —
        # emit ONE NULL-value carrier row so the total decrement weight
        # survives: the MG guarantee is "any absent value's true count
        # <= err_bound", and an empty frame would make point lookups
        # report err_bound=0, i.e. claim absent values never occur
        return spark.createDataFrame(
            [(None, 0, total_dec)], "value string, est long, err_bound long"
        )
    rows = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(
        [(v, c, total_dec) for v, c in rows],
        "value string, est long, err_bound long",
    )


def misra_gries_point_from_summary(
    spark, summary: DataFrame, queries: list[str]
) -> DataFrame:
    """Point lookups against an ALREADY-BUILT Misra-Gries summary
    relation ((value, est, err_bound) rows, e.g. one persisted by a
    prior misra_gries_topk run — the sketch-table pattern: the summary
    is the stored corpus asset, probes never re-scan the corpus).
    Same output contract as misra_gries_point_est."""
    rows = summary.collect()
    err = rows[0].err_bound if rows else 0
    got = {r.value: r.est for r in rows}
    return spark.createDataFrame(
        [(q, got.get(q), err) for q in queries],
        "q string, est long, err_bound long",
    )


def misra_gries_point_est(
    df: DataFrame, val_col: str, queries: list[str], k: int = 64
) -> DataFrame:
    """Point lookups into a merged Misra-Gries summary for a FIXED
    query set: (q, est, err_bound) with est NULL when q did not
    survive the summary, err_bound the summary's total decrement
    weight on every row (so an absent value's true count is provably
    ≤ err_bound, and a present value's is in [est, est + err_bound]).

    Driver-bounded by construction — the summary misra_gries_topk
    returns is at most k rows, so reading it here costs O(k); the
    result is a literal frame ready to broadcast-join against an
    exact-count referee (no global aggregate, no extra shuffle)."""
    rows = misra_gries_topk(df, val_col, k).collect()
    err = rows[0].err_bound if rows else 0
    got = {r.value: r.est for r in rows}
    return df.sparkSession.createDataFrame(
        [(q, got.get(q), err) for q in queries],
        "q string, est long, err_bound long",
    )
