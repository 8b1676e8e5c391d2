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

__all__ = ["portable_hll_distinct", "PHLL_P", "phll_constants"]

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
    regs = (
        df.select(
            F.col(group_col).alias("key"),
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
