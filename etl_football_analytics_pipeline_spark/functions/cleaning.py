"""Scalar-function layer (reference operators X1-X9, N1-N6, D1).

The reference implements every one of these as a row-wise pandas
`.apply` lambda or `.str` method chain (e.g. `clean_team_name` at
`scr/Transform.py:237-242`, `convert_season` at `scr/Transform.py:711-719`,
normalization at `scr/Transform.py:395-404`). Row-at-a-time Python is
the slow path on Spark, so all of these are pure Column expressions:
they stay inside whole-stage codegen on the JVM, vectorize, and cost
nothing extra at 100 TB. None of them requires a UDF.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_str(c: Column | str) -> Column:
    """X1 — trim + lowercase, the reference's pre-join normalization
    (`scr/Transform.py:395-404`)."""
    return F.lower(F.trim(F.col(c) if isinstance(c, str) else c))


def strip_tokens(c: Column | str, tokens: Iterable[str]) -> Column:
    """X2 — remove literal tokens (the reference strips `F.C.`/`AFC`
    suffixes and `Q` id prefixes, `scr/Transform.py:235-242,260`).

    Tokens are applied in the given order — the reference's replace
    chains are order-sensitive, so parity demands a deterministic
    sequence of `regexp_replace` calls.
    """
    col = F.col(c) if isinstance(c, str) else c
    for t in tokens:
        # escape regex metacharacters: the reference removes literal substrings
        escaped = "".join("\\" + ch if ch in r"\.^$*+?()[]{}|" else ch for ch in t)
        col = F.regexp_replace(col, escaped, "")
    return F.trim(col)


def canonicalize_via_map(
    df: DataFrame,
    col_name: str,
    mapping: Mapping[str, str],
    out_col: str | None = None,
) -> DataFrame:
    """X3 — dictionary-based value canonicalization.

    The reference hardcodes dict replaces (`scr/Transform.py:176-221,
    245-257`). A chained `when/otherwise` works for tiny maps but
    produces an O(|map|)-deep expression tree; the scale-friendly form
    is a broadcast left join against a mapping table with
    `coalesce(mapped, original)` — constant plan depth, and the map
    ships once per executor as a broadcast, not once per task.
    """
    out_col = out_col or col_name
    spark = df.sparkSession
    map_df = spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], schema=f"__map_key string, __map_val string"
    )
    joined = df.join(F.broadcast(map_df), df[col_name] == map_df["__map_key"], "left")
    return joined.withColumn(
        out_col, F.coalesce(F.col("__map_val"), F.col(col_name))
    ).drop("__map_key", "__map_val")


def split_two(c: Column | str, sep: str) -> tuple[Column, Column]:
    """X5 — split one column into two (the reference's `GF:GA` →
    GF, GA, `scr/Transform.py:788-790`). `sep` is a LITERAL separator:
    F.split takes a Java regex, so metacharacters ('|', '.') are
    escaped — an unescaped '|' would split on the empty match and
    return ('', first-char)."""
    import re as _re

    col = F.col(c) if isinstance(c, str) else c
    parts = F.split(col, _re.escape(sep))
    return parts.getItem(0), parts.getItem(1)


def zero_pad(c: Column | str, width: int = 2) -> Column:
    """X6 — `str.zfill` equivalent (`scr/Transform.py:482`). zfill
    never truncates, so values already >= `width` pass through
    unchanged (bare lpad would cut '100' to '10' at width 2)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(F.length(col) >= width, col).otherwise(
        F.lpad(col, width, "0")
    )


def encode_season(c: Column | str) -> Column:
    """X7 — season string encode: `"2024-2025"` → 2425
    (`scr/Transform.py:711-725`). LAST two digits of each year
    (substring from the END, so the abbreviated '2024-25' form also
    encodes 2425 instead of a silently wrong code), concatenated,
    cast to int; malformed input → NULL (the reference returns None
    on ValueError)."""
    col = F.col(c) if isinstance(c, str) else c
    y0 = F.substring(F.split(col, "-").getItem(0), -2, 2)
    y1 = F.substring(F.split(col, "-").getItem(1), -2, 2)
    return F.concat(y0, y1).try_cast("int")


def lenient_long(c: Column | str) -> Column:
    """N1 — lenient numeric parse, invalid → NULL
    (`pd.to_numeric(errors='coerce')`, `scr/Transform.py:122` et al.).
    `try_cast` gives exactly these semantics under ANSI mode (Spark 4
    default), where a plain cast would throw on malformed input."""
    return (F.col(c) if isinstance(c, str) else c).try_cast("long")


def div0(num: Column, den: Column) -> Column:
    """N3 — zero-guarded division, `x / NULLIF(y, 0)`
    (`scr/ui.py:227,245,263`)."""
    return num / F.when(den == 0, F.lit(None)).otherwise(den)


def dec(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast to decimal for cross-engine-exact aggregation.

    Summing doubles is order-dependent in a distributed reduction;
    decimal arithmetic is exact, so Spark and the DuckDB oracle agree
    bit-for-bit regardless of partitioning. Used by every money/
    quantity aggregate in the plan layer.
    """
    return (F.col(c) if isinstance(c, str) else c).cast(f"decimal({precision},{scale})")


def scaled_long(c: Column | str, frac_digits: int = 2) -> Column:
    """Exact scaled-integer representation: value × 10^frac_digits as a
    LONG, computed as round(x·10^f) in double arithmetic — the hot path
    never touches a decimal type (a per-row double→decimal cast measured
    ~0.4 s/600k rows on the j6 star join; this form is free).

    Exactness contract: the source column must hold FIXED-POINT data
    with at most `frac_digits` fractional decimal digits (money/quantity
    columns). For such values x·10^f lands within ~1e-9 of the true
    integer (double error ≤ half-ulp per step), so the round recovers it
    exactly and the result equals `(dec(c,18,f) * 10^f) :: long`
    bit-for-bit (property-tested). The caller owns the range contract
    (value × 10^frac_digits must fit a long — ~9.2e18)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * (10**frac_digits)).cast("long")


#: power-of-two split point for `exact_scaled_sum` — shifts/masks stay
#: single codegen instructions, unlike a base-10 div/mod pair.
_SUM_SPLIT_BITS = 20


def exact_scaled_sum(
    scaled: Column, frac_digits: int, precision: int = 18, scale: int = 2
) -> Column:
    """Exact, order-independent SUM over a `scaled_long`-style column,
    returned as decimal(precision, scale) — bit-identical to
    `sum(CAST(... AS DECIMAL))` but ~2× faster.

    Why not `F.sum(dec(...))`: any decimal product widens past
    precision 18 (p = p1+p2+1), and Spark stores precision->18 decimals
    as non-compact byte arrays in the agg hash map — the slow
    BigDecimal path on every row. Here the per-row hot path is pure
    long math; only the final per-GROUP combine touches decimal.

    Overflow safety at 100 TB: the long is split on a 2^20 boundary
    (x = (x >> 20)·2^20 + (x & mask), exact for two's complement; the
    masked low word is always non-negative). Each half is summed as a
    long: sum(lo) < rows · 2^20 and sum(hi) ≤ rows · max/2^20, so with
    per-row values ≤ 1e10 (e.g. price·discount in e4 units) a single
    group can hold ~10^12 rows before either half can overflow —
    versus ~10^8 rows for an unsplit long sum. The halves recombine in
    decimal(38) exactly, then one half-up rounding cast to the target
    type — the same rounding `dec`-sums produce, so oracle hashes are
    unchanged."""
    hi = F.shiftright(scaled, _SUM_SPLIT_BITS)
    lo = scaled.bitwiseAND(F.lit((1 << _SUM_SPLIT_BITS) - 1))
    total = F.sum(hi).cast("decimal(38,0)") * (1 << _SUM_SPLIT_BITS) + F.sum(lo)
    # divide back to the true value: result scale ≥ frac_digits, so the
    # division is exact; the final cast applies half-up rounding once
    descaled = total / F.lit(10**frac_digits).cast("decimal(19,0)")
    return descaled.cast(f"decimal({precision},{scale})")


# SQL-string twins of scaled_long / exact_scaled_sum (r12, guide §7.3:
# string expressions build in ONE py4j round trip and one analysis
# pass; the Column forms above cost ~8 JVM calls each on the hottest
# aggregation paths). Same constants, same trees — the SQL parser
# produces the identical unresolved expressions, so values and oracle
# hashes cannot change (the parity gate re-proves it per round).


def scaled_long_sql(col_sql: str, frac_digits: int = 2) -> str:
    """SQL form of ``scaled_long``: round(x·10^f) cast to LONG."""
    return f"CAST(round(({col_sql}) * {10 ** frac_digits}) AS LONG)"


def exact_scaled_sum_sql(
    scaled_sql: str, frac_digits: int, precision: int = 18, scale: int = 2
) -> str:
    """SQL form of ``exact_scaled_sum`` over a scaled-long expression."""
    mask = (1 << _SUM_SPLIT_BITS) - 1
    total = (
        f"CAST(SUM(shiftright({scaled_sql}, {_SUM_SPLIT_BITS})) AS DECIMAL(38,0)) "
        f"* {1 << _SUM_SPLIT_BITS} + SUM(({scaled_sql}) & {mask})"
    )
    return (
        f"CAST(({total}) / CAST({10 ** frac_digits} AS DECIMAL(19,0)) "
        f"AS DECIMAL({precision},{scale}))"
    )
