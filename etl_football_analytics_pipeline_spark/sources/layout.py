"""Data-skipping file layout: Z-order clustered parquet writes.

Parquet scans prune with per-file and per-row-group min/max statistics
— but statistics only skip if the data is CLUSTERED on the filter
columns. A table sorted on one column skips beautifully on that column
and not at all on any other; Z-ordering interleaves the bits of
several columns' ranks so that files cover small rectangles of the
multi-dimensional key space, and range filters on ANY of the ordered
columns skip most files (the technique behind Delta/Iceberg OPTIMIZE
ZORDER, built here from primitives Spark already has).

Everything is JVM-side Column arithmetic: per-column min/max from one
bounded agg, linear rank to `bits`-bit integers, bit interleave as a
sum of shifts (whole-stage-codegen-friendly), then
repartitionByRange + sortWithinPartitions on the z-value so each
output file owns a contiguous z-range. At 100 TB the one extra
min/max pass and the range shuffle are paid once at write time and
bought back on every filtered scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(
    ranked: Sequence[Column],
    bits: int = 16,
) -> Column:
    """Interleave the low `bits` bits of each already-ranked column
    (little-endian round-robin: output bit i·n+j takes bit i of column
    j) — the Morton/Z curve key. Pure long arithmetic, no UDF.

    Requires n_cols · bits ≤ 63: Java shift counts wrap mod 64 (and
    bit 63 is the sign), so a larger product would silently collide
    bit planes onto the same output bit — the table would be written
    "clustered" on a meaningless key and every promised min/max file
    skip silently defeated. Lower `bits` for wide column sets
    (4 cols → bits ≤ 15, 5 cols → bits ≤ 12; rank resolution beyond
    ~2^12 rarely changes file-skipping behavior anyway)."""
    n = len(ranked)
    if n < 1:
        raise ValueError("zvalue needs at least one column")
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} output bits > 63: "
            f"shift counts would wrap mod 64 and corrupt the Z-curve; "
            f"use bits <= {63 // n}"
        )
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, col in enumerate(ranked):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return out


def _rank_to_bits(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Linear rank of a numeric column into [0, 2^bits): min/max scale
    then floor. NULLs rank 0 (cluster together at the curve origin)."""
    span = mx - mn
    top = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = ((col.cast("double") - F.lit(float(mn))) / F.lit(float(span))) * top
    return F.coalesce(F.floor(scaled).cast("long"), F.lit(0))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered on the Z-curve of `cols`
    (numeric columns). One min/max agg bounds the ranks (driver state:
    two floats per column), the z-value is computed in codegen, and
    repartitionByRange + sortWithinPartitions gives every output file
    a contiguous z-range — so each file's min/max footer stats cover a
    small rectangle of (cols) space and a range predicate on ANY of
    them skips most files/row-groups at scan time."""
    if not cols:
        raise ValueError("write_zordered needs at least one cluster column")
    aggs = []
    for c in cols:
        aggs += [F.min(c), F.max(c)]
    bounds = df.agg(*aggs).first()
    ranked = []
    for j, c in enumerate(cols):
        mn, mx = bounds[2 * j], bounds[2 * j + 1]
        if mn is None:
            mn = mx = 0
        ranked.append(_rank_to_bits(F.col(c), float(mn), float(mx), bits))
    z = zvalue(ranked, bits)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("__z", z)
        .repartitionByRange(parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
