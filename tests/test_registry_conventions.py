"""Mechanized output-convention guards, walked over the WHOLE registry.

Two conventions keep the driver's value-hash comparisons stable, and
until now they were enforced by discipline only:

1. **Every float column is rounded to 4dp on both engines.** Raw
   double aggregates differ by 1 ulp across partitionings and engines;
   a new leg that forgets `F.round(.., 4)` (or the SQL `ROUND(.., 4)`)
   becomes a flaky hash. Columns that are exact by construction
   (integer-derived, power-of-two decay) may carry more precision —
   they go in the allowlist WITH the reason.

2. **Top-k outputs are layout-stable.** An ORDER BY score LIMIT k
   without a unique tiebreak can pick a different row SET when ties
   straddle the boundary under a different partitioning. The guard
   reruns every query under a different shuffle-partition count and
   requires the canonical (row-and-column-sorted) result to be
   identical — the same sensitivity the driver's hasher has.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_football_analytics_pipeline_spark.plans import ORACLES, QUERIES
from etl_football_analytics_pipeline_spark.sources.registry import TABLES

SF = "/root/testdata/sf0.001"

# (query, column) pairs allowed to carry >4dp floats, each exact by
# construction (bit-identical across engines without rounding)
EXACT_FLOATS: dict[tuple[str, str], str] = {
    ("mm_decode_suite", "mean_px"): (
        "integer pixel sum / 512 (16x32 image) — an exact binary "
        "fraction both engines produce bit-identically unrounded"
    ),
}


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def _is_4dp(v: float) -> bool:
    if v is None or math.isnan(v) or math.isinf(v):
        return True
    return abs(v - round(v, 4)) < 1e-9


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_conventions(spark, duck, name):
    df = QUERIES[name](spark, SF)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]

    float_cols = [
        (i, f.name)
        for i, f in enumerate(df.schema.fields)
        if f.dataType.typeName() in ("double", "float")
        and (name, f.name) not in EXACT_FLOATS
    ]
    for i, cname in float_cols:
        bad = [r[i] for r in rows if not _is_4dp(r[i])]
        assert not bad, (
            f"{name}.{cname}: {len(bad)} values beyond 4dp on the Spark "
            f"side, first {bad[0]!r} — round at the output boundary or "
            f"allowlist with a reason"
        )

    if name in ORACLES:
        res = duck.execute(ORACLES[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        for j, cname in enumerate(dcols):
            if (name, cname) in EXACT_FLOATS:
                continue
            bad = [
                r[j]
                for r in drows
                if isinstance(r[j], float) and not _is_4dp(r[j])
            ]
            assert not bad, (
                f"{name}.{cname}: {len(bad)} values beyond 4dp on the "
                f"DuckDB side, first {bad[0]!r}"
            )

    # layout stability: a different shuffle-partition count must not
    # change the result SET (catches tiebreak-less top-k at the point
    # a boundary tie exists in the data)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        df2 = QUERIES[name](spark, SF)
        rows2 = [tuple(r) for r in df2.collect()]
        assert canon(rows, cols) == canon(rows2, df2.columns), (
            f"{name}: result changed under a different shuffle layout — "
            "an ORDER BY+LIMIT is missing a unique tiebreak or a float "
            "is unrounded"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
