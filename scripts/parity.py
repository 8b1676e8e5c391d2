"""Fast parity runner: every registered query vs its DuckDB oracle in
one Spark session. Usage:

    python scripts/parity.py [--vanilla] [sf_dir] [query_name ...]

`--vanilla` runs on a default-config SparkSession (no UTC/AQE/Arrow
tuning from session.py) — simulating the driver's own harness, which
builds its own session; queries must be correct under default confs,
not just ours. Prints PASS/FAIL per query with timing; exits nonzero
on any failure.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from etl_football_analytics_pipeline_spark.plans import ORACLES, QUERIES
from etl_football_analytics_pipeline_spark.session import get_spark
from etl_football_analytics_pipeline_spark.sources.registry import TABLES


def canon(rows, colnames):
    """STRICT canonical form: sort columns by name, sort rows, compare
    plain str() of every value — no float rounding. Empirically this is
    at least as strict as the driver's value hasher: the r2 record
    failed exactly the queries whose Spark Decimal strings ('-375.00')
    differ from the float str of the same value ('-375.0'), so engine
    outputs must match bit-for-bit after the registry's
    DECIMAL-internal / DOUBLE-boundary convention."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)] or sorted(QUERIES)

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("parity-vanilla")
            .master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            t_spark = time.time() - t0
            if name not in ORACLES:
                print(f"  {name:32s} rows-only  n={len(spark_rows):>7}  {t_spark:6.2f}s")
                continue
            t1 = time.time()
            res = con.execute(ORACLES[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            t_duck = time.time() - t1

            problems = []
            if sorted(spark_cols) != sorted(duck_cols):
                problems.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
            elif len(spark_rows) != len(duck_rows):
                problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
            else:
                sc, dc_ = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
                bad = [(a, b) for a, b in zip(sc, dc_) if a != b]
                if bad:
                    problems.append(f"{len(bad)} value diffs, first: {bad[0]}")
            status = "PASS" if not problems else "FAIL"
            print(f"  {name:32s} {status}  n={len(spark_rows):>7}  spark={t_spark:6.2f}s duck={t_duck:5.2f}s")
            if problems:
                failures.append(name)
                for p in problems:
                    print(f"      -> {p}")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"  {name:32s} ERROR  {type(exc).__name__}: {str(exc)[:300]}")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
