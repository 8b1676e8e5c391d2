"""Central query registry — the driver contract's backing store.

Every operator from SURVEY.md §2 is registered here as a named query:
a Spark plan builder `(spark, sf_dir) -> DataFrame` plus (where
SQL-expressible) an equivalent ANSI SQL string that DuckDB runs as an
independent oracle. `__spark_entry__.py` re-exports this registry.

Conventions enforced across the registry (they are what make the
driver's order-insensitive value-hash comparison meaningful):
- every computed column is aliased identically in Spark and SQL;
- money/quantity aggregates are computed in DECIMAL on both engines
  (exact, order-independent — see functions.cleaning.dec) and cast to
  DOUBLE at the OUTPUT boundary on both sides: engine-native decimals
  canonicalize differently under the driver's value hasher (Spark
  keeps fixed scale '50.10', DuckDB's pandas path yields float '50.1'),
  while decimal→double is correctly rounded in both engines and so
  bit-identical;
- every ORDER BY ... LIMIT k carries a unique tiebreak key so top-k
  is deterministic across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; `oracle` is DuckDB-runnable ANSI SQL over
    the pre-registered parquet views, or None for non-SQL-expressible
    operators (driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco
