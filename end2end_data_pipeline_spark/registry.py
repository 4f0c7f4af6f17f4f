"""Query registry — the single source of truth for the driver contract.

Every operator module registers its queries here with ``@query``. The
driver entry point (``__spark_entry__.py``) imports the operator
modules and exposes ``QUERIES`` / ``ORACLE`` verbatim.

Contract rules (enforced by convention here, verified by
``tests/test_oracle_parity.py`` which replicates the driver's
DuckDB-oracle comparison):

- every computed/aggregate column is aliased IDENTICALLY in the Spark
  query and the oracle SQL (the driver sorts columns by name before
  value-hashing);
- no raw double aggregates in outputs: money/value sums go through
  integer cents (``ROUND(x*100)`` → BIGINT, summed exactly) and ratios
  are divisions of exact integers, which are bit-identical across
  engines regardless of summation order;
- timestamps are formatted to strings at the output boundary
  (nanosecond parquet timestamps truncate differently across engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a (spark, sf_dir) -> DataFrame query, optionally with the
    DuckDB-equivalent ANSI SQL. Omit ``oracle`` only for genuinely
    non-SQL-expressible ops (the driver then records a rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
