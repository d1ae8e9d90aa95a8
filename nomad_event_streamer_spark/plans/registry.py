"""Query registry: pairs each declared PySpark query with its DuckDB
oracle SQL (or None for rows-only checks).

Contract (driver's __spark_entry__ protocol):
- a query is ``(spark, sf_dir) -> DataFrame``;
- its oracle is ANSI SQL DuckDB runs over the same parquet tables
  (pre-registered views);
- output column NAMES must match exactly (driver sorts columns by name
  before hashing), every computed double is rounded, every LIMIT has a
  unique tiebreak sort key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` -> rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query slug: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
