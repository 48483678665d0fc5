"""Query registry: the single source of truth for the driver contract.

Each registered query is a pair:
- a PySpark implementation ``(spark, sf_dir) -> DataFrame`` built from the
  engine's operators, and
- (usually) an equivalent ANSI-SQL oracle string that DuckDB runs on the
  same parquet tables (views pre-registered by the verification driver).

Column names and types are aligned between the two on purpose — the
driver's comparison sorts columns by name and hashes values, so every
computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation (and its DuckDB oracle, when the
    semantics are SQL-expressible — ops that aren't get a rows-only check
    per the driver contract)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
