"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``de_project_sprint_etl_spark`` (operators are
pure DataFrame->DataFrame functions; ``plans/`` binds them to the
TESTDATA.md tables and carries the oracle SQL alongside each query).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from de_project_sprint_etl_spark.plans import oracle_canon  # noqa: E402
from de_project_sprint_etl_spark.plans import registry  # noqa: E402
from de_project_sprint_etl_spark.plans import testdata  # noqa: E402,F401 — registers core queries
from de_project_sprint_etl_spark.plans import llm  # noqa: E402,F401 — registers dedup/similarity/text ops
from de_project_sprint_etl_spark.plans import relational  # noqa: E402,F401 — registers §2.12 extension ops
from de_project_sprint_etl_spark.plans import tpch  # noqa: E402,F401 — registers TPC-H Q1/Q3/Q5/Q6
from de_project_sprint_etl_spark.plans import mlops  # noqa: E402,F401 — registers split/pivot/unpivot/levenshtein/range-window
from de_project_sprint_etl_spark.plans import warehouse  # noqa: E402,F401 — registers argmax/median/mode/SCD2/gap-fill/funnel
from de_project_sprint_etl_spark.plans import curation  # noqa: E402,F401 — registers substring-dedup/JL-projection/recall-eval/mixture-sample
from de_project_sprint_etl_spark.plans import streamq  # noqa: E402,F401 — registers streaming-executed windowed counts
from de_project_sprint_etl_spark.plans import sqlapi  # noqa: E402,F401 — registers the SQL-text front door

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the compact weekly customer-retention mart
    (reference loading_retention_mart.sql:2-3) on sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return registry.QUERIES["retention_compact"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-data-pipeline extension ops). Each callable takes
    (spark, sf_dir) and returns a DataFrame with columns aliased to match
    the oracle."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only
    for ops whose semantics are not SQL-expressible — those get the
    driver's weaker rows-only check). Every string is routed through
    the type-canonicalizing rewrite (``plans.oracle_canon``) so a
    fixture-generator physical-type drift — which zeroed round 2 before
    the Spark-side coercion existed — cannot break the oracle side
    either; when the fixture matches the canonical schema the rewrite
    is value-neutral (the full differential run is the proof)."""
    return {
        name: oracle_canon.canonicalize(sql)
        for name, sql in registry.ORACLES.items()
    }
