"""Sinks (SURVEY.md §2.2).

Every mutable-table operation in the reference (DROP+CREATE, TRUNCATE,
CTAS, INSERT..SELECT, ALTER ADD COLUMN, whole-table UPDATE, DELETE —
K2..K8) collapses into two Spark writer modes plus projections:

- full refresh / recreate / truncate-and-reload -> ``overwrite``
- incremental append -> ``append``
- ALTER+UPDATE (schema widening + constant backfill) -> a projection
  (``withColumn``) before the write; see operators/facts.py.

Overwrite-while-reading-the-same-path is a Spark footgun; callers that
rebuild a table from itself must write to a fresh versioned directory
(``versioned_path``) and repoint, which is also the cluster-safe pattern.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame


def overwrite(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def versioned_path(base: str, name: str) -> str:
    """A fresh directory per materialization of ``name`` under ``base``."""
    return os.path.join(base, name, f"v_{int(time.time() * 1000)}")


def save_as_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """K4 CTAS onto the session catalog: a *named* managed parquet table,
    readable back as ``spark.table(name)`` / ``SELECT .. FROM name`` —
    the direct analog of the reference's named Postgres tables
    (``update_mart_d_tables.sql:4`` ``mart.d_calendar`` etc.). The
    path-based layout above stays the primary production surface (object
    stores + external catalogs); this is the ad-hoc/SQL-facing form."""
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)
