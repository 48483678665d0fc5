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
