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
from pyspark.sql import functions as F


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


def overwrite_layout(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Layout-aware materialization: hive-style ``partitionBy``
    directories (so later reads with a partition predicate PRUNE at
    file-listing time — never touch the other partitions' bytes), rows
    clustered inside each file via ``sortWithinPartitions`` (tight
    min/max column statistics per parquet row group -> row-group skip
    on range predicates, the poor man's Z-order for one sort axis), and
    an optional file-size cap so a 100 TB table lands as many
    splittable files instead of a few giants.

    ``sortWithinPartitions`` (not ``orderBy``): clustering must not pay
    a global range-exchange — the sort is per task, which is what
    row-group statistics need anyway.
    """
    out = df.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        out = out.sortWithinPartitions(*[*partition_by, *sort_by])
    writer = out.write.mode("overwrite").partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def save_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
) -> None:
    """Bucketed managed table: rows hash-partitioned into ``n_buckets``
    files by ``bucket_by`` at WRITE time. A join or aggregation of two
    tables bucketed the same way on the join key runs with ZERO
    exchanges — the shuffle was paid once at materialization and is
    amortized over every subsequent query (the classic warehouse
    pattern for a fact table joined daily on the same key).
    Spark only supports bucketing through the catalog
    (``saveAsTable``), not path-based writes."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(name)


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """Training-data export: newline-delimited JSON shards — the
    interchange format LLM training stacks ingest. Each task writes its
    partition as one shard (embarrassingly parallel, no exchange);
    ``maxRecordsPerFile`` caps shard size so a 100 TB corpus lands as
    many uniform, splittable files, and ``compression='gzip'/'zstd'``
    trades CPU for the 5-10x text ratio. Column types survive as JSON
    scalars; binary columns should be base64-projected first."""
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def compact(
    spark,
    path: str,
    target_files: int,
    sort_within: list[str] | None = None,
) -> str:
    """Small-file compaction: rewrite a parquet table as ``target_files``
    files into a fresh versioned directory and return that path. Years
    of incremental appends leave a 100 TB table as millions of
    KB-sized files — scan cost becomes file-listing + footer reads, and
    executors starve on open() calls. Compaction is the standard
    maintenance job (Delta/Iceberg OPTIMIZE): ``coalesce`` avoids a
    shuffle when shrinking the file count; an optional
    ``sortWithinPartitions`` re-clusters rows while we're paying for
    the rewrite anyway. The versioned output keeps readers of the old
    path consistent (never rewrite in place — see module docstring)."""
    df = spark.read.parquet(path)
    out = df.coalesce(target_files)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    dst = versioned_path(os.path.dirname(path.rstrip("/")), "compacted")
    out.write.mode("overwrite").parquet(dst)
    return dst


def overwrite_fmt(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Format-generic overwrite for the interchange formats Spark ships
    built-in (parquet, orc, json/NDJSON, csv). ORC matters for
    warehouse interop (Hive/Trino ecosystems read it natively); the
    columnar guarantees (predicate pushdown, column pruning, per-stripe
    min/max) match the parquet path."""
    writer = df.write.mode("overwrite").format(fmt)
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_fmt(spark, path: str, fmt: str = "parquet", schema=None) -> DataFrame:
    """Format-generic reader twin of :func:`overwrite_fmt`."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
