"""Streaming-sketch primitives re-expressed as Spark aggregations.

Count-min sketch (Cormode & Muthukrishnan 2005): ``d`` hash rows of
``w`` counters; the estimate for a key is the MIN of its ``d`` bucket
counters, an upper bound on the true count that is tight for heavy
hitters. In a distributed engine the sketch build is just a groupBy on
(row, bucket) — ``d*w`` groups total, so the map-side partial combine
collapses each input partition to at most ``d*w`` rows before the
shuffle: at 100 TB the exchange carries O(partitions · d · w) rows,
independent of the stream length. That is the whole point of sketching
here — the "sketch" IS the tiny post-combine aggregation state.

Cross-engine determinism: bucket assignment uses the shared md5-derived
60-bit hash (functions/text.h64 / sql_h64, proven bit-identical in
Spark and DuckDB), seeded per hash row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from de_project_sprint_etl_spark.functions.text import h64, sql_h64

CMS_DEPTH = 3  # hash rows
CMS_WIDTH = 1024  # counters per row (error bound ~ stream_len / width)


def cms_bucket(key: Column | str, row: int, width: int = CMS_WIDTH) -> Column:
    """Bucket of ``key`` in hash row ``row`` (keys hashed as strings so
    any key type gets the same bytes on both engines)."""
    c = F.col(key) if isinstance(key, str) else key
    return (h64(c.cast("string"), seed=row) % width).cast("int")


def sql_cms_bucket(expr: str, row: int, width: int = CMS_WIDTH) -> str:
    """DuckDB mirror of :func:`cms_bucket` — keep in lockstep."""
    return f"CAST({sql_h64(f'CAST({expr} AS VARCHAR)', seed=row)} % {width} AS INT)"


def cms_build(stream: DataFrame, key: str, depth: int = CMS_DEPTH) -> DataFrame:
    """The d×w counter table: (row, bucket, cnt). One explode (d rows
    per input row, map-only) + one groupBy over d*w groups — partials
    combine map-side, so the shuffle is O(partitions · d · w)."""
    exploded = stream.select(
        F.posexplode(
            F.array(*[cms_bucket(key, i) for i in range(depth)])
        ).alias("row", "bucket")
    )
    return exploded.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    keys: DataFrame, sketch: DataFrame, key: str, depth: int = CMS_DEPTH
) -> DataFrame:
    """Point-query the sketch for each row of ``keys``: min over the d
    bucket counters. The sketch is d*w rows — always broadcast."""
    probes = keys.select(
        "*",
        F.posexplode(
            F.array(*[cms_bucket(key, i) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "inner")
    return joined.groupBy(*keys.columns).agg(F.min("cnt").alias("cms_est"))
