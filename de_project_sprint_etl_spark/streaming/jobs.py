"""Structured Streaming jobs.

The reference is batch-only (daily Airflow schedule, SURVEY.md §2.12),
but its increment flow maps directly onto Structured Streaming: the
arrival directory is the stream, each micro-batch is one "daily
increment", and the pure batch operators are reused unchanged inside
``foreachBatch``. Streams and batch share one logical plan — the
windowed aggregation here is the same plan as the batch
``events_windowed_agg`` query in plans/llm.py.

Scale notes: event-time windows + watermark bound state; the shuffle
key is (window, event_type) for the agg and user_id for sessions, so
state partitions like the batch job. ``availableNow`` triggers give
batch-backfill semantics with streaming code.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, src_dir: str, fmt: str = "parquet"
) -> DataFrame:
    """File-arrival stream over an events directory (the Spark-native
    form of the reference's poll-for-increment loop,
    ETL_logs_inc.py:69-109 — the FileStreamSource does the polling)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .load(src_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling-window aggregation with late-data handling.

    Identical logical plan to the batch ``events_windowed_agg`` query;
    the watermark bounds streaming state and drops events later than
    ``watermark`` behind the max observed event time.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(
    stream: DataFrame, name: str, complete: bool = True
) -> None:
    """Drain a stream into an in-memory table with availableNow (batch
    backfill semantics); blocks until the backlog is consumed."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch(
    stream: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> None:
    """Run the increment flow: every micro-batch (one arrival of
    increment files) is handed to a *batch* function — the idiomatic
    way to reuse the pure operators (e.g. facts.merge_snapshot_increment)
    under streaming, mirroring the reference's per-day increment task
    (C5) with exactly-once bookkeeping from the checkpoint."""
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
