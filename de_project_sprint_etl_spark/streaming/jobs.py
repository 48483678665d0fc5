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
    spark: SparkSession, src_dir: str, fmt: str = "parquet",
    max_files: int = 8,
) -> DataFrame:
    """File-arrival stream over an events directory (the Spark-native
    form of the reference's poll-for-increment loop,
    ETL_logs_inc.py:69-109 — the FileStreamSource does the polling).
    ``max_files`` caps files per micro-batch — the increment batching
    knob (smaller caps → more, smaller commits)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
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


def windowed_ohlc(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming OHLC bars: open/close as MIN/MAX over
    (ts, event_id, value) structs inside the stateful window
    aggregation — the same single-aggregate trick as the batch
    ``events_hourly_ohlc`` (struct partials merge associatively, so the
    state store carries one struct + two doubles + a count per bar).
    Watermark bounds state exactly as in :func:`windowed_event_counts`.
    """
    s = F.struct("ts", "event_id", "value")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min(s).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(s).getField("value").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("bar_hour"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization with the built-in ``session_window``:
    per-user sessions close after ``gap`` of inactivity; the watermark
    bounds session state. Same session boundaries as the batch
    lag+running-sum twin (``plans/llm.py::q_events_sessionize``) — the
    built-in's window end includes the gap, so duration is
    ``end - start - gap`` there vs ``max(ts) - min(ts)`` here; we emit
    start/count which are identical across both formulations.

    Output per closed session: ``user_id, session_start, n_events``.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, sum_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value sum, updated every micro-batch.

    This is the escape hatch for stateful semantics the built-in
    windowed/session aggregations can't express (custom merge logic,
    cross-batch counters, online sketches). State is one (n, sum) pair
    per user — partitioned by the group key, so state scales with
    |users| per executor, not stream length; input arrives as
    Arrow-batched pandas frames, never row-at-a-time Python.
    """
    import pandas as pd  # local: keep module import light
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


def ingest_stream_into_view(
    stream: DataFrame,
    root,
    checkpoint_dir,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """Exactly-once streaming ingestion into a manifest-gated
    incremental view (sources/incremental.py) — the streaming form of
    the reference's idempotent snapshot∪increment merge (C5).

    Structured Streaming's ``foreachBatch`` is at-least-once: a batch
    whose sink write succeeded but whose checkpoint commit did not land
    is REPLAYED on restart, with the same ``batch_id`` and — because
    the checkpoint's offset log pins the file→batch assignment — the
    same rows. Exactly-once therefore needs two halves working
    together, and this function is deliberately nothing more than
    their composition:

    - the CHECKPOINT (pass a stable directory, not a fresh one) pins
      which files make up each batch, so a replay re-presents
      identical content under an identical id;
    - the VIEW's commit tag (``batch-{batch_id}``) makes the replay a
      no-op: ``has_tag`` sees the already-published manifest commit
      and skips, closing the append-succeeded/checkpoint-crashed gap.

    A crash in the opposite order (manifest publish never happened)
    leaves an orphan delta directory the reader never sees, and the
    replay re-commits it — the protocol's crash matrix is covered from
    both sides.

    The last corner — checkpoint LOST while the view holds only a
    prefix of the batches — is guarded by provenance: every commit
    records its batch's source-file listing in the manifest
    (``append_delta(note=...)``), and the skip path verifies the
    replayed batch presents the SAME files. A fresh checkpoint that
    re-lists into a different batch composition therefore fails loudly
    (directing a view rebuild) instead of silently skipping files the
    original batch never carried. ``transform`` runs per batch BEFORE
    the commit (the reuse point for the pure batch operators)."""
    from de_project_sprint_etl_spark.sources import incremental

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"batch-{batch_id}"
        files = sorted(batch_df.inputFiles())
        if incremental.has_tag(root, tag):
            rec = incremental.get_note(root, tag)
            if (
                rec is not None
                and rec.get("files")
                and sorted(rec["files"]) != files
            ):
                raise ValueError(
                    f"streaming ingest replay of {tag} presents a "
                    f"different file composition than the committed "
                    f"batch ({root}); the checkpoint that pinned the "
                    "assignment is gone — rebuild the view (or restore "
                    "the checkpoint) instead of mixing compositions"
                )
            return
        df = transform(batch_df) if transform is not None else batch_df
        incremental.append_delta(df, root, tag=tag, note={"files": files})

    q = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_stream(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a slowly-changing
    user dimension (the classic fact-stream × dim-table shape).

    The static side is re-resolved per micro-batch — a dim refreshed by
    a batch job is picked up on the next trigger without restarting the
    stream. Spark broadcasts the dim when it fits (same planning as the
    batch join), so the stream side never shuffles: state-free,
    append-mode, scales with stream throughput alone. Inner joins on a
    static side need no watermark; only stream-stream joins do.
    """
    dim = F.broadcast(user_dim)
    return events.join(dim, "user_id", "left").select(
        "event_id", "ts", "user_id", "event_type", "value",
        *[c for c in user_dim.columns if c != "user_id"],
    )


def attributed_purchases(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase attributed to the
    same user's clicks in the preceding ``within`` interval (ad-tech
    click attribution, done on live streams).

    Both sides carry watermarks and the join condition bounds
    purchase_ts to [click_ts, click_ts + within], so Spark can compute
    exactly how long a buffered click can still find a matching
    purchase — state for both sides is evicted past
    watermark + within, which is what makes a stream-stream join
    runnable forever. Without the time bound the state would grow with
    the stream (Spark rejects unbounded stream-stream inner joins
    without it). Shuffles on user_id; state scales with per-user event
    rate × the interval, not stream length.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "inner").select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts",
        "purchase_value",
    )


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact deduplication via
    ``dropDuplicatesWithinWatermark``: the first arrival of each key
    wins; re-deliveries within the watermark horizon are dropped, and
    per-key state is evicted once the watermark passes it — so state is
    bounded by (arrival rate x watermark), not stream length.

    This is the streaming twin of the batch exact-dedup operator
    (functions/dedup.py): same first-wins-per-key semantics, with the
    watermark as the explicit re-delivery horizon an at-least-once
    source (file arrivals, Kafka) actually needs. Plain
    ``dropDuplicates`` on a stream would keep every key seen forever —
    unbounded state, the thing that kills a long-lived 100 TB-scale
    pipeline.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


EMA_SCHEMA = "user_id long, n_events long, ema double"


def user_value_ema(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Custom stateful operator on the Spark 4 ``transformWithState``
    API (the successor to ``applyInPandasWithState``): per-user
    exponential moving average of event values across micro-batches.

    Compared to the legacy API, state here is TYPED and composable —
    this processor keeps one ValueState cell (n, ema) per user; the same
    handle can open ListState/MapState cells and register timers for
    TTL-style eviction. Partitioned by the grouping key, so state scales
    with |users|, and input arrives Arrow-batched.

    In-batch determinism: rows are folded in (ts, event_id) order, so
    the EMA is reproducible for a fixed micro-batch plan.

    Runtime requirements (pure public API, but heavier than the legacy
    operator): the state-server protocol is protobuf-encoded (pyspark's
    protobuf extra), and the operator requires the RocksDB state store
    provider (``spark.sql.streaming.stateStore.providerClass``). Tests
    skip with a reason where protobuf is absent.
    """
    import pandas as pd  # local: keep module import light
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ema", "n long, ema double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, ema = (
                self._state.get() if self._state.exists() else (0, None)
            )
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                for v in pdf["value"].fillna(0.0):
                    v = float(v)
                    ema = v if ema is None else alpha * v + (1 - alpha) * ema
                    n += 1
            self._state.update((n, ema))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "ema": [round(ema, 6) if ema is not None else None],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        EmaProcessor(),
        outputStructType=EMA_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def user_value_ema_aiws(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-user EMA of event values with custom state carried across
    micro-batches — same semantics as :func:`user_value_ema`, on the
    ``applyInPandasWithState`` API (Spark 3.4+). This is the variant
    that runs WITHOUT the protobuf extra: GroupState travels the plain
    Arrow channel, so the operator is executable (and gate-checkable)
    in environments where ``transformWithState``'s protobuf-encoded
    state server is unavailable — the two implementations are the same
    operator at the semantics level and both keep one (n, ema) cell per
    user, partitioned by the grouping key.

    In-batch determinism: rows fold in (ts, event_id) order. The EMA is
    emitted in integer micro-units (``floor(ema·1e6 + 0.5)``) — the same
    cross-engine trick as :func:`running_user_totals_cents`: the fold's
    double arithmetic is IEEE-identical on any engine that replays the
    same order, and the integer projection removes the one remaining
    divergence (round-half-to-even vs half-away) so the final state is
    value-hashable against a SQL recurrence."""
    import math

    import pandas as pd  # local: keep module import light
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdfs, state):
        n, ema = state.get if state.exists else (0, None)
        # Materialize the WHOLE group before sorting: a key whose
        # micro-batch rows span several Arrow chunks (rows >
        # arrow.maxRecordsPerBatch) would otherwise fold in arbitrary
        # chunk order and break the claimed (ts, event_id) total order.
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            rows = rows.sort_values(["ts", "event_id"])
            for v in rows["value"].fillna(0.0):
                v = float(v)
                ema = v if ema is None else alpha * v + (1 - alpha) * ema
                n += 1
        state.update((n, ema))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ema_micros": [
                    int(math.floor(ema * 1e6 + 0.5)) if ema is not None else None
                ],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType="user_id long, n_events long, ema_micros long",
        stateStructType="n long, ema double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_pattern_match_stream(events: DataFrame) -> DataFrame:
    """Streaming MATCH_RECOGNIZE: the CEP pattern of
    plans/analytics.q_match_recognize_funnel (signup … click … purchase,
    error resets, SKIP PAST LAST ROW) as a per-user state machine
    carried ACROSS micro-batches by ``applyInPandasWithState`` — the
    form that runs unbounded, one 3-value stage cell + three counters
    per user. In-batch fold order is (ts, event_id), so the final state
    after a drain equals the batch-relational answer exactly — the
    batch/streaming parity the gate hash-checks."""
    import pandas as pd  # local: keep module import light
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdfs, state):
        stage, n_events, n_purchases, n_matches = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        # Whole-group materialize-then-sort (see user_value_ema_aiws):
        # per-chunk sorting is order-broken when a key spans Arrow chunks.
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            rows = rows.sort_values(["ts", "event_id"])
            for et in rows["event_type"]:
                n_events += 1
                if et == "signup":
                    if stage == 0:
                        stage = 1
                elif et == "click":
                    if stage == 1:
                        stage = 2
                elif et == "purchase":
                    n_purchases += 1
                    if stage == 2:
                        n_matches += 1
                    stage = 0
                elif et == "error":
                    stage = 0
        state.update((stage, n_events, n_purchases, n_matches))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_purchases": [n_purchases],
                "n_matches": [n_matches],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=(
            "user_id long, n_events long, n_purchases long, n_matches long"
        ),
        stateStructType="stage int, n_events long, n_purchases long, n_matches long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUNNING_CENTS_SCHEMA = "user_id long, n_events long, sum_cents long"


def running_user_totals_cents(events: DataFrame) -> DataFrame:
    """The cross-engine-checkable twin of :func:`running_user_totals`:
    value is converted to integer cents (``floor(v*100 + 0.5)`` —
    identical IEEE ops in Spark, DuckDB, and numpy, unlike ``round``
    whose tie rule differs) BEFORE the stateful sum, so the running
    state is exact integers and the final answer is bit-identical to a
    batch GROUP BY on any engine. This is how a production stateful
    aggregator should carry money anyway."""
    import numpy as np
    import pandas as pd  # local: keep module import light
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        n, s = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            v = pdf["value"].fillna(0.0).to_numpy(dtype="float64")
            s += int(np.floor(v * 100.0 + 0.5).astype("int64").sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_CENTS_SCHEMA,
        stateStructType="n long, s long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
