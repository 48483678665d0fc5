"""Multimodal plumbing + Structured Streaming tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from de_project_sprint_etl_spark.functions import media
from de_project_sprint_etl_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


def events(spark, n):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
        .limit(n)
    )


def docs(spark, n=60):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < n)
    )


def test_media_features_deterministic_and_batched(spark):
    m = media.synth_media(docs(spark))
    feats = media.extract_features(m)
    rows = feats.collect()
    assert len(rows) == 60
    by_id = {r.media_id: r for r in rows}
    # digest equals md5 of the utf-8 text — the decode is a pure function
    import hashlib

    raw = {r.doc_id: r.text for r in docs(spark).collect()}
    for i in (0, 1, 2):
        assert by_id[i].digest == hashlib.md5(raw[i].encode()).hexdigest()
        assert by_id[i].n_bytes == len(raw[i].encode())
        assert 64 <= by_id[i].width < 64 + 1920
    kinds = {r.media_id % 3: r.kind for r in rows}
    assert kinds == {0: "image", 1: "audio", 2: "video"}
    # image rows carry no duration; audio/video do
    assert all(r.duration_ms == 0 for r in rows if r.kind == "image")
    assert all(r.duration_ms >= 1000 for r in rows if r.kind != "image")
    # deterministic across runs
    assert sorted(map(str, feats.collect())) == sorted(map(str, rows))


def test_media_real_decode_is_stubbed(spark):
    m = media.synth_media(docs(spark))
    try:
        media.extract_features(m, real_decode=True)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_frame_sampling_only_videos(spark):
    m = media.synth_media(docs(spark))
    frames = media.sample_frames(m, every_ms=60_000)
    rows = frames.collect()
    assert rows, "expected sampled frames for video rows"
    assert {r.media_id % 3 for r in rows} == {2}  # only kind=video ids
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append((r.frame_idx, r.offset_ms))
    for offs in per.values():
        idxs = [i for i, _ in sorted(offs)]
        assert idxs == list(range(len(idxs)))  # dense frame indices
        ms = [o for _, o in sorted(offs)]
        assert all(b - a == 60_000 for a, b in zip(ms, ms[1:]))


def test_streaming_windowed_agg_matches_batch(spark, tmp_path):
    """The streaming windowed agg over a file-arrival directory equals
    the batch aggregation of the same data (availableNow drain)."""
    src = str(tmp_path / "arrivals")
    ev = events(spark, 500)
    ev.repartition(3).write.parquet(src)  # 3 files = multiple triggers

    stream = jobs.read_event_stream(spark, src)
    assert stream.isStreaming
    agg = jobs.windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    jobs.run_to_memory(agg, "win_counts", complete=True)
    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("win_counts").collect()
    }
    want_df = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    want = {(str(r.ws), r.event_type): (r.n, r.s) for r in want_df.collect()}
    assert got == want


def test_streaming_foreach_batch_merge(spark, tmp_path):
    """Increment flow under streaming: each micro-batch of arriving
    order rows is merged via the pure batch operator (C5 semantics)."""
    from de_project_sprint_etl_spark.operators import facts

    src = str(tmp_path / "inc_arrivals")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "merged")
    events(spark, 200).repartition(2).write.parquet(src)

    def merge_batch(batch_df, batch_id: int) -> None:
        stamped = facts.stamp_status(batch_df, "shipped")
        stamped.write.mode("append").parquet(out)

    stream = jobs.read_event_stream(spark, src)
    jobs.run_foreach_batch(stream, merge_batch, ckpt)
    merged = spark.read.parquet(out)
    assert merged.count() == 200
    assert merged.filter(F.col("status") == "shipped").count() == 200
