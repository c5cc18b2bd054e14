"""Streaming windowed-agg tests: stream (AvailableNow) output must equal
the same plan run in batch — Spark's unified-semantics contract."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.streaming.windows import (
    sliding_match_rate,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_windowed_counts_batch(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    out = windowed_event_counts(events, window="1 hour")
    rows = out.collect()
    assert rows
    total = sum(r.n_events for r in rows)
    assert total == events.count()
    for r in rows:
        assert (r.window_end - r.window_start).total_seconds() == 3600


def test_stream_equals_batch(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(events, window="1 hour").collect()
    }
    base = tempfile.mkdtemp()
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{SF}")  # directory contains only parquet of many tables
        )
        # restrict to the events file: re-point at a dir holding just events
        inp = os.path.join(base, "in")
        os.makedirs(inp)
        events.write.parquet(inp, mode="overwrite")
        stream = spark.readStream.schema(events.schema).parquet(inp)
        agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.window_start, r.window_end, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("select * from win_counts").collect()
        }
        assert got == batch
    finally:
        shutil.rmtree(base)


def test_sliding_match_rate_batch(spark):
    scored = spark.createDataFrame(
        [("2026-01-01 00:01:00", 90.0), ("2026-01-01 00:02:00", 10.0),
         ("2026-01-01 00:07:00", 85.0), ("2026-01-01 00:14:00", 50.0)],
        "scored_at string, score double",
    ).withColumn("scored_at", F.col("scored_at").cast("timestamp"))
    out = sliding_match_rate(scored, threshold=80.0).collect()
    assert out
    # every event lands in exactly window_size/slide = 2 sliding windows
    assert sum(r.n_scored for r in out) == 4 * 2
    for r in out:
        assert 0.0 <= r.match_rate <= 1.0


def test_session_window_stream_equals_batch(spark):
    """Native session windows: AvailableNow stream output == the same plan
    in batch (unified-semantics contract), complete mode."""
    from entity_resolution_spark.streaming.windows import session_window_counts

    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in session_window_counts(events, gap="30 minutes").collect()
    }
    assert batch
    base = tempfile.mkdtemp()
    try:
        inp = os.path.join(base, "in")
        events.write.parquet(inp, mode="overwrite")
        stream = spark.readStream.schema(events.schema).parquet(inp)
        agg = session_window_counts(stream, gap="30 minutes", watermark="10 days")
        q = (
            agg.writeStream.format("memory")
            .queryName("sess_win")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.session_start, r.session_end): r.n_events
            for r in spark.sql("SELECT * FROM sess_win").collect()
        }
        assert got == batch
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_interval_join_stream_equals_batch(spark):
    """Watermarked stream-stream interval join: AvailableNow output ==
    the identical plan in batch (both sides streamed from parquet)."""
    from pyspark.sql import functions as F

    from entity_resolution_spark.streaming.joins import interval_join

    ev = spark.read.parquet(f"{SF}/events.parquet")

    def plan(frame):
        purchases = frame.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("purchase_id")
        )
        clicks = frame.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
        )
        return interval_join(
            purchases, clicks, on="user_id", left_ts="ts", right_ts="cts",
            upper="1 hour", watermark="30 days",
        ).select("purchase_id", "click_id")

    batch = {(r.purchase_id, r.click_id) for r in plan(ev).collect()}
    base = tempfile.mkdtemp()
    try:
        inp = os.path.join(base, "in")
        ev.write.parquet(inp, mode="overwrite")
        stream = spark.readStream.schema(ev.schema).parquet(inp)
        q = (
            plan(stream)
            .writeStream.format("memory")
            .queryName("ivj")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.purchase_id, r.click_id)
            for r in spark.sql("SELECT * FROM ivj").collect()
        }
        assert got == batch and batch
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_heavy_hitters_stream_equals_batch(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from entity_resolution_spark.streaming.windows import (
        top_k_per_window,
        windowed_event_counts,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = top_k_per_window(windowed_event_counts(events), k=3).toPandas()

    inp = str(tmp_path / "in")
    events.write.parquet(inp, mode="overwrite")
    src = spark.readStream.schema(events.schema).parquet(inp)
    counts = windowed_event_counts(src)
    q = (
        counts.writeStream.format("memory")
        .queryName("hh_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = top_k_per_window(spark.table("hh_counts"), k=3).toPandas()

    key = ["window_start", "window_end", "rank"]
    a = batch.sort_values(key, ignore_index=True)
    b = streamed.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby(["window_start", "window_end"])["rank"].max() <= 3).all()
