"""Event-time windowed aggregation with watermarks.

The reference has no streaming semantics (SURVEY.md §2.9); this provides
the standard Structured-Streaming shapes a production deployment of the
engine's metrics/ingest side needs:

- ``windowed_event_counts`` — tumbling event-time windows with a
  watermark: late rows inside the watermark still land in their window;
  rows later than the watermark are dropped with bounded state.
- ``sliding_match_rate`` — sliding windows over a scored-pairs stream
  (match-rate monitoring for a continuously-running linkage deployment).

Both are pure plan builders: they accept a streaming OR batch DataFrame
(Spark's unified semantics), which is also how the tests pin correctness —
run the same plan in batch and compare with the stream's AvailableNow
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sums per key."""
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned to UTC so
    # the cast is value-preserving, and applying it in both modes keeps
    # batch/stream window boundaries identical
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_match_rate(
    scored: DataFrame,
    threshold: float,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "scored_at",
) -> DataFrame:
    """Sliding-window match-rate over a stream of scored pairs."""
    src = scored.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    matched = (F.col("score") >= threshold).cast("long")
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.count("*").alias("n_scored"),
            F.sum(matched).alias("n_matched"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_scored",
            "n_matched",
            F.round(F.col("n_matched") / F.col("n_scored"), 6).alias("match_rate"),
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key session windows via Spark's NATIVE ``session_window`` —
    sessions merge while consecutive events are within ``gap`` (an event at
    exactly prev + gap still merges; window end = last event + gap). Same
    code path runs streaming (state-store backed, watermark-bounded state)
    and batch (where it equals the lag/cumsum plan in operators/sessions.py
    up to the boundary convention — asserted against the DuckDB oracle)."""
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def top_k_per_window(
    counts: DataFrame,
    k: int = 5,
    key_col: str = "event_type",
) -> DataFrame:
    """Heavy hitters: the k most frequent keys of each tumbling window ->
    (window_start, window_end, key, n_events, rank). Deterministic
    tie-break (count DESC, key ASC). This is the BATCH half of the
    streaming heavy-hitters pair: ranking needs a window function, which
    Structured Streaming forbids mid-stream, so production runs
    ``windowed_event_counts`` as the stream (bounded state under the
    watermark) and ranks per micro-batch in foreachBatch / downstream —
    exactly how the stream==batch test composes it. The rank itself
    partitions by the time window, so no global sort exists anywhere."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy("window_start", "window_end").orderBy(
        F.col("n_events").desc(), F.col(key_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("window_start", "window_end", key_col, "n_events", "rank")
    )
