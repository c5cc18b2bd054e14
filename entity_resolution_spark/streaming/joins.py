"""Watermarked stream-stream interval join.

The missing §2.9 shape: correlate two unbounded streams by key within an
event-time interval (click -> purchase attribution, event -> metric
enrichment). Spark requires BOTH a key-equality term and a two-sided
event-time range for stream-stream joins — the range is what lets the
state store expire buffered rows once the watermark passes, keeping state
bounded on an unbounded stream.

Like every plan builder in streaming/, this accepts streaming OR batch
frames (unified semantics): tests run the identical plan in batch and
assert the AvailableNow stream output matches; the contract row runs the
batch mode against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join rows sharing ``on`` where ``right_ts`` falls in
    ``[left_ts - upper, left_ts - lower]`` (right precedes left by at most
    ``upper``). Both inputs must already have DISTINCT column names apart
    from ``on`` — the join keeps every column of both sides.

    Scale shape: a key-hash shuffle on both sides (co-partitioned by
    ``on``); per-key state is bounded by the watermark + interval width,
    so a hot key holds at most its interval's rows, never the stream's
    history.
    """
    l = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    r = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    r = r.withColumnRenamed(on, "__rk")
    cond = (
        (F.col(on) == F.col("__rk"))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {upper}"))
        & (F.col(right_ts) <= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
    )
    return l.join(r, cond, "inner").drop("__rk")
