"""Gap-based sessionization over an event stream (batch form).

Splits each key's ordered event sequence into sessions at inactivity gaps
longer than ``gap_seconds`` — the standard clickstream/log-pipeline
operator (the streaming twin, state-per-key with timeouts, lives in
streaming/stateful.py).

Spark-first plan: one shuffle on the key; per key the boundary flags come
from ``lag`` and the session index from a running sum over the same
window — no Python, fully codegen'd. Ordering ties on (ts, event_id) so
the assignment is deterministic for equal timestamps.

Scale note: windows partition by the bare key, so one pathological key
with billions of events is one partition (same trade-off as the as-of
join's default plan, operators/asof.py — and like there, a time-chunked
segmented variant is the escape hatch if a corpus ever needs it).
Session ids are (key, session_idx) pairs — deterministic and stable
across runs/parallelism, never monotonically_increasing_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Events + (session_idx, is_session_start) per row; session_idx is
    0-based per key in (ts, tiebreak) order."""
    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    prev_ts = F.lag(F.col(ts)).over(w)
    # TIMESTAMP_NTZ has no direct long cast in Spark 4; bounce via timestamp.
    # Only DIFFERENCES are used, so the session-tz epoch offset cancels.
    as_long = lambda c: c.cast("timestamp").cast("long")
    is_start = (
        prev_ts.isNull()
        | (as_long(F.col(ts)) - as_long(prev_ts) > gap_seconds)
    ).cast("long")
    return events.withColumn("__start", is_start).withColumn(
        "session_idx",
        F.sum("__start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    ).withColumn("is_session_start", F.col("__start") == 1).drop("__start")


def session_summary(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per session: (key, session_idx, n_events, session_start,
    session_end, duration_seconds)."""
    s = sessionize(events, key, ts, order_tiebreak, gap_seconds)
    return s.groupBy(key, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (
            F.max(F.col(ts).cast("timestamp").cast("long"))
            - F.min(F.col(ts).cast("timestamp").cast("long"))
        ).alias("duration_seconds"),
    )
