"""Gap-based sessionization over an event stream (batch form).

Splits each key's ordered event sequence into sessions at inactivity gaps
longer than ``gap_seconds`` — the standard clickstream/log-pipeline
operator (the streaming twin, state-per-key with timeouts, lives in
streaming/stateful.py).

Spark-first plan: one shuffle on the key; per key the boundary flags come
from ``lag`` and the session index from a running sum over the same
window — no Python, fully codegen'd. Ordering ties on (ts, event_id) so
the assignment is deterministic for equal timestamps.

Scale note: the plain window partitions by the bare key, so one
pathological key with billions of events is one partition. The
``sessionize_segmented`` variant bounds partitions by time-chunking the
key and reconciling boundary-spanning sessions over a per-(key, chunk)
summary window (#rows = chunks, not events) — row-for-row identical
output, pinned by test + the shared DuckDB oracle.
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


def sessionize_segmented(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
    chunk_seconds: int = 86_400,
) -> DataFrame:
    """``sessionize`` with bounded partitions — the hot-key escape hatch.

    The plain operator's window puts one pathological key's billions of
    events into ONE sorted partition. Here events chunk by
    ``floor(ts / chunk_seconds)`` and sessionize locally within
    (key, chunk); a second, tiny window over the per-(key, chunk)
    summaries (#rows = chunks per key, not events per key) reconciles
    sessions that span chunk boundaries: chunk c's sessions start at
    S_c = Σ_{c'<c} n_{c'} − Σ_{c'≤c} m_{c'}, where m marks a chunk whose
    first event continues the previous non-empty chunk's last session
    (gap ≤ threshold — empty chunks in between are handled because the
    lag is over present chunks). Output is row-for-row identical to
    ``sessionize`` for any chunk_seconds.
    """
    as_long = lambda c: c.cast("timestamp").cast("long")
    ev = events.withColumn("__chunk", F.floor(as_long(F.col(ts)) / chunk_seconds))
    w = Window.partitionBy(key, "__chunk").orderBy(ts, order_tiebreak)
    prev_ts = F.lag(F.col(ts)).over(w)
    is_start = (
        prev_ts.isNull() | (as_long(F.col(ts)) - as_long(prev_ts) > gap_seconds)
    ).cast("long")
    local = ev.withColumn("__start", is_start).withColumn(
        "__local",
        F.sum("__start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    summ = local.groupBy(key, "__chunk").agg(
        (F.max("__local") + 1).alias("__n"),
        F.min(as_long(F.col(ts))).alias("__first"),
        F.max(as_long(F.col(ts))).alias("__last"),
    )
    ws = Window.partitionBy(key).orderBy("__chunk")
    m = (
        (F.col("__first") - F.lag("__last").over(ws)) <= gap_seconds
    ).cast("long")
    summ = summ.withColumn("__m", F.coalesce(m, F.lit(0)))
    s_c = F.coalesce(
        F.sum("__n").over(ws.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    ) - F.sum("__m").over(ws.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = summ.select(key, "__chunk", s_c.alias("__S"), "__m")
    out = local.join(offsets, [key, "__chunk"])
    return (
        out.withColumn("session_idx", F.col("__S") + F.col("__local"))
        .withColumn(
            "is_session_start",
            (F.col("__start") == 1)
            & ~((F.col("__local") == 0) & (F.col("__m") == 1)),
        )
        .drop("__chunk", "__start", "__local", "__S", "__m")
    )
