"""Time-series regularization: gap-filled resampling + forward fill.

Event streams are irregular; models and dashboards want a value per
(key, bucket) for EVERY bucket in the key's active span, with empty
buckets surfaced as zeros/NULLs and carried-forward observations where
last-observation-carried-forward (LOCF) semantics apply. Pairs with the
as-of join (point lookups) and SCD2 (validity episodes).

Scale shape: one bucket aggregate over the events, one tiny per-key span
aggregate, and a `sequence()` explode over SPANS (bucket-count rows per
key, never event rows) left-joined back — all JVM, one shuffle on the
key. The LOCF is a key-partitioned running `last(ignorenulls)` window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNITS = ("hour", "day", "week")


def resample_events(
    events: DataFrame,
    unit: str = "day",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, bucket, n_events, sum_value round-6, avg_filled round-6) —
    one row per ``unit`` bucket in each key's [first, last] activity
    span: observed buckets carry their count/sum/avg, gap buckets carry
    n_events = 0 with NULL sum and the previous bucket's rounded average
    forward-filled into ``avg_filled`` (LOCF; the first bucket is always
    observed, so the fill never lacks a seed)."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {_UNITS}")
    b = F.date_trunc(unit, F.col(ts_col))
    agg = (
        events.select(F.col(key_col).alias("key"), b.alias("bucket"), F.col(value_col))
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
    )
    spans = agg.groupBy("key").agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = spans.select(
        "key",
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval 1 {unit})")
        ).alias("bucket"),
    )
    filled = grid.join(agg.hint("shuffle_hash"), ["key", "bucket"], "left")
    avg = F.round(F.col("sum_value") / F.col("n_events"), 6)
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col("key").alias(key_col),
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.last(avg, ignorenulls=True).over(w).alias("avg_filled"),
    )


def activity_streaks(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(key, streak_start, streak_end, n_days) — maximal runs of
    CONSECUTIVE active calendar days per key (the gaps-and-islands
    pattern: distinct active days minus their per-key row_number is
    constant exactly within a consecutive run). One distinct + one
    key-partitioned window + one aggregate; rows are streak-sized."""
    days = events.select(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("d")
    ).distinct()
    w = Window.partitionBy("key").orderBy("d")
    grp = F.date_sub(F.col("d"), F.row_number().over(w))
    return (
        days.withColumn("__g", grp)
        .groupBy("key", "__g")
        .agg(
            F.min("d").alias("streak_start"),
            F.max("d").alias("streak_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select(
            F.col("key").alias(key_col),
            "streak_start",
            "streak_end",
            "n_days",
        )
    )


def rolling_stats(
    events: DataFrame,
    window_buckets: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Trailing N-day rolling aggregates per key -> (key, bucket,
    n_events, sum_value, roll_n, roll_sum, roll_avg round-6), one row per
    OBSERVED day: the rolling frame covers the ``window_buckets`` calendar
    days ending at the bucket (a RANGE frame over the day index, so
    missing days correctly thin the window rather than stretching it the
    way a ROWS frame would).

    Scale shape: the raw events collapse to per-(key, day) partials
    first — one hash aggregate — and the window then runs over
    day-census rows, so its state is O(window) per key regardless of
    per-day event volume; one sort per key partition.
    """
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    agg = (
        events.select(
            F.col(key_col).alias("key"),
            F.date_trunc("day", F.col(ts_col)).alias("bucket"),
            F.col(value_col),
        )
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
    )
    idx = F.datediff(F.col("bucket"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("key")
        .orderBy(idx)
        .rangeBetween(-(window_buckets - 1), 0)
    )
    roll_sum = F.sum("sum_value").over(w)
    roll_n = F.sum("n_events").over(w)
    return agg.select(
        "key",
        "bucket",
        "n_events",
        "sum_value",
        roll_n.alias("roll_n"),
        F.round(roll_sum, 6).alias("roll_sum"),
        F.round(roll_sum / roll_n, 6).alias("roll_avg"),
    )
