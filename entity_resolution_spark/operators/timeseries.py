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

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decayed_value(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    half_life_days: float,
    ln2: float = 0.6931471805599453,
) -> DataFrame:
    """Exponential time-decayed feature per key: sum(value * 2^(-age/h))
    where age is days before the table's max timestamp (the "as-of" horizon)
    and h is the half-life. The recency-weighted activity feature of every
    feature store, computed closed-form — no sequential EWMA recurrence, so
    it distributes as one scan + one hash aggregate (plus a broadcast 1-row
    max for the horizon).

    ``ln2`` is passed as a literal so an external replica can inline the
    exact same double and stay bit-comparable.
    """
    if half_life_days <= 0:
        raise ValueError("half_life_days must be > 0")
    horizon = df.agg(F.max(F.col(ts)).alias("_h"))

    # epoch seconds WITH the fractional part — unix_timestamp truncates
    # sub-second precision and would skew every age by up to 1 s. NTZ
    # columns cast through TIMESTAMP losslessly (session tz is UTC).
    def _epoch(c):
        return F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000.0)

    age_days = (_epoch(F.col("_h")) - _epoch(F.col(ts))) / F.lit(86400.0)
    w = F.exp(-F.lit(ln2) * age_days / F.lit(float(half_life_days)))
    return (
        df.crossJoin(F.broadcast(horizon))
        .groupBy(key)
        .agg(
            F.round(F.sum(F.col(value) * w), 6).alias("decayed_sum"),
            F.round(F.sum(w), 6).alias("decayed_weight"),
            F.count("*").alias("n_events"),
        )
    )


def period_over_period(
    df: DataFrame,
    ts: str,
    by: Sequence[str] = (),
    value: str | None = None,
    unit: str = "week",
) -> DataFrame:
    """Period-over-period reporting: per group and calendar period, the
    row count (and optional value sum), the previous period's figures, and
    the growth ratio round(cur/prev, 6) (NULL for the first period or a
    zero base). The aggregate collapses to |groups| x |periods| rows
    BEFORE the lag window runs, so the ordered pass is report-sized, not
    data-sized.
    """
    by = list(by)
    period = F.date_trunc(unit, F.col(ts)).alias("period")
    aggs = [F.count("*").alias("n_rows")]
    if value is not None:
        aggs.append(F.round(F.sum(value), 6).alias("value_sum"))
    cur = df.groupBy(*by, period).agg(*aggs)
    w = Window.partitionBy(*by).orderBy("period")
    out = cur.withColumn("prev_n_rows", F.lag("n_rows").over(w))
    growth_base = F.col("prev_n_rows")
    out = out.withColumn(
        "growth",
        F.when(
            growth_base.isNotNull() & (growth_base != 0),
            F.round(F.col("n_rows") / growth_base, 6),
        ),
    )
    return out


def change_point(
    df: DataFrame,
    ts: str,
    value: str,
    by: Sequence[str] = (),
    unit: str = "day",
) -> DataFrame:
    """Offline CUSUM change-point detection per group: collapse to the
    per-period census, compute S_k = cumsum(x) - k*mean over the ordered
    period series, and report the period maximizing |S_k| — the classic
    single-change estimator (Page 1954; Taylor's cumulative-sum charts) —
    plus the mean level on each side of the split.

    Output: (by..., n_periods, cp_period, cusum_max, mean_before,
    mean_after). ``cusum_max`` is rounded to 6 BEFORE the argmax so tie-
    breaking (earliest period wins) is stable across engines; groups with
    a single period have no interior split and are omitted.

    Scale shape: one hash aggregate to the (group, period) census, then
    ONE group-partitioned window over census rows (periods, not raw
    events) and a final struct-max hash aggregate — the raw table is
    never sorted or re-shuffled beyond the census aggregate.
    """
    by = list(by)
    census = (
        df.where(F.col(value).isNotNull())
        .groupBy(*by, F.date_trunc(unit, F.col(ts)).alias("period"))
        .agg(F.sum(value).alias("_x"))
    )
    w_cum = Window.partitionBy(*by).orderBy("period")
    w_all = Window.partitionBy(*by)
    scanned = census.select(
        *by,
        "period",
        F.sum("_x").over(w_cum).alias("_cum"),
        F.row_number().over(w_cum).alias("_k"),
        F.sum("_x").over(w_all).alias("_tot"),
        F.count("*").over(w_all).alias("_n"),
    ).withColumn(
        "_s",
        F.round(
            F.abs(
                F.col("_cum")
                - F.col("_k") * F.col("_tot") / F.col("_n")
            ),
            6,
        ),
    )
    # interior split points only: k = n has no "after" side
    interior = scanned.where(F.col("_k") < F.col("_n"))
    best = interior.groupBy(*by).agg(
        F.max("_n").alias("n_periods"),
        F.max(
            F.struct(
                F.col("_s").alias("s"),
                (F.lit(0) - F.unix_timestamp("period")).alias("neg_p"),
                F.col("period").alias("p"),
                F.col("_cum").alias("cum"),
                F.col("_k").alias("k"),
                F.col("_tot").alias("tot"),
            )
        ).alias("_b"),
    )
    return best.select(
        *by,
        "n_periods",
        F.col("_b.p").alias("cp_period"),
        F.col("_b.s").alias("cusum_max"),
        F.round(F.col("_b.cum") / F.col("_b.k"), 6).alias("mean_before"),
        F.round(
            (F.col("_b.tot") - F.col("_b.cum"))
            / (F.col("n_periods") - F.col("_b.k")),
            6,
        ).alias("mean_after"),
    )


def interarrival_stats(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Per-group inter-arrival-time report: for each key's events in
    (ts, tiebreak) order, the gap to the PREVIOUS event in seconds,
    grouped by ``by`` of the LATER event — (by..., n_gaps, avg_gap_s,
    p25_s, p50_s, p75_s, p95_s). Gaps are exact integer microseconds
    divided once by 1e6, so the double values are bit-identical across
    engines; quantiles are exact (interpolated percentile over the
    group's gap multiset).

    One key-partitioned lag window (per-key frames are the key's own
    rows) + one hash aggregate. The tiebreak column makes same-timestamp
    orderings deterministic.
    """
    by = list(by)
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    # NTZ columns cast through TIMESTAMP losslessly (session tz is UTC) —
    # same convention as decayed_value
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    gaps = (
        df.select(key, ts, tiebreak, *by)
        .withColumn("_gap_s", (us - F.lag(us).over(w)) / F.lit(1e6))
        .where(F.col("_gap_s").isNotNull())
    )
    q = lambda p: F.round(F.percentile(F.col("_gap_s"), F.lit(p)), 6)  # noqa: E731
    return gaps.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("_gap_s"), 6).alias("avg_gap_s"),
        q(0.25).alias("p25_s"),
        q(0.50).alias("p50_s"),
        q(0.75).alias("p75_s"),
        q(0.95).alias("p95_s"),
    )


def ewma_running(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.3,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-event RUNNING exponentially-weighted moving average: for each
    key's events ordered by (ts, tiebreak), e_1 = x_1 and
    e_t = alpha*x_t + (1-alpha)*e_{t-1} — the online-smoothing baseline
    every anomaly detector and live dashboard keeps (Hunter 1986 EWMA
    control charts). Output: (key, rn, ewma) with rn the 1-based event
    index inside the key. NULL values are dropped before indexing.

    The recurrence is inherently sequential WITHIN a key — that is the
    operator's semantics, not an implementation shortcut (contrast
    `decayed_value`, which is the closed-form as-of aggregate and
    distributes as a plain hash agg). Scale shape: one shuffle on the
    key, then an Arrow-cogrouped pass with a vectorized-per-group numpy
    recursion; keys are independent so the stage parallelizes across the
    key space, and per-key memory is the key's own event count. The
    float operation order (alpha*x + beta*e, beta = 1-alpha, evaluated
    left to right in doubles) is pinned so an external recursive-CTE
    replica is bit-identical before the final round(6).
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    import numpy as np
    import pandas as pd

    from ..session import ensure_py_files

    ensure_py_files(df.sparkSession)
    beta = 1.0 - alpha
    order = [ts] + ([tiebreak] if tiebreak else [])
    base = df.where(F.col(value).isNotNull()).select(
        F.col(key).alias("__k"), *[F.col(c) for c in order],
        F.col(value).cast("double").alias("__x"),
    )
    out_schema = T.StructType(
        [
            T.StructField("__k", df.schema[key].dataType),
            T.StructField("rn", T.IntegerType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf["__x"].to_numpy(dtype="float64")
        # one C call per key when the toolchain exists (bit-identical by
        # construction: same expression tree, -ffp-contract=off — parity
        # asserted in tests); Python loop otherwise. The recursion itself
        # stays O(events) per key — that is the semantics — but no longer
        # pays a Python bytecode dispatch per element.
        from ..functions._smooth_native import ewma_native

        native = ewma_native(x, alpha, beta)
        if native is not None:
            e = native[0]
        else:
            e = np.empty_like(x)
            acc = 0.0
            for i in range(len(x)):
                acc = x[i] if i == 0 else alpha * x[i] + beta * acc
                e[i] = acc
        return pd.DataFrame(
            {
                "__k": pdf["__k"].to_numpy(),
                "rn": np.arange(1, len(x) + 1, dtype="int32"),
                "ewma": e,
            }
        )

    # round JVM-side with a 1e-9 tie-break epsilon: the recursion over
    # decimal-valued inputs lands EXACTLY on x.xxxxxx5 boundaries, where
    # Spark's BigDecimal HALF_UP and other engines' scaled-multiply
    # round() genuinely disagree; +1e-9 moves ties off the boundary by
    # ~1e7 x the cross-engine ulp while leaving every non-tie value's
    # rounding unchanged (nearest boundary is >= 5e-7 away)
    return (
        base.groupBy("__k")
        .applyInPandas(run, out_schema)
        .select(
            F.col("__k").alias(key),
            "rn",
            F.round(F.col("ewma") + F.lit(1e-9), 6).alias("ewma"),
        )
    )


def holt_linear(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.5,
    gamma: float = 0.3,
    tiebreak: str | None = None,
) -> DataFrame:
    """Holt double-exponential smoothing (Holt 1957) per key: level and
    trend recursions l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1}),
    b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}, seeded l_1 = x_1 and
    b_1 = x_2 - x_1 (0 for singleton keys). Output: (key, rn, level,
    trend) — `level + trend` is the one-step-ahead forecast, the
    trending-metric companion to `ewma_running`'s flat smoother.

    Same scale shape and float-order pinning as `ewma_running`: one
    shuffle on the key, Arrow-cogrouped per-key recursion (sequential
    WITHIN a key by definition), doubles evaluated in the documented
    order so a recursive-CTE replica is bit-identical before round(6).
    """
    if not (0.0 < alpha <= 1.0) or not (0.0 <= gamma <= 1.0):
        raise ValueError("alpha in (0,1], gamma in [0,1] required")
    import numpy as np
    import pandas as pd

    from ..session import ensure_py_files

    ensure_py_files(df.sparkSession)
    ca, cb = 1.0 - alpha, 1.0 - gamma
    order = [ts] + ([tiebreak] if tiebreak else [])
    base = df.where(F.col(value).isNotNull()).select(
        F.col(key).alias("__k"), *[F.col(c) for c in order],
        F.col(value).cast("double").alias("__x"),
    )
    out_schema = T.StructType(
        [
            T.StructField("__k", df.schema[key].dataType),
            T.StructField("rn", T.IntegerType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf["__x"].to_numpy(dtype="float64")
        n = len(x)
        # native kernel first (same contract as ewma_running's: identical
        # expression trees, no FP contraction, per-element parity tested)
        from ..functions._smooth_native import holt_native

        native = holt_native(x, alpha, ca, gamma, cb)
        if native is not None:
            ls, bs = native
        else:
            ls = np.empty(n)
            bs = np.empty(n)
            l = x[0]
            b = (x[1] - x[0]) if n > 1 else 0.0
            ls[0], bs[0] = l, b
            for t in range(1, n):
                l_prev = l
                l = alpha * x[t] + ca * (l + b)
                b = gamma * (l - l_prev) + cb * b
                ls[t], bs[t] = l, b
        return pd.DataFrame(
            {
                "__k": pdf["__k"].to_numpy(),
                "rn": np.arange(1, n + 1, dtype="int32"),
                "level": ls,
                "trend": bs,
            }
        )

    # same 1e-9 tie-break-then-round convention as ewma_running (see
    # the comment there)
    return (
        base.groupBy("__k")
        .applyInPandas(run, out_schema)
        .select(
            F.col("__k").alias(key),
            "rn",
            F.round(F.col("level") + F.lit(1e-9), 6).alias("level"),
            F.round(F.col("trend") + F.lit(1e-9), 6).alias("trend"),
        )
    )


def weekly_profile(
    df: DataFrame,
    ts: str,
    value: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Weekly seasonality profile: per (by..., weekday 0=Mon..6=Sun) —
    (n_events, mean_value, seasonal_index) with the index = weekday mean /
    overall mean (1.0 = no weekly effect). The first decomposition a
    traffic/quality dashboard applies before trend analysis (`ewma` /
    `holt_linear` handle the trend; this is the periodic component).

    Two hash aggregates (weekday census + per-group overall) joined on
    the group key — group-census-sized frames, one scan, all JVM.
    Means/indices use the engine's tie-break-then-round convention (see
    ewma_running) so an external replica agrees at .5 boundaries, which
    2-decimal inputs DO hit.
    """
    by = list(by)
    base = df.where(F.col(value).isNotNull()).select(
        *by,
        F.weekday(F.col(ts)).alias("weekday"),
        F.col(value).cast("double").alias("__v"),
    )
    dow = base.groupBy(*by, "weekday").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("__v").alias("__s")
    )
    overall = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("__tn"), F.sum("__v").alias("__ts")
    )
    joined = (
        dow.join(overall.hint("shuffle_hash"), by)
        if by
        else dow.crossJoin(F.broadcast(overall))
    )
    mean = F.col("__s") / F.col("n_events")
    omean = F.col("__ts") / F.col("__tn")
    eps = F.lit(1e-9)
    return joined.select(
        *by,
        "weekday",
        "n_events",
        F.round(mean + eps, 6).alias("mean_value"),
        F.when(omean != 0, F.round(mean / omean + eps, 6)).alias(
            "seasonal_index"
        ),
    )
