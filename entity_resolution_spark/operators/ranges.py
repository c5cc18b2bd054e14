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

Long-interval fallback: an interval spanning more than ``max_span_bins``
bins does NOT get exploded (a year-long interval at minute bins would be
worse than the disease). Long intervals are split off, COUNTED (one
aggregate over the intervals frame, logged — never silent), and routed
through a broadcast theta join: the premise of the fallback is that such
outliers are few, so broadcasting them is safe, and the per-key nested
loop the theta join implies is bounded by their count. Each interval goes
through exactly one path, so the union is duplicate-free.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 86_400,
    max_span_bins: int = 64,
) -> DataFrame:
    """Inner join: point rows x interval rows with start <= t <= end on the
    shared key. Output: all point columns + all interval columns (caller
    aliases collisions beforehand). Intervals spanning > max_span_bins bins
    take the counted broadcast-theta fallback path; pass
    ``max_span_bins=None`` to force the explode path for every interval."""
    t = F.col(point_ts).cast("timestamp").cast("long")
    s = F.col(start_col).cast("timestamp").cast("long")
    e = F.col(end_col).cast("timestamp").cast("long")
    range_pred = (
        F.col(point_ts).cast("timestamp") >= F.col(start_col).cast("timestamp")
    ) & (F.col(point_ts).cast("timestamp") <= F.col(end_col).cast("timestamp"))

    i = intervals.withColumn("__s_bin", F.floor(s / bin_seconds)).withColumn(
        "__e_bin", F.floor(e / bin_seconds)
    )
    span = F.col("__e_bin") - F.col("__s_bin") + 1

    long_part = None
    if max_span_bins is not None:
        long_part = i.filter(span > max_span_bins).drop("__s_bin", "__e_bin")
        i = i.filter(span <= max_span_bins)

    p = points.withColumn("__bin", F.floor(t / bin_seconds))
    exploded = i.withColumn(
        "__bin", F.explode(F.sequence(F.col("__s_bin"), F.col("__e_bin")))
    ).drop("__s_bin", "__e_bin")
    out = p.join(exploded, [on, "__bin"]).where(range_pred).drop("__bin")

    if long_part is not None:
        # counted, not silent: one aggregate over the (small) intervals
        # frame decides whether the fallback job is even planned
        n_long = long_part.count()
        if n_long:
            _LOG.warning(
                "binned_range_join: %d interval(s) span > %d bins of %ds; "
                "routing them through the broadcast theta-join fallback",
                n_long,
                max_span_bins,
                bin_seconds,
            )
            theta = points.join(F.broadcast(long_part), [on]).where(range_pred)
            out = out.unionByName(theta)
    return out
