"""Binned range join vs naive theta-join oracle."""

from pyspark.sql import functions as F

from entity_resolution_spark.operators.ranges import binned_range_join


def test_binned_range_join_equals_theta(spark):
    points = spark.createDataFrame(
        [(1, "2026-01-05 12:00:00", 100), (1, "2026-02-20 00:00:00", 101),
         (2, "2026-01-05 00:00:00", 102), (1, "2026-01-10 00:00:00", 103)],
        "k long, ts string, pid long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", "2026-01-07 00:00:00", 900),   # covers 100
         (1, "2026-01-04 00:00:00", "2026-01-31 00:00:00", 901),   # covers 100,103
         (2, "2026-01-05 00:00:00", "2026-01-05 00:00:00", 902)],  # exact boundary: 102
        "k long, s string, e string, iid long",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn("e", F.col("e").cast("timestamp"))
    got = {
        (r.pid, r.iid)
        for r in binned_range_join(points, intervals, "k", "ts", "s", "e").collect()
    }
    theta = {
        (r.pid, r.iid)
        for r in points.join(
            intervals,
            (points.k == intervals.k) & (points.ts >= intervals.s) & (points.ts <= intervals.e),
        ).collect()
    }
    assert got == theta == {(100, 900), (100, 901), (103, 901), (102, 902)}


def test_bin_width_invariance(spark):
    points = spark.createDataFrame(
        [(1, "2026-01-0%d 06:00:00" % d, d) for d in range(1, 9)], "k long, ts string, pid long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(1, "2026-01-02 00:00:00", "2026-01-05 23:59:59", 1)], "k long, s string, e string, iid long"
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn("e", F.col("e").cast("timestamp"))
    for width in (3600, 86_400, 7 * 86_400):
        got = sorted(
            r.pid for r in binned_range_join(points, intervals, "k", "ts", "s", "e", bin_seconds=width).collect()
        )
        assert got == [2, 3, 4, 5], width
