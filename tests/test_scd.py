"""SCD2 history construction (operators/scd.py)."""

import pytest
from pyspark.sql import Row

from entity_resolution_spark.operators.scd import (
    scd2_from_events,
    scd2_point_in_time,
)


def test_scd2_collapses_no_change_runs(spark):
    rows = [
        Row(k=1, ts=1, s="a"),
        Row(k=1, ts=2, s="a"),  # no change -> collapses
        Row(k=1, ts=3, s="b"),
        Row(k=1, ts=4, s="a"),  # back to a -> NEW episode (type 2)
        Row(k=2, ts=5, s="x"),
    ]
    df = spark.createDataFrame(rows).repartition(3)
    got = {
        (r["k"], r["version"]): (r["s"], r["valid_from"], r["valid_to"])
        for r in scd2_from_events(df, ["k"], "ts", ["s"]).collect()
    }
    assert got == {
        (1, 1): ("a", 1, 3),
        (1, 2): ("b", 3, 4),
        (1, 3): ("a", 4, None),
        (2, 1): ("x", 5, None),
    }


def test_scd2_null_attr_transitions(spark):
    rows = [
        Row(k=1, ts=1, s=None),
        Row(k=1, ts=2, s=None),  # NULL -> NULL: no change
        Row(k=1, ts=3, s="v"),   # NULL -> v: change
        Row(k=1, ts=4, s=None),  # v -> NULL: change
    ]
    hist = scd2_from_events(
        spark.createDataFrame(rows, "k long, ts long, s string"), ["k"], "ts", ["s"]
    ).collect()
    assert [(r["version"], r["s"]) for r in sorted(hist, key=lambda r: r["version"])] == [
        (1, None),
        (2, "v"),
        (3, None),
    ]


def test_scd2_point_in_time_snapshot(spark):
    rows = [Row(k=1, ts=t, s=s) for t, s in [(1, "a"), (5, "b"), (9, "c")]]
    hist = scd2_from_events(spark.createDataFrame(rows), ["k"], "ts", ["s"])
    assert scd2_point_in_time(hist, 6).collect()[0]["s"] == "b"
    assert scd2_point_in_time(hist, 100).collect()[0]["s"] == "c"
    assert scd2_point_in_time(hist, 0).count() == 0
    # boundary: at exactly ts=5 the new episode is live ([from, to))
    assert scd2_point_in_time(hist, 5).collect()[0]["s"] == "b"
    with pytest.raises(ValueError):
        scd2_from_events(spark.createDataFrame(rows), [], "ts", ["s"])
