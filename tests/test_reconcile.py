"""Snapshot reconciliation (operators/reconcile.py) + CUSUM change-point
(operators/timeseries.py)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from entity_resolution_spark.operators.reconcile import (
    canonical_row,
    diff_summary,
    table_diff,
    table_fingerprint,
)
from entity_resolution_spark.operators.timeseries import change_point


def _snap(spark, rows):
    return spark.createDataFrame([Row(k=k, a=a, b=b) for k, a, b in rows]).repartition(3)


def test_table_diff_statuses_and_changed_cols(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, None, 4.0)])
    new = _snap(spark, [(1, "x", 1.0),            # unchanged -> dropped
                        (2, "y2", 2.5),           # both columns changed
                        (4, "w", 4.0),            # NULL -> value = changed
                        (5, "new", 5.0)])         # added
    out = {r["k"]: r for r in table_diff(old, new, ["k"], ["a", "b"]).collect()}
    assert set(out) == {2, 3, 4, 5}
    assert out[3]["status"] == "removed" and out[3]["changed_cols"] == ""
    assert out[5]["status"] == "added" and out[5]["changed_cols"] == ""
    assert out[2]["status"] == "changed" and out[2]["changed_cols"] == "a,b"
    assert out[4]["status"] == "changed" and out[4]["changed_cols"] == "a"


def test_table_diff_null_equal_is_unchanged(spark):
    schema = "k long, a string, b double"
    old = spark.createDataFrame([(1, None, 1.0)], schema)
    new = spark.createDataFrame([(1, None, 1.0)], schema)
    assert table_diff(old, new, ["k"], ["a", "b"]).count() == 0


def test_diff_summary_counts(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _snap(spark, [(1, "x", 1.0), (2, "Y", 2.0), (4, "n", 4.0)])
    out = {r["status"]: r["n_rows"] for r in diff_summary(old, new, ["k"]).collect()}
    assert out == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def _fp(spark, rows, parts=3):
    df = spark.createDataFrame([Row(g=g, i=i, s=s) for g, i, s in rows]).repartition(parts)
    rendered = canonical_row([F.col("i").cast("string"), F.coalesce(F.col("s"), F.lit("<N>"))])
    return {r["g"]: (r["n_rows"], r["fingerprint"]) for r in table_fingerprint(df, ["g"], rendered).collect()}


def test_fingerprint_order_and_partition_invariant(spark):
    rows = [("g", i, f"s{i}") for i in range(50)]
    a = _fp(spark, rows, parts=2)
    b = _fp(spark, list(reversed(rows)), parts=7)
    assert a == b


def test_fingerprint_detects_single_row_change(spark):
    rows = [("g", i, f"s{i}") for i in range(50)]
    tweaked = rows[:20] + [("g", 20, "DIFFERENT")] + rows[21:]
    a, b = _fp(spark, rows), _fp(spark, tweaked)
    assert a["g"][0] == b["g"][0] == 50
    assert a["g"][1] != b["g"][1]


def test_fingerprint_groups_isolated(spark):
    rows = [("g1", i, "x") for i in range(5)] + [("g2", i, "x") for i in range(5)]
    out = _fp(spark, rows)
    # identical content in both groups (the group key is not rendered here)
    assert out["g1"] == out["g2"]


def test_change_point_planted_step(spark):
    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    for day, v in enumerate([0.0, 0.0, 0.0, 10.0, 10.0, 10.0]):
        rows.append(Row(g="step", ts=d0 + datetime.timedelta(days=day), v=v))
    # flat series: every interior |S_k| is 0 -> earliest day wins
    for day in range(4):
        rows.append(Row(g="flat", ts=d0 + datetime.timedelta(days=day), v=5.0))
    rows.append(Row(g="single", ts=d0, v=1.0))  # no interior split -> omitted
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["g"]: r for r in change_point(df, "ts", "v", by=["g"]).collect()}
    assert set(out) == {"step", "flat"}
    s = out["step"]
    assert s["n_periods"] == 6
    assert s["cp_period"] == d0 + datetime.timedelta(days=2)  # last pre-step day
    assert s["cusum_max"] == 15.0
    assert s["mean_before"] == 0.0 and s["mean_after"] == 10.0
    f = out["flat"]
    assert f["cusum_max"] == 0.0 and f["cp_period"] == d0


def test_table_diff_rejects_missing_compare_columns(spark):
    """A column dropped from the new snapshot must fail loudly: silently
    intersecting compare_cols with new.columns made rows differing only
    in the dropped column report as unchanged."""
    import pytest

    old = spark.createDataFrame([(1, "x", "y")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "x")], "k long, a string")
    with pytest.raises(ValueError, match="missing from new.*'b'"):
        table_diff(old, new, ["k"])
    with pytest.raises(ValueError, match="missing from new"):
        table_diff(old, new, ["k"], ["a", "b"])
    with pytest.raises(ValueError, match="missing from old"):
        table_diff(new, old, ["k"], ["a", "b"])
    with pytest.raises(ValueError, match="missing from new"):
        diff_summary(old, new, ["k"])
    # explicit shared-column request still works on diverged schemas
    assert table_diff(old, new, ["k"], ["a"]).count() == 0
