"""Ordered funnel conversion (operators/funnel.py)."""

import pytest
from pyspark.sql import Row

from entity_resolution_spark.operators.funnel import funnel_conversion


def _ev(u, t, k):
    return Row(user_id=u, ts=t, event_type=k)


def test_funnel_orders_and_counts(spark):
    rows = [
        # u1 completes the whole funnel in order
        _ev(1, 1, "view"), _ev(1, 2, "click"), _ev(1, 3, "buy"),
        # u2 clicks BEFORE viewing -> click doesn't count; no buy
        _ev(2, 5, "click"), _ev(2, 6, "view"),
        # u3 views only
        _ev(3, 1, "view"),
        # u4 buys before clicking -> stops at click stage
        _ev(4, 1, "view"), _ev(4, 2, "buy"), _ev(4, 3, "click"),
        # u5 same-timestamp view+click: strict ordering -> click dropped
        _ev(5, 7, "view"), _ev(5, 7, "click"),
        # u6 never views
        _ev(6, 1, "click"), _ev(6, 2, "buy"),
    ]
    df = spark.createDataFrame(rows).repartition(4)
    got = {
        r["stage_idx"]: (
            r["stage"],
            r["users_reached"],
            r["conversion_from_prev"],
            r["conversion_overall"],
        )
        for r in funnel_conversion(df, ["view", "click", "buy"]).collect()
    }
    assert got[1] == ("view", 5, 1.0, 1.0)
    assert got[2] == ("click", 2, 0.4, 0.4)  # u1 and u4
    assert got[3] == ("buy", 1, 0.5, 0.2)  # only u1 (u4's buy precedes click)


def test_funnel_validation(spark):
    df = spark.createDataFrame([_ev(1, 1, "view")])
    with pytest.raises(ValueError):
        funnel_conversion(df, ["view"])


def test_cohort_retention_hand_matrix(spark):
    import datetime as dt

    from entity_resolution_spark.operators.funnel import cohort_retention

    T = lambda d: dt.datetime(2024, 1, d)  # Jan 2024: the 1st is a Monday
    rows = [
        # cohort week of Jan 1: users 1, 2
        Row(user_id=1, ts=T(2), event_type="x"),
        Row(user_id=1, ts=T(9), event_type="x"),   # week +1
        Row(user_id=1, ts=T(22), event_type="x"),  # week +3 (skips +2)
        Row(user_id=2, ts=T(3), event_type="x"),
        # cohort week of Jan 8: user 3
        Row(user_id=3, ts=T(10), event_type="x"),
        Row(user_id=3, ts=T(15), event_type="x"),  # week +1
    ]
    df = spark.createDataFrame(rows).repartition(3)
    got = {
        (str(r["cohort"])[:10], r["offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention"],
        )
        for r in cohort_retention(df, bucket="week").collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert ("2024-01-01", 2) not in got  # empty week leaves no row
    assert got[("2024-01-01", 3)] == (1, 2, 0.5)  # offset counts calendar weeks
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert got[("2024-01-08", 1)] == (1, 1, 1.0)
    import pytest

    with pytest.raises(ValueError):
        cohort_retention(df, bucket="fortnight")


def test_markov_transitions_hand_matrix(spark):
    from entity_resolution_spark.operators.funnel import markov_transitions

    rows = [
        _ev(1, 1, "a"), _ev(1, 2, "b"), _ev(1, 3, "a"), _ev(1, 4, "b"),
        _ev(2, 1, "a"), _ev(2, 2, "a"),
    ]
    df = spark.createDataFrame(rows).repartition(3)
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["prob"])
        for r in markov_transitions(df).collect()
    }
    # from a: a->b twice (u1), a->a once (u2) ; from b: b->a once
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "a")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3
