"""Gap-filled resampling + LOCF (operators/timeseries.py)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from entity_resolution_spark.operators.timeseries import resample_events


def test_resample_fills_gaps_and_locf(spark):
    T = lambda d, h=0: dt.datetime(2024, 3, d, h)
    rows = [
        Row(user_id=1, ts=T(1), value=10.0),
        Row(user_id=1, ts=T(1, 6), value=20.0),  # same day -> one bucket
        # March 2 and 3 silent
        Row(user_id=1, ts=T(4), value=40.0),
        Row(user_id=2, ts=T(5), value=1.0),
    ]
    df = spark.createDataFrame(rows).repartition(3)
    got = {
        (r["user_id"], str(r["bucket"])[:10]): (
            r["n_events"],
            r["sum_value"],
            r["avg_filled"],
        )
        for r in resample_events(df, unit="day").collect()
    }
    assert got[(1, "2024-03-01")] == (2, 30.0, 15.0)
    assert got[(1, "2024-03-02")] == (0, None, 15.0)  # gap: zero, LOCF avg
    assert got[(1, "2024-03-03")] == (0, None, 15.0)
    assert got[(1, "2024-03-04")] == (1, 40.0, 40.0)
    assert got[(2, "2024-03-05")] == (1, 1.0, 1.0)
    assert len(got) == 5  # spans are per-key, not global
    with pytest.raises(ValueError):
        resample_events(df, unit="fortnight")


def test_activity_streaks_hand(spark):
    T = lambda d: dt.datetime(2024, 5, d, 12)
    rows = (
        [Row(user_id=1, ts=T(d)) for d in (1, 2, 3, 7, 8, 20)]
        + [Row(user_id=1, ts=T(2))]  # duplicate day deduped
        + [Row(user_id=2, ts=T(10))]
    )
    df = spark.createDataFrame(rows).repartition(3)
    from entity_resolution_spark.operators.timeseries import activity_streaks

    got = {
        (r["user_id"], str(r["streak_start"])): (str(r["streak_end"]), r["n_days"])
        for r in activity_streaks(df).collect()
    }
    assert got[(1, "2024-05-01")] == ("2024-05-03", 3)
    assert got[(1, "2024-05-07")] == ("2024-05-08", 2)
    assert got[(1, "2024-05-20")] == ("2024-05-20", 1)
    assert got[(2, "2024-05-10")] == ("2024-05-10", 1)
    assert len(got) == 4


class TestRollingStats:
    def test_calendar_gaps_thin_the_window(self, spark):
        """RANGE frame: a day outside the trailing window drops out even
        when it is the previous ROW."""
        import datetime as dt

        from entity_resolution_spark.operators.timeseries import rolling_stats

        def ts(day):
            return dt.datetime(2024, 1, day, 12, 0, 0)

        rows = [
            (1, ts(1), 10.0),
            (1, ts(2), 20.0),
            (1, ts(2), 30.0),
            (1, ts(10), 40.0),  # > 7 days after day 2 -> window restarts
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        out = {
            r["bucket"].day: (r["n_events"], r["roll_n"], r["roll_sum"], r["roll_avg"])
            for r in rolling_stats(df, window_buckets=7).collect()
        }
        assert out[1] == (1, 1, 10.0, 10.0)
        assert out[2] == (2, 3, 60.0, 20.0)
        assert out[10] == (1, 1, 40.0, 40.0)  # days 1-2 aged out

    def test_window_validation(self, spark):
        import pytest as _pt

        from entity_resolution_spark.operators.timeseries import rolling_stats

        df = spark.createDataFrame([], "user_id long, ts timestamp, value double")
        with _pt.raises(ValueError):
            rolling_stats(df, window_buckets=0)


def test_decayed_value_halving(spark):
    import datetime

    import pytest
    from pyspark.sql import Row

    from entity_resolution_spark.operators.timeseries import decayed_value

    t0 = datetime.datetime(2020, 1, 31)  # horizon = max ts
    rows = [
        Row(u=1, ts=t0, v=10.0),                                 # age 0  -> w 1
        Row(u=1, ts=t0 - datetime.timedelta(days=30), v=10.0),   # age 30 -> w 1/2
        Row(u=2, ts=t0 - datetime.timedelta(days=60), v=8.0),    # age 60 -> w 1/4
    ]
    df = spark.createDataFrame(rows).repartition(2)
    out = {r["u"]: r for r in decayed_value(df, "u", "ts", "v", 30.0).collect()}
    assert out[1]["decayed_sum"] == pytest.approx(15.0, abs=1e-6)
    assert out[1]["decayed_weight"] == pytest.approx(1.5, abs=1e-6)
    assert out[2]["decayed_sum"] == pytest.approx(2.0, abs=1e-6)
    with pytest.raises(ValueError):
        decayed_value(df, "u", "ts", "v", 0.0)


def test_period_over_period_growth(spark):
    import datetime

    from pyspark.sql import Row

    from entity_resolution_spark.operators.timeseries import period_over_period

    mon = datetime.datetime(2024, 1, 1)  # a Monday

    def ev(day, typ):
        return Row(ts=mon + datetime.timedelta(days=day), event_type=typ, value=1.0)

    rows = [ev(0, "a"), ev(1, "a")]            # week 1: 2 events
    rows += [ev(7, "a"), ev(8, "a"), ev(9, "a")]  # week 2: 3 -> growth 1.5
    rows += [ev(21, "a")]                      # week 4 (week 3 missing): prev = week 2
    rows += [ev(0, "b")]                       # single week -> growth NULL
    df = spark.createDataFrame(rows).repartition(2)
    out = {
        (r["event_type"], r["period"].day): (r["n_rows"], r["prev_n_rows"], r["growth"])
        for r in period_over_period(df, "ts", by=["event_type"], value="value").collect()
    }
    assert out[("a", 1)] == (2, None, None)
    assert out[("a", 8)] == (3, 2, 1.5)
    assert out[("a", 22)] == (1, 3, 0.333333)  # lag is previous OBSERVED week
    assert out[("b", 1)] == (1, None, None)


def test_interarrival_stats_hand_values(spark):
    import datetime

    from pyspark.sql import Row

    from entity_resolution_spark.operators.timeseries import interarrival_stats

    t0 = datetime.datetime(2024, 1, 1)

    def e(i, u, secs, typ):
        return Row(event_id=i, user_id=u, ts=t0 + datetime.timedelta(seconds=secs), event_type=typ)

    # user 1: gaps 10s then 20s; user 2: single event (no gap);
    # same-ts pair for user 3 ordered by event_id -> gap 0
    rows = [e(1, 1, 0, "a"), e(2, 1, 10, "a"), e(3, 1, 30, "b"),
            e(4, 2, 5, "a"), e(5, 3, 7, "b"), e(6, 3, 7, "b")]
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["event_type"]: r for r in
           interarrival_stats(df, "user_id", "ts", "event_id", by=["event_type"]).collect()}
    assert out["a"]["n_gaps"] == 1 and out["a"]["avg_gap_s"] == 10.0
    assert out["b"]["n_gaps"] == 2 and out["b"]["avg_gap_s"] == 10.0  # 20 and 0
    assert out["b"]["p50_s"] == 10.0 and out["b"]["p25_s"] == 5.0


class TestEwmaRunning:
    def test_hand_recursion(self, spark):
        import datetime

        from pyspark.sql import Row

        from entity_resolution_spark.operators.timeseries import ewma_running
        from entity_resolution_spark.session import ensure_py_files

        ensure_py_files(spark)
        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            Row(k="a", ts=t0 + datetime.timedelta(seconds=s), eid=s, v=v)
            for s, v in [(0, 10.0), (1, 20.0), (2, 0.0), (3, 40.0)]
        ] + [Row(k="b", ts=t0, eid=0, v=5.0),
             Row(k="a", ts=t0 + datetime.timedelta(seconds=4), eid=4, v=None)]
        out = {
            (r["k"], r["rn"]): r["ewma"]
            for r in ewma_running(
                spark.createDataFrame(rows).repartition(3),
                "k", "ts", "v", alpha=0.5, tiebreak="eid",
            ).collect()
        }
        # e1=10, e2=.5*20+.5*10=15, e3=7.5, e4=23.75; NULL row dropped
        assert out == {
            ("a", 1): 10.0, ("a", 2): 15.0, ("a", 3): 7.5,
            ("a", 4): 23.75, ("b", 1): 5.0,
        }

    def test_partitioning_invariance(self, spark):
        from entity_resolution_spark.operators.timeseries import ewma_running
        from entity_resolution_spark.session import ensure_py_files

        ensure_py_files(spark)
        df = spark.range(500).select(
            (F.col("id") % 7).alias("k"),
            F.col("id").alias("ts"),
            F.col("id").alias("eid"),
            (F.col("id") % 13).cast("double").alias("v"),
        )
        a = sorted(map(tuple, ewma_running(df.repartition(1), "k", "ts", "v").collect()))
        b = sorted(map(tuple, ewma_running(df.repartition(11), "k", "ts", "v").collect()))
        assert a == b

    def test_alpha_validation(self, spark):
        import pytest

        from entity_resolution_spark.operators.timeseries import ewma_running

        df = spark.range(1).select(
            F.lit("k").alias("k"), F.col("id").alias("ts"),
            F.lit(1.0).alias("v")
        )
        with pytest.raises(ValueError):
            ewma_running(df, "k", "ts", "v", alpha=0.0)
        with pytest.raises(ValueError):
            ewma_running(df, "k", "ts", "v", alpha=1.5)


class TestHoltLinear:
    def test_hand_recursion(self, spark):
        import datetime

        from pyspark.sql import Row

        from entity_resolution_spark.operators.timeseries import holt_linear
        from entity_resolution_spark.session import ensure_py_files

        ensure_py_files(spark)
        t0 = datetime.datetime(2024, 1, 1)
        xs = [10.0, 12.0, 11.0, 15.0]
        rows = [
            Row(k="a", ts=t0 + datetime.timedelta(seconds=s), eid=s, v=v)
            for s, v in enumerate(xs)
        ] + [Row(k="solo", ts=t0, eid=0, v=3.0)]
        out = {
            (r["k"], r["rn"]): (r["level"], r["trend"])
            for r in holt_linear(
                spark.createDataFrame(rows).repartition(3),
                "k", "ts", "v", alpha=0.5, gamma=0.3, tiebreak="eid",
            ).collect()
        }
        # python replica of the documented recursion
        l, b = xs[0], xs[1] - xs[0]
        exp = {("a", 1): (l, b)}
        for t in range(1, len(xs)):
            lp = l
            l = 0.5 * xs[t] + 0.5 * (l + b)
            b = 0.3 * (l - lp) + 0.7 * b
            exp[("a", t + 1)] = (round(l, 6), round(b, 6))
        exp[("solo", 1)] = (3.0, 0.0)  # singleton: trend seeds to 0
        assert out == exp

    def test_validation(self, spark):
        import pytest

        from entity_resolution_spark.operators.timeseries import holt_linear

        df = spark.range(1).select(
            F.lit("k").alias("k"), F.col("id").alias("ts"),
            F.lit(1.0).alias("v")
        )
        with pytest.raises(ValueError):
            holt_linear(df, "k", "ts", "v", alpha=0.0)
        with pytest.raises(ValueError):
            holt_linear(df, "k", "ts", "v", gamma=1.5)


class TestWeeklyProfile:
    def test_hand_values(self, spark):
        import datetime

        from pyspark.sql import Row

        from entity_resolution_spark.operators.timeseries import (
            weekly_profile,
        )

        # Mon 2024-01-01, Tue 2024-01-02 .. values chosen for exact means
        rows = [
            Row(g="a", ts=datetime.datetime(2024, 1, 1, 10), v=10.0),  # Mon
            Row(g="a", ts=datetime.datetime(2024, 1, 8, 10), v=20.0),  # Mon
            Row(g="a", ts=datetime.datetime(2024, 1, 2, 10), v=30.0),  # Tue
            Row(g="a", ts=datetime.datetime(2024, 1, 3, 10), v=None),  # drop
        ]
        out = {
            r["weekday"]: r
            for r in weekly_profile(
                spark.createDataFrame(rows), "ts", "v", by=["g"]
            ).collect()
        }
        assert set(out) == {0, 1}
        assert out[0]["n_events"] == 2 and out[0]["mean_value"] == 15.0
        assert out[1]["n_events"] == 1 and out[1]["mean_value"] == 30.0
        # overall mean 20 -> indices 0.75 / 1.5
        assert out[0]["seasonal_index"] == 0.75
        assert out[1]["seasonal_index"] == 1.5


class TestEncodingDamage:
    def test_hand_cases(self, spark):
        from entity_resolution_spark.functions.text import (
            encoding_damage_cols,
        )

        rows = [
            ("clean", "a perfectly fine sentence."),
            ("moji", "cafÃ© quote â€™ here"),
            ("rep", "bad �� bytes"),
            ("ctl", "bell\x07 and soh\x01 but tab\t newline\n ok"),
            ("empty", ""),
        ]
        df = spark.createDataFrame(rows, "id string, text string")
        cols = encoding_damage_cols(F.col("text"))
        out = {
            r["id"]: r
            for r in df.select(
                "id", *[v.alias(k) for k, v in cols.items()]
            ).collect()
        }
        assert out["clean"]["damage_ratio"] == 0.0
        assert out["moji"]["n_mojibake"] == 2
        assert out["rep"]["n_replacement"] == 2
        assert out["ctl"]["n_control"] == 2  # tab/newline NOT counted
        assert out["empty"]["damage_ratio"] == 0.0

    def test_plan_is_pure_jvm(self, spark):
        from entity_resolution_spark.functions.text import (
            encoding_damage_cols,
        )

        df = spark.createDataFrame([("x", "t")], "id string, text string")
        cols = encoding_damage_cols(F.col("text"))
        plan = (
            df.select("id", *[v.alias(k) for k, v in cols.items()])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_smooth_native_bit_parity():
    """The C smoothing kernels must be BIT-identical to the pinned Python
    recursions (same expression trees, -ffp-contract=off): the DuckDB
    recursive-CTE oracles replicate the Python order, so any ulp drift in
    the native path would surface as an oracle hash flake. Same
    toolchain-availability contract as the LCS kernel: a host WITH cc must
    build it or fail loudly."""
    import random

    import numpy as np

    from entity_resolution_spark.functions._smooth_native import (
        ewma_native,
        get_lib,
        holt_native,
    )

    if get_lib() is None:
        import os
        import shutil

        import pytest

        cc = shutil.which(os.environ.get("CC", "cc"))
        assert cc is None, (
            f"C toolchain present at {cc} but the native smoothing kernel "
            "failed to build — get_lib() returned None"
        )
        pytest.skip("no C toolchain — pure-Python path is the only path")

    rng = np.random.RandomState(99)
    random.seed(99)
    cases = [
        np.array([], dtype="float64"),
        np.array([3.25]),
        np.array([0.01 * i for i in range(1, 2000)]),  # 2-decimal boundary bait
        rng.standard_normal(5000) * 1e6,
        rng.standard_normal(257) * 1e-300,  # subnormal-adjacent magnitudes
    ]
    for alpha, gamma in ((0.4375, 0.3), (0.3, 0.0), (1.0, 1.0), (0.123, 0.456)):
        beta, ca, cb = 1.0 - alpha, 1.0 - alpha, 1.0 - gamma
        for x in cases:
            got, final = ewma_native(x, alpha, beta)
            e_acc, want = 0.0, np.empty_like(x)
            for i in range(len(x)):
                e_acc = x[i] if i == 0 else alpha * x[i] + beta * e_acc
                want[i] = e_acc
            assert got.tobytes() == want.tobytes(), (alpha, len(x))
            if len(x):
                assert final == e_acc

            # resume parity: splitting the fold at any point continues
            # bit-identically (the streaming path's contract)
            if len(x) > 3:
                cut = len(x) // 3
                h1, f1 = ewma_native(x[:cut], alpha, beta)
                h2, _ = ewma_native(x[cut:], alpha, beta, rn0=cut, e0=f1)
                assert np.concatenate([h1, h2]).tobytes() == want.tobytes()

            lv, tr = holt_native(x, alpha, ca, gamma, cb)
            n = len(x)
            wl, wt = np.empty(n), np.empty(n)
            if n:
                l = x[0]
                b = (x[1] - x[0]) if n > 1 else 0.0
                wl[0], wt[0] = l, b
                for t in range(1, n):
                    l_prev = l
                    l = alpha * x[t] + ca * (l + b)
                    b = gamma * (l - l_prev) + cb * b
                    wl[t], wt[t] = l, b
            assert lv.tobytes() == wl.tobytes() and tr.tobytes() == wt.tobytes()


def test_smooth_native_microbench():
    """The Arrow group pass must no longer pay a Python dispatch per
    element: the C kernel on a 1M-element key must beat the Python loop
    by a wide margin (conservative 5x gate; measured ~100x)."""
    import time

    import numpy as np
    import pytest

    from entity_resolution_spark.functions._smooth_native import (
        ewma_native,
        get_lib,
    )

    if get_lib() is None:
        pytest.skip("no C toolchain")
    x = np.random.RandomState(1).standard_normal(1_000_000)
    alpha, beta = 0.4375, 0.5625
    t0 = time.perf_counter()
    ewma_native(x, alpha, beta)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = 0.0
    e = np.empty_like(x)
    for i in range(len(x)):
        acc = x[i] if i == 0 else alpha * x[i] + beta * acc
        e[i] = acc
    t_python = time.perf_counter() - t0
    assert t_native * 5 < t_python, (t_native, t_python)


def test_round4_ops_empty_inputs(spark):
    """Empty frames flow through every new round-4 operator without
    crashing and produce empty (not malformed) results."""
    import numpy as np

    from entity_resolution_spark.functions.text import (
        cc_redact_cols,
        encoding_damage_cols,
    )
    from entity_resolution_spark.operators.graphmetrics import degree_profile
    from entity_resolution_spark.operators.timeseries import (
        ewma_running,
        holt_linear,
        weekly_profile,
    )
    from entity_resolution_spark.session import ensure_py_files

    ensure_py_files(spark)
    ev = spark.createDataFrame(
        [], "k string, ts timestamp, eid long, v double"
    )
    assert ewma_running(ev, "k", "ts", "v", tiebreak="eid").count() == 0
    assert holt_linear(ev, "k", "ts", "v", tiebreak="eid").count() == 0
    assert weekly_profile(ev, "ts", "v", by=["k"]).count() == 0
    edges = spark.createDataFrame([], "left_id string, right_id string")
    assert degree_profile(edges).count() == 0
    txt = spark.createDataFrame([], "id string, text string")
    for colsfn in (cc_redact_cols, encoding_damage_cols):
        cols = colsfn(F.col("text"))
        assert (
            txt.select("id", *[v.alias(k) for k, v in cols.items()]).count()
            == 0
        )
