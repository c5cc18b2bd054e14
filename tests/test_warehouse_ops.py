"""Operator-level tests for the warehouse-maintenance + mining batch:
CDC changelog apply, incremental view maintenance, last-touch
attribution, label-propagation communities, margin-based pair mining.
(The full-query DuckDB oracles run in test_queries_oracle.py; these pin
the operator semantics on hand-built fixtures.)
"""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime.fromisoformat(s)


class TestApplyChangelog:
    def _run(self, spark, changelog_rows):
        from entity_resolution_spark.operators.cdc import apply_changelog

        base = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, state string, v double",
        )
        chg = spark.createDataFrame(
            changelog_rows, "k long, seq long, op string, state string, v double"
        )
        out = apply_changelog(base, chg, ["k"], ["seq"], op_col="op")
        return {r["k"]: (r["state"], r["v"]) for r in out.collect()}

    def test_last_change_wins_and_deletes_tombstone(self, spark):
        got = self._run(
            spark,
            [
                (1, 1, "U", "a1", 11.0),
                (1, 2, "U", "a2", 12.0),  # last for k=1 -> wins
                (2, 5, "U", "b1", 21.0),
                (2, 6, "D", None, None),  # delete k=2
                (4, 1, "U", "d", 40.0),  # insert new key
            ],
        )
        assert got == {1: ("a2", 12.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    def test_delete_then_reinsert_keeps_key(self, spark):
        got = self._run(spark, [(3, 1, "D", None, None), (3, 2, "U", "c2", 31.0)])
        assert got[3] == ("c2", 31.0)

    def test_empty_changelog_is_identity(self, spark):
        got = self._run(spark, [])
        assert got == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0)}

    def test_matches_sequential_replay(self, spark):
        """Random-ish changelog == a Python dict replay in seq order."""
        from entity_resolution_spark.operators.cdc import apply_changelog

        rows = []
        for i in range(200):
            k = i % 7
            op = "D" if i % 11 == 0 else "U"
            rows.append((k, i, op, f"s{i}", float(i)))
        base = spark.createDataFrame(
            [(k, "base", -1.0) for k in range(5)], "k long, state string, v double"
        )
        chg = spark.createDataFrame(rows, "k long, seq long, op string, state string, v double")
        got = {
            r["k"]: (r["state"], r["v"])
            for r in apply_changelog(base, chg, ["k"], ["seq"], op_col="op").collect()
        }
        state = {k: ("base", -1.0) for k in range(5)}
        for k, seq, op, s, v in sorted(rows, key=lambda r: r[1]):
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = (s, v)
        assert got == state

    def test_missing_payload_column_raises(self, spark):
        from entity_resolution_spark.operators.cdc import apply_changelog

        base = spark.createDataFrame([(1, "a")], "k long, state string")
        chg = spark.createDataFrame([(1, 1, "U")], "k long, seq long, op string")
        with pytest.raises(ValueError, match="missing base payload"):
            apply_changelog(base, chg, ["k"], ["seq"], op_col="op")


class TestIncrementalViewMaintenance:
    def test_maintained_equals_recompute(self, spark):
        from entity_resolution_spark.operators.ivm import (
            aggregate_partials,
            maintain_aggregate,
        )

        facts = spark.createDataFrame(
            [(i, "g%d" % (i % 3), i * 1.5) for i in range(60)],
            "id long, g string, v double",
        ).select("id", "g", F.col("v").cast("decimal(18,6)").alias("v"))
        base = facts.filter("id < 40")
        inserts = facts.filter("id >= 40")
        deletes = base.filter("id % 4 = 0")

        base_p = aggregate_partials(base, ["g"], ["v"])
        got = maintain_aggregate(base_p, inserts, deletes, ["g"], ["v"])
        want = (
            facts.filter("id >= 40 OR id % 4 <> 0")
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("__cnt"), F.sum("v").alias("sum_v"))
        )
        g = {r["g"]: (r["__cnt"], r["sum_v"]) for r in got.collect()}
        w = {r["g"]: (r["__cnt"], r["sum_v"]) for r in want.collect()}
        assert g == w

    def test_fully_retracted_group_disappears(self, spark):
        from entity_resolution_spark.operators.ivm import (
            aggregate_partials,
            maintain_aggregate,
        )

        base = spark.createDataFrame([(1, "only", 5)], "id long, g string, v long")
        empty = base.filter("id < 0")
        got = maintain_aggregate(
            aggregate_partials(base, ["g"], ["v"]), empty, base, ["g"], ["v"]
        )
        assert got.count() == 0


class TestAttribution:
    def _events(self, spark):
        rows = [
            # user 1: view -> purchase 10 min later (attributed to view)
            (1, _ts("2024-01-01 10:00:00"), 1, "view", 0.0),
            (2, _ts("2024-01-01 10:10:00"), 1, "purchase", 9.0),
            # then a click, then a purchase 2h later with window 1h -> direct
            (3, _ts("2024-01-01 11:00:00"), 1, "click", 0.0),
            (4, _ts("2024-01-01 13:00:01"), 1, "purchase", 5.0),
            # user 2: purchase with no preceding touch -> direct
            (5, _ts("2024-01-01 09:00:00"), 2, "purchase", 1.0),
            # user 2: click then purchase at EXACTLY the window bound -> attributed
            (6, _ts("2024-01-01 12:00:00"), 2, "click", 0.0),
            (7, _ts("2024-01-01 13:00:00"), 2, "purchase", 2.0),
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )

    def test_last_touch_window_and_direct(self, spark):
        from entity_resolution_spark.operators.funnel import attribute_conversions

        out = attribute_conversions(
            self._events(spark),
            conversion_type="purchase",
            touch_types=("view", "click"),
            window_seconds=3600.0,
        )
        got = {
            r["conversion_id"]: (r["attributed_type"], r["attributed_event_id"], r["lag_seconds"])
            for r in out.collect()
        }
        assert got[2] == ("view", 1, 600.0)
        assert got[4] == ("direct", None, None)  # click was 2h 1s before
        assert got[5] == ("direct", None, None)  # no touch at all
        assert got[7] == ("click", 6, 3600.0)  # inclusive bound

    def test_touch_must_strictly_precede(self, spark):
        from entity_resolution_spark.operators.funnel import attribute_conversions

        ev = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 10:00:00"), 1, "click", 0.0),
                (2, _ts("2024-01-01 10:00:00"), 1, "purchase", 1.0),
            ],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        out = attribute_conversions(ev, window_seconds=10.0)
        row = out.collect()[0]
        # same-timestamp touch with a SMALLER event_id precedes in the
        # (ts, event_id) order -> attributed with lag 0
        assert row["attributed_type"] == "click"
        assert row["lag_seconds"] == 0.0


class TestLabelPropagation:
    def test_two_triangles_with_bridge_stay_separate(self, spark):
        """CC would merge the bridged triangles into one component; LPA
        keeps two density communities — the over-merge diagnostic."""
        from entity_resolution_spark.operators.graphmetrics import label_propagation

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
            "left_id long, right_id long",
        )
        out = label_propagation(edges, iterations=5)
        comm = {r["id"]: r["community"] for r in out.collect()}
        assert comm[1] == comm[2] == comm[3]
        assert comm[4] == comm[5] == comm[6]
        assert comm[1] != comm[4]

    def test_deterministic_across_runs(self, spark):
        from entity_resolution_spark.operators.graphmetrics import label_propagation

        edges = spark.createDataFrame(
            [(i, (i * 7 + 3) % 20) for i in range(40)], "left_id long, right_id long"
        )
        a = sorted(map(tuple, label_propagation(edges, iterations=4).collect()))
        b = sorted(map(tuple, label_propagation(edges, iterations=4).collect()))
        assert a == b

    def test_iterations_validation(self, spark):
        from entity_resolution_spark.operators.graphmetrics import label_propagation

        edges = spark.createDataFrame([(1, 2)], "left_id long, right_id long")
        with pytest.raises(ValueError):
            label_propagation(edges, iterations=0)


class TestMarginMine:
    def test_planted_pairs_are_mutual_and_unique(self, spark):
        """Right vectors are noisy copies of left vectors: each planted
        pair must be mined, and the output must be one-to-one."""
        import numpy as np

        from entity_resolution_spark.operators.bitext import margin_mine

        rng = np.random.RandomState(7)
        L = rng.randn(12, 16)
        R = L + 0.05 * rng.randn(12, 16)  # right id i <-> left id i
        left = spark.createDataFrame(
            [(i, [float(x) for x in L[i]]) for i in range(12)],
            "vec_id long, embedding array<double>",
        )
        right = spark.createDataFrame(
            [(100 + i, [float(x) for x in R[i]]) for i in range(12)],
            "vec_id long, embedding array<double>",
        )
        out = margin_mine(left, right, k=3, threshold=1.0).collect()
        pairs = {(r["left_id"], r["right_id"]) for r in out}
        assert pairs == {(i, 100 + i) for i in range(12)}
        assert all(r["margin"] >= 1.0 for r in out)

    def test_k_validation(self, spark):
        from entity_resolution_spark.operators.bitext import margin_mine

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError):
            margin_mine(emb, emb, k=0)


class TestMadOutliers:
    def test_flags_planted_outlier_and_not_bulk(self, spark):
        from entity_resolution_spark.operators.stats import mad_outliers

        rows = [(i, "g", float(v)) for i, v in enumerate([10, 11, 12, 13, 14, 1000])]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        out = {r["id"]: (r["is_outlier"], r["robust_z"]) for r in
               mad_outliers(df, "v", ["g"]).collect()}
        assert out[5][0] is True and out[5][1] > 3.5
        assert all(not out[i][0] for i in range(5))

    def test_degenerate_group_mad_zero_flags_nothing(self, spark):
        from entity_resolution_spark.operators.stats import mad_outliers

        df = spark.createDataFrame(
            [(i, "g", 5.0) for i in range(4)] + [(9, "g", 9e9)],
            "id long, g string, v double",
        )
        out = mad_outliers(df, "v", ["g"]).collect()
        # median 5, MAD 0 -> robust_z NULL everywhere, nothing flagged
        assert all(r["robust_z"] is None and not r["is_outlier"] for r in out)

    def test_null_values_never_flagged(self, spark):
        from entity_resolution_spark.operators.stats import mad_outliers

        df = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (3, 3.0), (4, None)], "id long, v double"
        )
        out = {r["id"]: r["is_outlier"] for r in mad_outliers(df, "v").collect()}
        assert out[4] is False


class TestMixtureWeights:
    def _docs(self, spark):
        rows = [("a", 800), ("a", 200), ("b", 100), ("c", 10)]
        return spark.createDataFrame(rows, "source string, n long")

    def test_weights_normalize_and_order(self, spark):
        from entity_resolution_spark.operators.sampling import mixture_weights

        out = {r["source"]: r for r in
               mixture_weights(self._docs(spark), "n", alpha=0.7,
                               token_budget=1000.0).collect()}
        assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5
        # temperature < 1 upweights small sources vs their natural share
        assert out["c"]["weight"] > out["c"]["natural_frac"]
        assert out["a"]["weight"] < out["a"]["natural_frac"]
        # epochs = expected / n
        assert abs(out["b"]["epochs"] - out["b"]["expected_tokens"] / 100.0) < 1e-5

    def test_alpha_one_is_natural(self, spark):
        from entity_resolution_spark.operators.sampling import mixture_weights

        out = mixture_weights(self._docs(spark), "n", alpha=1.0).collect()
        assert all(abs(r["weight"] - r["natural_frac"]) < 1e-9 for r in out)

    def test_alpha_validation(self, spark):
        import pytest as _pt

        from entity_resolution_spark.operators.sampling import mixture_weights

        with _pt.raises(ValueError):
            mixture_weights(self._docs(spark), "n", alpha=0.0)


class TestSmithWaterman:
    def test_known_values(self):
        from entity_resolution_spark.functions.alignment import (
            batch_smith_waterman,
        )

        got = batch_smith_waterman(
            ["abc", "abc", "aaa", "abXc", "bc", "", "abc", None],
            ["abc", "xbcx", "bbb", "abc", "abcd", "abc", "", "abc"],
        )
        #       perfect  local'bc' none  1gap  contained  empties...
        assert list(got) == [6, 4, 0, 5, 4, 0, 0, 0]

    def test_matches_reference_dp_on_random_strings(self):
        import random

        from entity_resolution_spark.functions.alignment import (
            batch_smith_waterman,
            sw_score_ref,
        )

        rng = random.Random(11)
        alpha = "abcdé βx "
        a = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 18))) for _ in range(120)]
        b = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 18))) for _ in range(120)]
        got = batch_smith_waterman(a, b)
        want = [sw_score_ref(x, y) for x, y in zip(a, b)]
        assert list(got) == want

    def test_gap_validation(self):
        import pytest as _pt

        from entity_resolution_spark.functions.alignment import (
            batch_smith_waterman,
        )

        with _pt.raises(ValueError):
            batch_smith_waterman(["a"], ["a"], gap=-1)

    def test_operator_substring_scores_one(self, spark):
        from entity_resolution_spark.operators.setjoin import smith_waterman_score

        recs = spark.createDataFrame(
            [(1, "Deep Navy Lace"), (2, "navy"), (3, "steel rose")],
            "id long, text string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3)], "left_id long, right_id long"
        )
        out = {(r["left_id"], r["right_id"]): (r["sw_score"], r["sw_sim"]) for r in
               smith_waterman_score(recs, pairs, id_col="id", text_col="text").collect()}
        # 'navy' aligns perfectly inside 'deep navy lace' -> sim 1.0
        assert out[(1, 2)] == (8, 1.0)
        assert out[(1, 3)][1] < 1.0


class TestMultiTouchAttribution:
    def _events(self, spark):
        import datetime as dt

        def ts(m):
            return dt.datetime(2024, 1, 1, 10, m, 0)

        rows = [
            (1, ts(0), 1, "view", 0.0),
            (2, ts(1), 1, "click", 0.0),
            (3, ts(2), 1, "view", 0.0),
            (4, ts(3), 1, "click", 0.0),
            (5, ts(4), 1, "purchase", 9.0),  # 4 touches, cap 3 keeps newest 3
            (6, ts(0), 2, "purchase", 1.0),  # direct
            (7, ts(0), 3, "view", 0.0),
            (8, ts(5), 3, "purchase", 2.0),  # single touch -> full credit
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )

    def test_position_scheme_credits(self, spark):
        from entity_resolution_spark.operators.funnel import attribute_multi_touch

        out = attribute_multi_touch(
            self._events(spark), max_touches=3, scheme="position",
            window_seconds=3600.0,
        ).collect()
        by_conv = {}
        for r in out:
            by_conv.setdefault(r["conversion_id"], []).append(r)
        c5 = {r["touch_rank"]: (r["attributed_event_id"], r["credit"]) for r in by_conv[5]}
        # newest-first: rank 1 = event 4, rank 2 = event 3, rank 3 = event 2
        # (event 1 is aged out by the cap); U-shape 0.4/0.2/0.4
        assert c5 == {1: (4, 0.4), 2: (3, 0.2), 3: (2, 0.4)}
        assert by_conv[6][0]["attributed_type"] == "direct"
        assert by_conv[6][0]["credit"] == 1.0
        assert by_conv[8][0]["credit"] == 1.0 and by_conv[8][0]["attributed_event_id"] == 7

    def test_credits_sum_to_one_linear(self, spark):
        from entity_resolution_spark.operators.funnel import attribute_multi_touch

        out = attribute_multi_touch(
            self._events(spark), max_touches=5, scheme="linear",
            window_seconds=3600.0,
        ).collect()
        sums = {}
        for r in out:
            sums[r["conversion_id"]] = sums.get(r["conversion_id"], 0.0) + r["credit"]
        assert all(abs(s - 1.0) < 1e-6 for s in sums.values())

    def test_validation(self, spark):
        import pytest as _pt

        from entity_resolution_spark.operators.funnel import attribute_multi_touch

        ev = self._events(spark)
        with _pt.raises(ValueError):
            attribute_multi_touch(ev, max_touches=0)
        with _pt.raises(ValueError):
            attribute_multi_touch(ev, scheme="quadratic")


def test_cohort_ltv_hand_values(spark):
    import datetime

    from pyspark.sql import Row

    from entity_resolution_spark.operators.funnel import cohort_ltv

    w0 = datetime.datetime(2024, 1, 1)  # a Monday

    def e(u, weeks, v):
        return Row(user_id=u, ts=w0 + datetime.timedelta(weeks=weeks), value=v)

    # cohort w0: users 1,2. u1 spends 10 in w0, 30 in w2; u2 spends 20 in w0.
    rows = [e(1, 0, 10.0), e(1, 2, 30.0), e(2, 0, 20.0)]
    # cohort w1: user 3 spends 5 in w1 (offset 0) and NULL value ignored
    rows += [e(3, 1, 5.0), Row(user_id=3, ts=w0 + datetime.timedelta(weeks=1), value=None)]
    df = spark.createDataFrame(rows).repartition(3)
    out = {(r["cohort"].date().isoformat(), r["offset"]): r
           for r in cohort_ltv(df, bucket="week").collect()}
    k0, k2 = ("2024-01-01", 0), ("2024-01-01", 2)
    assert out[k0]["period_value"] == 30.0 and out[k0]["cum_value"] == 30.0
    assert out[k0]["cohort_size"] == 2 and out[k0]["ltv_per_user"] == 15.0
    # offset 1 has no activity and is omitted; offset 2 accumulates past it
    assert ("2024-01-01", 1) not in out
    assert out[k2]["period_value"] == 30.0 and out[k2]["cum_value"] == 60.0
    assert out[k2]["ltv_per_user"] == 30.0
    assert out[("2024-01-08", 0)]["ltv_per_user"] == 5.0
    import pytest

    with pytest.raises(ValueError):
        cohort_ltv(df, bucket="hour")


def test_sortedness_report_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.layout import sortedness_report

    # user 1: arrival order (pos) gives ts 1,3,2,4 -> one inversion of 3
    # adjacent pairs; user 2 perfectly sorted -> 2 pairs, 0 inversions
    rows = [Row(u=1, pos=p, t=t) for p, t in [(1, 1.0), (2, 3.0), (3, 2.0), (4, 4.0)]]
    rows += [Row(u=2, pos=p, t=t) for p, t in [(1, 1.0), (2, 2.0), (3, 3.0)]]
    rows += [Row(u=3, pos=1, t=None)]  # NULL order value excluded
    df = spark.createDataFrame(rows).repartition(3)
    r = sortedness_report(df, "u", "pos", "t").collect()[0]
    assert r["n_rows"] == 7 and r["n_pairs"] == 5
    assert r["n_inversions"] == 1
    assert r["sortedness"] == 0.8


def test_markov_attribution_hand_chain(spark):
    import datetime

    from pyspark.sql import Row

    from entity_resolution_spark.operators.funnel import markov_attribution

    t0 = datetime.datetime(2024, 1, 1)

    def e(i, u, s, typ):
        return Row(event_id=i, user_id=u, ts=t0 + datetime.timedelta(seconds=s), event_type=typ)

    # u1: click -> purchase; u2: view -> (no conversion);
    # u3: direct purchase (bare START -> CONV journey)
    rows = [e(1, 1, 0, "click"), e(2, 1, 10, "purchase"),
            e(3, 2, 0, "view"),
            e(4, 3, 0, "purchase")]
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["channel"]: r for r in markov_attribution(df, "purchase").collect()}
    assert set(out) == {"click", "view"}
    # P(conv): START -> click(1/3)->CONV, view(1/3)->NULL, CONV(1/3) = 2/3
    assert out["click"]["p_conv_all"] == round(2 / 3, 6)
    # removing click: its START mass dies in NULL -> a = 1/3, RE = 0.5
    assert out["click"]["p_conv_removed"] == round(1 / 3, 6)
    assert out["click"]["removal_effect"] == 0.5
    # view never reaches CONV: removing it changes nothing
    assert out["view"]["removal_effect"] == 0.0
    assert out["click"]["attribution"] == 1.0 and out["view"]["attribution"] == 0.0
    import pytest

    with pytest.raises(ValueError):
        markov_attribution(df, "purchase", rounds=0)


def test_shapley_attribution_hand_game(spark):
    import datetime

    from pyspark.sql import Row

    from entity_resolution_spark.operators.funnel import shapley_attribution

    t0 = datetime.datetime(2024, 1, 1)

    def e(u, s, typ):
        return Row(user_id=u, ts=t0 + datetime.timedelta(seconds=s), event_type=typ)

    # v({A}) = 1 (2/2), v({B}) = 0 (0/2), v({A,B}) = 0.5 (1/2), k = 2
    # phi_A = 1/2*(1-0) + 1/2*(0.5-0) = 0.75
    # phi_B = 1/2*(0-0) + 1/2*(0.5-1) = -0.25 -> clamped to 0 credit
    rows = [e(1, 0, "A"), e(1, 1, "purchase"),
            e(2, 0, "A"), e(2, 1, "purchase"),
            e(3, 0, "B"), e(4, 0, "B"),
            e(5, 0, "A"), e(5, 1, "B"), e(5, 2, "purchase"),
            e(6, 0, "A"), e(6, 1, "B")]
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["channel"]: r for r in shapley_attribution(df, "purchase").collect()}
    assert out["A"]["shapley_value"] == 0.75
    assert out["B"]["shapley_value"] == -0.25
    assert out["A"]["attribution"] == 1.0 and out["B"]["attribution"] == 0.0


def test_new_vs_returning_hand_values(spark):
    import datetime

    from pyspark.sql import Row

    from entity_resolution_spark.operators.funnel import new_vs_returning

    w0 = datetime.datetime(2024, 1, 1)  # Monday

    def e(u, weeks):
        return Row(user_id=u, ts=w0 + datetime.timedelta(weeks=weeks))

    # w0: users 1,2 (both new). w1: user 1 returns, user 3 is new.
    rows = [e(1, 0), e(2, 0), e(1, 1), e(3, 1), e(1, 1)]
    df = spark.createDataFrame(rows).repartition(2)
    out = {r["period"].date().isoformat(): r for r in new_vs_returning(df, "week").collect()}
    w0r, w1r = out["2024-01-01"], out["2024-01-08"]
    assert w0r["active_users"] == 2 and w0r["new_users"] == 2
    assert w0r["returning_users"] == 0 and w0r["returning_ratio"] == 0.0
    assert w1r["active_users"] == 2 and w1r["new_users"] == 1
    assert w1r["returning_users"] == 1 and w1r["returning_ratio"] == 0.5
    import pytest

    with pytest.raises(ValueError):
        new_vs_returning(df, "hour")


def test_stage_latency_report_hand_values(spark):
    import datetime

    from pyspark.sql import Row

    from entity_resolution_spark.operators.funnel import stage_latency_report

    t0 = datetime.datetime(2024, 1, 1)

    def e(i, u, secs, typ):
        return Row(event_id=i, user_id=u, ts=t0 + datetime.timedelta(seconds=secs), event_type=typ)

    # u1: view -> +10s purchase (view lag 10); u2: click -> +30s purchase;
    # u3: purchase with no touch -> direct
    rows = [e(1, 1, 0, "view"), e(2, 1, 10, "purchase"),
            e(3, 2, 0, "click"), e(4, 2, 30, "purchase"),
            e(5, 3, 0, "purchase")]
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["attributed_type"]: r for r in stage_latency_report(df).collect()}
    assert out["view"]["n_conversions"] == 1 and out["view"]["avg_lag_s"] == 10.0
    assert out["view"]["p50_lag_s"] == 10.0
    assert out["click"]["avg_lag_s"] == 30.0
    assert out["direct"]["n_conversions"] == 1 and out["direct"]["avg_lag_s"] is None


class TestAdviceRegressionsR4:
    def test_label_propagation_string_ids_deterministic_tiebreak(self, spark):
        """String node ids: the tiebreak must not negate the label (which
        NULLs out strings). Node "c" sees labels {"a": 1, "b": 1} after
        round 1 — the min-label schedule must pick "a" deterministically."""
        from entity_resolution_spark.operators.graphmetrics import (
            label_propagation,
        )

        edges = spark.createDataFrame(
            [("a", "c"), ("b", "c")], "left_id string, right_id string"
        )
        outs = [
            {r["id"]: r["community"]
             for r in label_propagation(edges, iterations=1).collect()}
            for _ in range(3)
        ]
        for comm in outs:
            assert comm["c"] == "a"
            assert comm == outs[0]

    def test_label_propagation_string_triangles(self, spark):
        from entity_resolution_spark.operators.graphmetrics import (
            label_propagation,
        )

        # same topology and label ordering as the numeric two-triangle
        # test above (labels on the left triangle sort first, bridge
        # n3-n4): the communities must come out identical under the
        # string rendering of the ids
        edges = spark.createDataFrame(
            [("n1", "n2"), ("n2", "n3"), ("n1", "n3"),
             ("n4", "n5"), ("n5", "n6"), ("n4", "n6"), ("n3", "n4")],
            "left_id string, right_id string",
        )
        comm = {r["id"]: r["community"]
                for r in label_propagation(edges, iterations=5).collect()}
        assert comm["n1"] == comm["n2"] == comm["n3"]
        assert comm["n4"] == comm["n5"] == comm["n6"]
        assert comm["n1"] != comm["n4"]

    def test_shapley_pipe_channel_rename_invariance(self, spark):
        """A channel literally named "a|b" must not alias the coalition
        {"a", "b"} (the old concat_ws('|') key collided them). Renaming
        "a|b" -> "X" bijectively must leave every Shapley value
        unchanged."""
        import datetime

        from pyspark.sql import Row

        from entity_resolution_spark.operators.funnel import (
            shapley_attribution,
        )

        t0 = datetime.datetime(2024, 1, 1)

        def mk(ch3):
            def e(u, s, typ):
                return Row(
                    user_id=u,
                    ts=t0 + datetime.timedelta(seconds=s),
                    event_type=typ,
                )

            # coalition {a, b} (converting) coexists with {ch3} where
            # ch3 in ("a|b", "X"); under the broken key v({"a","b"})
            # and v({"a|b"}) collide and corrupt each other's lookups
            return spark.createDataFrame(
                [e(1, 0, "a"), e(1, 1, "b"), e(1, 2, "purchase"),
                 e(2, 0, "a"), e(2, 1, "b"),
                 e(3, 0, ch3), e(3, 1, "purchase"),
                 e(4, 0, ch3),
                 e(5, 0, "a"), e(5, 1, "purchase")]
            ).repartition(3)

        piped = {
            r["channel"]: (r["shapley_value"], r["attribution"])
            for r in shapley_attribution(mk("a|b"), "purchase").collect()
        }
        plain = {
            r["channel"]: (r["shapley_value"], r["attribution"])
            for r in shapley_attribution(mk("X"), "purchase").collect()
        }
        assert piped["a|b"] == plain["X"]
        assert piped["a"] == plain["a"]
        assert piped["b"] == plain["b"]

    def test_markov_reserved_sentinel_rejected(self, spark):
        import datetime

        import pytest
        from pyspark.sql import Row

        from entity_resolution_spark.operators.funnel import (
            markov_attribution,
        )

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            Row(event_id=1, user_id=1, ts=t0, event_type="__NULL__"),
            Row(event_id=2, user_id=1,
                ts=t0 + datetime.timedelta(seconds=5), event_type="purchase"),
        ]
        df = spark.createDataFrame(rows)
        with pytest.raises(ValueError, match="reserved state sentinel"):
            markov_attribution(df, "purchase")


class TestDegreeProfile:
    def test_hand_graph(self, spark):
        """Path a-b-c plus hub d connected to all: degrees a=2,b=3,c=2,d=3
        -> histogram {2: 2, 3: 2}; duplicate and self edges ignored."""
        from entity_resolution_spark.operators.graphmetrics import (
            degree_profile,
        )

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c"), ("a", "d"), ("b", "d"),
             ("c", "d"), ("c", "c")],
            "left_id string, right_id string",
        )
        out = {r["degree"]: r for r in degree_profile(edges).collect()}
        assert {d: r["n_nodes"] for d, r in out.items()} == {2: 2, 3: 2}
        assert out[2]["frac_nodes"] == 0.5 and out[2]["cum_frac"] == 0.5
        assert out[3]["cum_frac"] == 1.0
