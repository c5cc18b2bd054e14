"""Unit tests for 1-1 match assignment (operators/matching.py) beyond the
driver oracle row (test_queries_oracle.py::one_to_one_matches).
"""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.matching import (
    greedy_one_to_one,
    mutual_best_matches,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "left_id long, right_id long, score double")


def _python_iterated_mutual(rows):
    """Reference: rounds of mutual best match (score DESC, partner ASC)."""
    edges = {}
    for l, r, s in rows:
        edges[(l, r)] = s
        edges[(r, l)] = s
    out = []
    while edges:
        best = {}
        for (a, b), s in edges.items():
            cur = best.get(a)
            if cur is None or (s, -b) > (cur[1], -cur[0]):
                best[a] = (b, s)
        matched = set()
        for a, (b, s) in best.items():
            if a < b and best.get(b, (None,))[0] == a:
                out.append((a, b, s))
                matched.update((a, b))
        if not matched:
            break
        edges = {
            (a, b): s
            for (a, b), s in edges.items()
            if a not in matched and b not in matched
        }
    return sorted(out)


def _python_greedy(rows):
    """Sequential greedy by (score DESC, left ASC, right ASC); distinct scores."""
    taken, out = set(), []
    for l, r, s in sorted(rows, key=lambda x: (-x[2], x[0], x[1])):
        if l not in taken and r not in taken:
            out.append((l, r, s))
            taken.update((l, r))
    return sorted(out)


def test_mutual_best_hand_graph(spark):
    # A-B mutual; C prefers A but A prefers B -> C unmatched
    rows = [(1, 2, 0.9), (1, 3, 0.5), (2, 3, 0.4)]
    got = sorted(
        (r.left_id, r.right_id, r.score)
        for r in mutual_best_matches(_df(spark, rows)).collect()
    )
    assert got == [(1, 2, 0.9)]


def test_mutual_best_tie_prefers_smaller_partner(spark):
    rows = [(2, 5, 0.7), (2, 4, 0.7), (4, 5, 0.1)]
    got = sorted(
        (r.left_id, r.right_id)
        for r in mutual_best_matches(_df(spark, rows)).collect()
    )
    assert got == [(2, 4)]  # 4 < 5 at equal score


def test_greedy_equals_sequential_on_distinct_scores(spark):
    rows = [
        (1, 2, 0.9),
        (2, 3, 0.95),
        (3, 4, 0.8),
        (4, 5, 0.85),
        (5, 6, 0.7),
        (1, 6, 0.6),
        (7, 8, 0.5),
    ]
    got = sorted(
        (r.left_id, r.right_id, r.score)
        for r in greedy_one_to_one(_df(spark, rows)).collect()
    )
    assert got == _python_greedy(rows)
    assert got == _python_iterated_mutual(rows)


def test_greedy_matches_python_reference_with_ties(spark):
    rows = [
        (1, 2, 0.5),
        (1, 3, 0.5),
        (2, 3, 0.5),
        (4, 5, 0.5),
        (3, 4, 0.5),
    ]
    got = sorted(
        (r.left_id, r.right_id, r.score)
        for r in greedy_one_to_one(_df(spark, rows)).collect()
    )
    assert got == _python_iterated_mutual(rows)
    # result is a valid matching
    seen = set()
    for l, r, _ in got:
        assert l not in seen and r not in seen
        seen.update((l, r))


def test_greedy_is_maximal(spark):
    rows = [(i, i + 1, 1.0 / (i + 1)) for i in range(1, 30)]
    got = greedy_one_to_one(_df(spark, rows)).collect()
    matched = {r.left_id for r in got} | {r.right_id for r in got}
    # maximality: every input pair touches a matched node
    for l, r, _ in rows:
        assert l in matched or r in matched


def test_empty_pairs(spark):
    got = greedy_one_to_one(_df(spark, []).limit(0)).collect()
    assert got == []
    got = mutual_best_matches(_df(spark, []).limit(0)).collect()
    assert got == []


def test_banded_duplicate_pairs_band_boundary(spark):
    import datetime

    from pyspark.sql import Row

    from entity_resolution_spark.operators.matching import banded_duplicate_pairs

    d = datetime.datetime(2020, 1, 1)

    def row(i, k, amt, days):
        return Row(id=i, k=k, amt=amt, ts=d + datetime.timedelta(days=days))

    rows = [
        # amounts straddle the eps=10 band boundary (9.9 apart across bands)
        row(1, 1, 15.0, 0),
        row(2, 1, 24.9, 1),
        # equal amounts but 400 days apart -> time predicate rejects
        row(3, 1, 15.0, 400),
        # within eps only via band-1 neighbor replication (29.0 vs 24.9)
        row(4, 1, 29.0, 2),
        # different key, identical otherwise -> never paired
        row(5, 2, 15.0, 0),
    ]
    df = spark.createDataFrame(rows).repartition(3)
    got = {
        (r["left_id"], r["right_id"])
        for r in banded_duplicate_pairs(
            df, "k", "id", "amt", "ts", amount_eps=10.0, max_days=180
        ).collect()
    }
    assert got == {(1, 2), (2, 4)}  # (1,4): 14.0 apart > eps; (1,3)/(2,3): time

    import pytest

    with pytest.raises(ValueError):
        banded_duplicate_pairs(df, "k", "id", "amt", "ts", 0.0, 10)
