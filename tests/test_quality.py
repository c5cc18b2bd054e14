"""Pairwise cluster-metrics operator (operators/quality.py)."""

from entity_resolution_spark.operators.quality import pairwise_cluster_metrics


def test_pairwise_metrics_hand_computed(spark):
    pred = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40), (5, 40)], "file_id long, cluster_id long"
    )
    truth = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 30), (4, 40), (5, 40)], "file_id long, cluster_id long"
    )
    r = pairwise_cluster_metrics(pred, truth).collect()[0]
    # pred co-pairs: C(3,2)+C(2,2) = 4; truth: 1+1 = 2; agreeing: {1,2},{4,5}
    assert (r.tp_pairs, r.pred_pairs, r.truth_pairs) == (2, 4, 2)
    assert r.pair_precision == 0.5 and r.pair_recall == 1.0
    assert abs(r.pair_f1 - 2 / 3) < 1e-5


def test_pairwise_metrics_all_singletons(spark):
    """No co-clustered pairs on either side: all counts 0, metrics 0 (not
    NaN/div-by-zero)."""
    pred = spark.createDataFrame([(i, i) for i in range(5)], "file_id long, cluster_id long")
    r = pairwise_cluster_metrics(pred, pred).collect()[0]
    assert (r.tp_pairs, r.pred_pairs, r.truth_pairs) == (0, 0, 0)
    assert r.pair_precision == 0.0 and r.pair_recall == 0.0 and r.pair_f1 == 0.0


def test_pairwise_metrics_identical_clusterings(spark):
    pred = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "file_id long, cluster_id long"
    )
    r = pairwise_cluster_metrics(pred, pred).collect()[0]
    assert r.pair_f1 == 1.0 and r.tp_pairs == 3


def test_blocking_quality_hand_computed(spark):
    """4 records, truth {1,2},{3,4}; blocking puts 1,2,3 together and 4
    alone: comparisons=C(3,2)=3, covered true pairs={(1,2)}, RR=1-3/6."""
    from entity_resolution_spark.operators.quality import blocking_quality

    blocks = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")], "doc_id long, block_key string"
    )
    truth = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y")], "doc_id long, cluster_id string"
    )
    r = blocking_quality(blocks, truth).collect()[0]
    assert r["n_records"] == 4 and r["total_pairs"] == 6
    assert r["comparisons"] == 3 and r["truth_pairs"] == 2
    assert r["covered_true_pairs"] == 1
    assert abs(r["reduction_ratio"] - 0.5) < 1e-9
    assert abs(r["pair_completeness"] - 0.5) < 1e-9
    assert abs(r["pair_quality"] - 1 / 3) < 1e-6  # round-6 emitted value


def test_blocking_quality_multi_block_pair_counted_once(spark):
    """A true pair sharing TWO blocks counts once in covered_true_pairs,
    while comparisons charges each block separately (the cost metric)."""
    from entity_resolution_spark.operators.quality import blocking_quality

    blocks = spark.createDataFrame(
        [(1, "a"), (2, "a"), (1, "b"), (2, "b")], "doc_id long, block_key string"
    )
    truth = spark.createDataFrame(
        [(1, "x"), (2, "x")], "doc_id long, cluster_id string"
    )
    r = blocking_quality(blocks, truth).collect()[0]
    assert r["comparisons"] == 2  # one per block
    assert r["covered_true_pairs"] == 1  # deduped
    assert r["pair_completeness"] == 1.0


def test_blocking_quality_empty_blocks(spark):
    """No blocking at all: zero comparisons, RR=1, completeness 0."""
    from entity_resolution_spark.operators.quality import blocking_quality

    blocks = spark.createDataFrame([], "doc_id long, block_key string")
    truth = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, cluster_id string"
    )
    r = blocking_quality(blocks, truth).collect()[0]
    assert r["comparisons"] == 0 and r["covered_true_pairs"] == 0
    assert r["reduction_ratio"] == 1.0 and r["pair_completeness"] == 0.0


def _ext_metrics_reference(pairs):
    """Independent pure-python B-cubed/NMI/ARI over (pred, truth) labels."""
    import math
    from collections import Counter

    n = len(pairs)
    cont = Counter(pairs)
    a = Counter(p for p, _ in pairs)
    b = Counter(t for _, t in pairs)
    bp = sum(c * c / a[p] for (p, _), c in cont.items()) / n
    br = sum(c * c / b[t] for (_, t), c in cont.items()) / n
    bf = 2 * bp * br / (bp + br) if bp + br else 0.0
    hp = -sum(x / n * math.log(x / n) for x in a.values())
    ht = -sum(x / n * math.log(x / n) for x in b.values())
    mi = sum(
        c / n * math.log(n * c / (a[p] * b[t])) for (p, t), c in cont.items()
    )
    nmi = mi / math.sqrt(hp * ht) if hp > 0 and ht > 0 else 0.0
    c2 = lambda x: x * (x - 1) // 2
    s = sum(c2(c) for c in cont.values())
    sp, st = sum(c2(x) for x in a.values()), sum(c2(x) for x in b.values())
    tp = c2(n)
    exp, mx = sp * st / tp, (sp + st) / 2
    ari = (s - exp) / (mx - exp) if mx != exp else 1.0
    return {
        "bcubed_precision": round(bp, 6),
        "bcubed_recall": round(br, 6),
        "bcubed_f1": round(bf, 6),
        "nmi": round(nmi, 6),
        "ari": round(ari, 6),
    }


def test_extended_cluster_metrics_matches_reference(spark):
    from entity_resolution_spark.operators.quality import extended_cluster_metrics

    labels = [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (2, "y"), (3, "z")]
    pred = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(labels)], "file_id long, cluster_id long"
    )
    truth = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(labels)], "file_id long, cluster_id string"
    )
    r = extended_cluster_metrics(pred, truth).collect()[0]
    want = _ext_metrics_reference(labels)
    assert r["n_items"] == len(labels)
    for k, v in want.items():
        assert abs(r[k] - v) < 2e-6, (k, r[k], v)


def test_extended_cluster_metrics_identical_clusterings(spark):
    from entity_resolution_spark.operators.quality import extended_cluster_metrics

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(12)], "file_id long, cluster_id long"
    )
    r = extended_cluster_metrics(df, df).collect()[0]
    assert r["bcubed_precision"] == 1.0 and r["bcubed_recall"] == 1.0
    assert r["bcubed_f1"] == 1.0 and r["nmi"] == 1.0 and r["ari"] == 1.0


def test_k_anonymity_report_flags_and_null_sensitive(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.privacy import k_anonymity_report

    rows = (
        [Row(zip="111", age=30, dx=d) for d in ("a", "b", "a")]
        + [Row(zip="222", age=40, dx=None), Row(zip="222", age=40, dx="c")]
        + [Row(zip="333", age=50, dx="a")]
    )
    df = spark.createDataFrame(rows)
    got = {
        (r["zip"], r["age"]): (
            r["group_size"],
            r["n_sensitive"],
            r["k_anonymous"],
            r["l_diverse"],
        )
        for r in k_anonymity_report(
            df, ["zip", "age"], k=2, sensitive_col="dx", l=2
        ).collect()
    }
    assert got[("111", 30)] == (3, 2, True, True)
    # NULL counts as one distinct sensitive value
    assert got[("222", 40)] == (2, 2, True, True)
    assert got[("333", 50)] == (1, 1, False, False)


def test_k_anonymity_summary_and_validation(spark):
    import pytest
    from pyspark.sql import Row

    from entity_resolution_spark.operators.privacy import (
        k_anonymity_report,
        k_anonymity_summary,
    )

    df = spark.createDataFrame(
        [Row(g="x")] * 5 + [Row(g="y")] * 2 + [Row(g="z")]
    )
    r = k_anonymity_summary(df, ["g"], k=3).collect()[0]
    assert r["n_records"] == 8 and r["n_groups"] == 3
    assert r["n_violating_groups"] == 2 and r["records_at_risk"] == 3
    assert r["min_group_size"] == 1 and r["risk_fraction"] == 0.375
    with pytest.raises(ValueError):
        k_anonymity_report(df, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["g"], k=2, sensitive_col="g")
