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
