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
