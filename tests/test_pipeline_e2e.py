"""End-to-end gates (SURVEY.md §5.2 item 2): pairwise F1 >= 0.99 on labeled
pairs at the shared blocking key, the content_sha256 per-row invariant, and
blocking recall (every labeled positive shares >= 1 candidate block)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.config import PipelineConfig
from entity_resolution_spark.datagen import generate_labeled_pairs, generate_repo_files
from entity_resolution_spark.operators.blocking import (
    exploded_blocks,
    with_block_keys,
    with_features,
)
from entity_resolution_spark.plans.pipeline import resolve

N_GROUPS = 120


@pytest.fixture(scope="module")
def result(spark):
    files = generate_repo_files(spark, N_GROUPS)
    return resolve(files, PipelineConfig())


@pytest.fixture(scope="module")
def labeled(spark):
    return generate_labeled_pairs(spark, N_GROUPS)


def test_sha256_invariant(spark, result):
    """Engine-derived content_sha256 == hashlib.sha256(content) per row."""
    sample = result.features.select("content", "content_sha256").limit(50).collect()
    assert len(sample) > 0
    for r in sample:
        assert (
            hashlib.sha256(r.content.encode("utf-8")).hexdigest() == r.content_sha256
        )
    # and none null, all 64 hex, full-frame check JVM-side
    bad = result.features.filter(
        ~F.col("content_sha256").rlike("^[0-9a-f]{64}$")
    ).count()
    assert bad == 0


def test_blocking_recall_labeled_pairs(spark, labeled):
    """Every labeled positive must share >= 1 blocking key (a missed block is
    an unrecoverable false negative — SURVEY.md §7.3)."""
    files = generate_repo_files(spark, N_GROUPS)
    keyed = with_block_keys(with_features(files))
    blocks = exploded_blocks(keyed)
    a = blocks.select(F.col("block_key"), F.col("file_id").alias("left_id"))
    b = blocks.select(F.col("block_key"), F.col("file_id").alias("right_id"))
    covered = a.join(b, "block_key").select("left_id", "right_id").distinct()
    pos = labeled.filter("is_match")
    missed = pos.join(covered, ["left_id", "right_id"], "left_anti").count()
    assert missed == 0


def test_pairwise_f1(result, labeled):
    """The headline gate: F1 >= 0.99 (BASELINE.json metric)."""
    clusters = result.clusters
    lc = clusters.withColumnRenamed("file_id", "left_id").withColumnRenamed(
        "cluster_id", "left_cluster"
    )
    rc = clusters.withColumnRenamed("file_id", "right_id").withColumnRenamed(
        "cluster_id", "right_cluster"
    )
    joined = labeled.join(lc, "left_id").join(rc, "right_id")
    agg = joined.agg(
        F.sum((F.col("is_match") & (F.col("left_cluster") == F.col("right_cluster"))).cast("long")).alias("tp"),
        F.sum(((~F.col("is_match")) & (F.col("left_cluster") == F.col("right_cluster"))).cast("long")).alias("fp"),
        F.sum((F.col("is_match") & (F.col("left_cluster") != F.col("right_cluster"))).cast("long")).alias("fn"),
        F.count("*").alias("n"),
    ).collect()[0]
    n_labeled = labeled.count()
    assert agg["n"] == n_labeled  # every labeled id resolved to a cluster
    f1 = 2 * agg["tp"] / (2 * agg["tp"] + agg["fp"] + agg["fn"])
    assert f1 >= 0.99, dict(agg.asDict())


def test_metrics_emitted(result):
    m = {(r.stage, r.metric): r.value for r in result.metrics.collect()}
    assert m[("input", "rows")] > 0
    assert m[("candidates", "pairs")] > 0
    assert m[("scoring", "matched_pairs")] > 0
    assert m[("clustering", "clusters")] > 0
    # observability rows: compiled-kernel probe and the eager phase-1 fill
    # (build-time work the stage timers alone would miss)
    assert m[("scoring", "native_kernel")] in (0.0, 1.0)
    assert m[("scoring_p1_fill", "seconds")] >= 0.0
    assert result.dropped_keys.count() == 0  # no stop-keys at this scale


def test_cluster_determinism(spark, result):
    """Same input, different parallelism -> identical clusters (scaling
    correctness precondition for the local[8]/local[32] evidence)."""
    files = generate_repo_files(spark, N_GROUPS).repartition(13)
    again = resolve(files, PipelineConfig())
    a = result.clusters.orderBy("file_id").collect()
    b = again.clusters.orderBy("file_id").collect()
    assert a == b


def test_missing_file_id_fallback_is_deterministic(spark):
    """A frame WITHOUT file_id gets a deterministic content-address id:
    resolving twice under different partitioning must give identical
    clusters (round-1 verdict: monotonically_increasing_id made
    cluster_id = min(file_id) partition-dependent)."""
    base = generate_repo_files(spark, 40).drop("file_id")
    r1 = resolve(base.repartition(3), PipelineConfig())
    r2 = resolve(base.repartition(17), PipelineConfig())
    key = ["repo", "path", "commit"]
    a = {tuple(r[k] for k in key): r.cluster_id
         for r in r1.clusters.join(r1.features.select("file_id", *key), "file_id").collect()}
    b = {tuple(r[k] for k in key): r.cluster_id
         for r in r2.clusters.join(r2.features.select("file_id", *key), "file_id").collect()}
    assert a == b and len(a) > 0


def test_resolve_rejects_wrong_shape_with_complete_report(spark):
    """A frame missing identity columns fails fast with ALL problems named
    (P4 semantics), not an unresolved-column error deep inside the plan —
    previously a frame with no repo/path/commit crashed on a zero-arg
    xxhash64."""
    from entity_resolution_spark.sources.readers import SchemaValidationError

    df = spark.createDataFrame(
        [("py", "print(1)\n" * 20)], "lang string, content string"
    )
    with pytest.raises(SchemaValidationError) as exc:
        resolve(df, PipelineConfig())
    msg = str(exc.value)
    for col in ("repo", "path", "commit"):
        assert col in msg
