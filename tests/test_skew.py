"""Skew stress tests: exact-dup floods and hot basenames must not blow up
candidate generation (the 100 TB survival property, SURVEY.md §7.3 item 3)."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.config import PipelineConfig
from entity_resolution_spark.datagen import generate_repo_files
from entity_resolution_spark.plans.pipeline import resolve


def test_exact_dup_flood_stays_linear(spark):
    """3,000 copies of one file: naive blocking would make ~4.5M pairs; the
    sha collapse must keep candidates near the base corpus level."""
    base = generate_repo_files(spark, 40)
    flood = spark.range(3000).select(
        (F.col("id") + 1_000_000).alias("file_id"),
        F.lit("megacorp/boilerplate").alias("repo"),
        F.concat(F.lit("gen/copy_"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
        F.lpad(F.col("id").cast("string"), 40, "0").alias("commit"),
        F.lit("python").alias("lang"),
        F.lit("LICENSE = 'MIT'\n\ndef boilerplate():\n    return 42\n" * 20).alias("content"),
    )
    files = base.unionByName(flood)
    res = resolve(files, PipelineConfig())
    m = {(r.stage, r.metric): r.value for r in res.metrics.collect()}
    assert m[("input", "rows")] == base.count() + 3000
    # candidates stay at base-corpus scale (flood contributes ZERO pairs —
    # one representative survives the collapse)
    base_only = resolve(base, PipelineConfig())
    base_pairs = {(r.stage, r.metric): r.value for r in base_only.metrics.collect()}[
        ("candidates", "pairs")
    ]
    assert m[("candidates", "pairs")] <= base_pairs + 10
    # ...and the flood still resolves into ONE cluster of 3000
    sizes = (
        res.clusters.groupBy("cluster_id").count().filter(F.col("count") >= 3000).collect()
    )
    assert len(sizes) == 1 and sizes[0]["count"] == 3000


def test_blocking_metrics_emitted(spark):
    files = generate_repo_files(spark, 60)
    res = resolve(files, PipelineConfig())
    m = {(r.stage, r.metric): r.value for r in res.metrics.collect()}
    assert m[("blocking", "blocks")] > 0
    assert m[("blocking", "max_block_size")] >= 2
    assert m[("blocking", "dropped_keys")] == 0
    assert ("blocking", "p99_block_size") in m


def test_null_content_flood_stays_singletons(spark):
    """Rows with NULL content (bytes unavailable at scan time) must NOT merge
    with each other: unknown == unknown is not evidence of duplication. A
    shared NULL sha collapsing into one exact-dup group would fuse every
    content-less row in a 100 TB corpus into a single mega-cluster."""
    base = generate_repo_files(spark, 40)
    nulls = spark.range(500).select(
        (F.col("id") + 2_000_000).alias("file_id"),
        F.lit("megacorp/opaque").alias("repo"),
        F.concat(F.lit("blob/unknown_"), F.col("id").cast("string"), F.lit(".bin")).alias("path"),
        F.lpad(F.col("id").cast("string"), 40, "f").alias("commit"),
        F.lit("binary").alias("lang"),
        F.lit(None).cast("string").alias("content"),
    )
    files = base.unionByName(nulls)
    res = resolve(files, PipelineConfig())
    # the sha column itself stays NULL — the invariant is sha-of-content
    null_feat = res.features.filter(F.col("file_id") >= 2_000_000)
    assert null_feat.filter(F.col("content_sha256").isNotNull()).count() == 0
    # every null-content row resolves to its own cluster
    got = res.clusters.filter(F.col("file_id") >= 2_000_000)
    assert got.count() == 500
    assert got.select("cluster_id").distinct().count() == 500
    # and the base corpus still resolves (flood did not eat the pair budget)
    m = {(r.stage, r.metric): r.value for r in res.metrics.collect()}
    assert m[("input", "rows")] == base.count() + 500
