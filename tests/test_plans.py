"""Physical-plan quality gates: the properties that make the 100 TB story
real must be visible in the plans, not just claimed (task brief: "explain
the plan and iterate until it's the plan you'd want")."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_and_projection_reach_parquet_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("value") >= 95.0)
        .select("event_id", "value")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan and "GreaterThanOrEqual(value,95.0)" in plan
    # column pruning: the scan reads exactly the projected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "event_id" in read_schema and "value" in read_schema
    assert "props" not in read_schema and "ts" not in read_schema


def test_scoring_joins_never_broadcast_the_corpus(spark):
    from entity_resolution_spark.config import PipelineConfig
    from entity_resolution_spark.datagen import generate_repo_files
    from entity_resolution_spark.operators.blocking import (
        exploded_blocks,
        with_block_keys,
        with_features,
    )
    from entity_resolution_spark.operators.candidates import candidate_pairs
    from entity_resolution_spark.operators.scoring import score_pairs

    cfg = PipelineConfig()
    feat = with_features(generate_repo_files(spark, 30), cfg)
    blocks = exploded_blocks(with_block_keys(feat, cfg))
    pairs = candidate_pairs(blocks, cfg)
    plan = _plan(score_pairs(pairs, feat, cfg))
    # the corpus-sized feature/content joins carry explicit shuffle_hash
    # hints; size estimates must never pick broadcast for them (observed
    # 2x anti-scaling when they did)
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_candidate_self_join_not_sort_merge(spark):
    from entity_resolution_spark.config import PipelineConfig
    from entity_resolution_spark.datagen import generate_repo_files
    from entity_resolution_spark.operators.blocking import (
        exploded_blocks,
        with_block_keys,
        with_features,
    )
    from entity_resolution_spark.operators.candidates import candidate_pairs

    cfg = PipelineConfig()
    feat = with_features(generate_repo_files(spark, 30), cfg)
    blocks = exploded_blocks(with_block_keys(feat, cfg))
    plan = _plan(candidate_pairs(blocks, cfg))
    assert "ShuffledHashJoin" in plan and "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
