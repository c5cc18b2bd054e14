"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _docs_as_repo_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's documents table to the engine's repo_files shape
    (BASELINE.json:input_hint): doc corpus rows become 'files'."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("file_id"),
        F.col("source").alias("repo"),
        F.concat_ws("/", F.col("source"), F.concat(F.col("doc_id").cast("string"), F.lit(".txt"))).alias("path"),
        F.sha2(F.col("doc_id").cast("string").cast("binary"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full record-linkage pipeline (blocking -> scoring ->
    clustering) over sf0.001 documents; returns per-cluster summary."""
    from entity_resolution_spark.config import PipelineConfig
    from entity_resolution_spark.plans.pipeline import resolve
    from entity_resolution_spark.session import ensure_py_files

    ensure_py_files(spark)
    files = _docs_as_repo_files(spark, "/root/testdata/sf0.001")
    res = resolve(files, PipelineConfig())
    return (
        res.clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"), F.min("file_id").alias("min_file_id"))
        .orderBy(F.desc("cluster_size"), "cluster_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (filled in as
    operators land; see entity_resolution_spark/queries.py)."""
    from entity_resolution_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from entity_resolution_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
