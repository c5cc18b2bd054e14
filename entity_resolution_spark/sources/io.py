"""Stage-boundary persistence: checkpointed, resumable stage outputs.

North_rule: "resumable from checkpoint with per-partition lineage +
metrics". The reference claims caching but never implements it
(/root/reference/README.md:541-543 vs entity_resolution.py:312-318); here
every pipeline stage can write a parquet (Iceberg-shaped: same layout,
format pluggable) table and a restart reads the last complete stage instead
of recomputing (SURVEY.md §4.2 "resumability").

Completeness contract: Spark's own ``_SUCCESS`` marker — a stage directory
without it is an aborted write and is ignored (idempotent overwrite on
retry, no double-count).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageStore:
    """Parquet-backed stage checkpoint store rooted at ``base_dir``.

    ``format`` may be set to "iceberg" on clusters with the runtime jar; the
    sandbox uses plain parquet (graceful fallback, SURVEY.md §7.3 item 6).
    """

    def __init__(self, base_dir: str, fmt: str = "parquet"):
        self.base_dir = base_dir
        self.fmt = fmt

    def path(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self.path(stage), "_SUCCESS"))

    def write(self, stage: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite").format(self.fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(stage))

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.format(self.fmt).load(self.path(stage))

    def get_or_compute(
        self,
        spark: SparkSession,
        stage: str,
        compute,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Resume point: reuse a complete stage, else compute + persist.

        The write is idempotent (overwrite); a crash mid-write leaves no
        ``_SUCCESS`` so the next run recomputes — exactly-once stage
        semantics without a transaction log.
        """
        if self.is_complete(stage):
            return self.read(spark, stage)
        df = compute()
        self.write(stage, df, partition_by)
        return self.read(spark, stage)


def partition_metrics(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts for a stage — the lineage/metrics record the
    north_rule asks for. Cheap: one narrow pass, no shuffle."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"))
        .withColumn("stage", F.lit(stage))
        .select("stage", "partition_id", "rows")
    )
