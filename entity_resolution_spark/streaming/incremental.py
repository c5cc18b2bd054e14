"""Structured-Streaming incremental ingestion + dedup.

The reference has zero streaming semantics (SURVEY.md §2.9); this module is
the engine's forward-looking increment: new repo files arrive as parquet
drops, are feature-stamped (sha256) and exact-deduped within a watermark,
and appended to the features table that the batch pipeline (blocking ->
scoring -> clustering) consumes on its next resumable run. That split —
streaming for cheap per-row invariants, batch for the quadratic-ish stages
— is the standard production shape for 100 TB linkage.

Tested with the file source + ``Trigger.AvailableNow`` (bounded, exactly
the driver's local sandbox can run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)


def read_file_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def incremental_features(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stamp the per-row invariant and exact-dedup by content digest within
    the watermark window (late duplicates beyond it are dropped by state
    expiry — bounded state, the non-negotiable for an unbounded stream)."""
    return (
        stream.withColumn("content_sha256", F.sha2(F.col("content").cast("binary"), 256))
        .withWatermark("event_time", watermark)
        .dropDuplicates(["content_sha256"])
    )


def run_available_now(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """Process everything currently in input_dir exactly once and stop
    (Trigger.AvailableNow) — the resumable micro-batch used in tests and as
    the template for a continuous deployment."""
    feats = incremental_features(read_file_stream(spark, input_dir))
    q = (
        feats.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
