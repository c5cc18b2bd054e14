"""Streaming CDC apply: fold an arriving changelog into a versioned
materialized snapshot (the streaming MERGE / "upsert materialized view"
pattern Delta/Iceberg CDC feeds drive).

Each micro-batch runs operators/cdc.py's ``apply_changelog`` against the
newest committed snapshot — so every fold costs one delta-sized hash
aggregate plus an anti join against the standing snapshot, never a
rescan of history — and commits the result as ``v{batch_id}`` under the
state dir (``_SUCCESS``-gated, same resumable layout as
streaming/continuous.py). Folding batch-by-batch equals one batch apply
of the whole changelog whenever batch boundaries respect the per-key
``seq_cols`` order (file streams deliver in arrival order, so a
seq-ordered producer gets this for free); test_cdc_stream.py pins the
stream==batch equality across a two-batch split.
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import apply_changelog


def _committed_versions(state_dir: str) -> list[int]:
    # local-FS listing (the sandbox's case); a cluster deployment swaps
    # this for the Hadoop FileSystem API over the same layout
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        m = re.fullmatch(r"v(\d+)", name)
        if m and os.path.exists(os.path.join(state_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_snapshot(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The newest committed snapshot, or None before the first fold."""
    versions = _committed_versions(state_dir)
    if not versions:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v{versions[-1]}"))


def run_cdc_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    base: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain every changelog file currently in ``input_dir``
    (Trigger.AvailableNow), folding each micro-batch into the snapshot.
    The changelog schema is inferred from the parquet files on disk
    (schema-pinned streaming read); ``base`` seeds the first fold.
    """
    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        prior = latest_snapshot(spark, state_dir)
        state = prior if prior is not None else base
        new = apply_changelog(
            state, batch_df, key_cols, seq_cols, op_col=op_col, delete_op=delete_op
        )
        new.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
