"""Streaming vocabulary-growth monitor: HLL registers as streaming state.

The admission-control companion to `streaming/dedup_gate.py`: as crawl
drops arrive, maintain a HyperLogLog register file of the corpus's token
stream and emit a per-batch cardinality series. A flattening curve means
the new data adds no vocabulary (boilerplate / duplication); a jump means
genuinely new content (or encoding damage).

Why HLL is the right streaming state: the register file of a UNION of
datasets is the per-bucket MAX of the parts' register files
(`stats.hll_registers`), so the fold is

    state' = max-merge(state, registers(batch))     -- <= 2^p rows

exact (not approximate merging), idempotent under batch replay, and
O(2^p) per fold regardless of corpus size — the standing corpus is never
re-read, the same delta-proportional property as the dedup gate's sketch
state.

State layout (the ``_SUCCESS``-gated versioned-dirs convention of
streaming/continuous.py): ``state_dir/v{batch_id}/registers/`` holds the
MERGED register file as of that batch (tiny — at most 2^p rows), so the
current state is just the highest committed version. A replayed batch
rewrites its version from the previous state (idempotent).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.stats import hll_estimate, hll_registers
from .dedup_gate import DOC_STREAM_SCHEMA


def _committed_versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        m = re.fullmatch(r"v(\d+)", name)
        if m and os.path.exists(
            os.path.join(state_dir, name, "registers", "_SUCCESS")
        ):
            out.append(int(m.group(1)))
    return sorted(out)


def current_registers(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The merged (bucket, M) register file as of the latest committed
    version, or None before the first batch."""
    versions = _committed_versions(state_dir)
    if not versions:
        return None
    return spark.read.parquet(
        os.path.join(state_dir, f"v{versions[-1]}", "registers")
    )


def vocab_series(spark: SparkSession, state_dir: str, p: int = 12) -> DataFrame:
    """(version, estimate) — the cardinality time series across all
    committed versions (each version's register file re-estimated; the
    series is monotone non-decreasing by the max-merge property)."""
    rows = []
    for v in _committed_versions(state_dir):
        regs = spark.read.parquet(os.path.join(state_dir, f"v{v}", "registers"))
        est = hll_estimate(regs, p).collect()[0]["estimate"]
        rows.append((v, float(est)))
    return spark.createDataFrame(rows or [(None, None)], "version int, estimate double")


def run_vocab_monitor(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    p: int = 12,
    text_col: str = "text",
) -> None:
    """Process every file currently in ``input_dir`` (Trigger.AvailableNow),
    max-merging each micro-batch's token HLL registers into the standing
    state."""

    def fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        toks = batch_df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("val")
        )
        batch_regs = hll_registers(toks, "val", p)
        prior = current_registers(spark, state_dir)
        merged = (
            batch_regs
            if prior is None
            else prior.unionByName(batch_regs).groupBy("bucket").agg(
                F.max("M").alias("M")
            )
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}", "registers")
        )

    q = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
