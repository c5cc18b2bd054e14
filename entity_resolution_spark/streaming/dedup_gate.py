"""Streaming ingestion dedup gate: admit only novel documents.

The production front door of a training corpus: crawl drops arrive as a
stream, each micro-batch is (1) near-dedup'd WITHIN itself (CC over
MinHash pairs, keep the component-min representative — the curation
convention), (2) probed against the STANDING corpus's persisted MinHash
sketches (operators/cross_corpus.py), and (3) only the novel survivors
are appended to the corpus state. The standing corpus is never re-read
as text and never re-sketched — state is sketch deltas, so every fold is
delta-proportional (the same property as plans/incremental.py).

State layout (same ``_SUCCESS``-gated versioned-dirs convention as
streaming/continuous.py):

    state_dir/v{batch_id}/accepted/   novel rows of this batch (parquet)
    state_dir/v{batch_id}/sketches/   their (id, sig, bands) sketches

The corpus at any time = union of all committed ``accepted`` deltas;
the reference sketch table = union of all committed ``sketches`` deltas.
Exactly-once file accounting comes from the stream checkpoint; a replayed
batch rewrites the same version (idempotent).

Empty/whitespace-only documents carry no sketch (sentinel exclusion) and
pass the gate unexamined — exact dedup of empties is the exact-sha
path's job, not the near-dup gate's.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.minhash import MinHashConfig
from ..operators.cross_corpus import cross_corpus_minhash_pairs, sketch_documents

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)


def _committed_versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        m = re.fullmatch(r"v(\d+)", name)
        if m and all(
            os.path.exists(os.path.join(state_dir, name, sub, "_SUCCESS"))
            for sub in ("accepted", "sketches")
        ):
            out.append(int(m.group(1)))
    return sorted(out)


def accepted_corpus(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Every document admitted so far (union of committed deltas)."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(
        *[os.path.join(state_dir, f"v{v}", "accepted") for v in vs]
    )


def corpus_sketches(spark: SparkSession, state_dir: str) -> DataFrame | None:
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(
        *[os.path.join(state_dir, f"v{v}", "sketches") for v in vs]
    )


def _batch_representatives(
    batch: DataFrame,
    cfg: MinHashConfig,
    id_col: str,
    text_col: str,
    min_jaccard: float,
) -> DataFrame:
    """Within-batch near-dedup: CC over the batch's MinHash pairs, keep the
    component-min doc (every singleton keeps itself)."""
    from ..operators.clustering import connected_components
    from ..operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(batch, cfg, id_col, text_col, min_jaccard)
    comp = connected_components(pairs)  # (file_id, cluster_id=component min)
    dropped = comp.filter(F.col("file_id") != F.col("cluster_id")).select(
        F.col("file_id").alias(id_col)
    )
    # batches are delta-sized; the drop set is smaller still
    return batch.join(F.broadcast(dropped), id_col, "left_anti")


def run_dedup_gate(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cfg: MinHashConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.7,
) -> None:
    """Process every file currently in ``input_dir`` (Trigger.AvailableNow),
    admitting only documents novel w.r.t. both their own batch and the
    standing corpus."""
    cfg = cfg or MinHashConfig()

    # vanilla sessions must ship the package zip before any sketch UDF is
    # created (PySpark snapshots python-includes at UDF creation time)
    from ..session import ensure_py_files

    ensure_py_files(spark)

    def gate(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.drop("event_time").localCheckpoint(eager=True)
        reps = _batch_representatives(batch, cfg, id_col, text_col, min_jaccard)
        rep_sk = sketch_documents(reps, cfg, id_col, text_col).localCheckpoint(
            eager=True
        )

        prior_sk = corpus_sketches(spark, state_dir)
        if prior_sk is None:
            novel, novel_sk = reps, rep_sk
        else:
            matched = (
                cross_corpus_minhash_pairs(
                    None,
                    None,
                    cfg,
                    id_col,
                    text_col,
                    min_jaccard,
                    new_sketches=rep_sk,
                    ref_sketches=prior_sk,
                )
                .select(F.col("new_id").alias(id_col))
                .distinct()
            )
            novel = reps.join(F.broadcast(matched), id_col, "left_anti")
            novel_sk = rep_sk.join(
                F.broadcast(matched.withColumnRenamed(id_col, "id")), "id", "left_anti"
            )

        base = os.path.join(state_dir, f"v{batch_id}")
        novel.write.mode("overwrite").parquet(os.path.join(base, "accepted"))
        novel_sk.write.mode("overwrite").parquet(os.path.join(base, "sketches"))

    q = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
