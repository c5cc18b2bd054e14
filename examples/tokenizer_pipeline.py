#!/usr/bin/env python
"""Tokenizer + shard-layout walkthrough: from raw documents to the
materialized training stream, on the driver's sf0.001 tables.

Stages (each a first-class operator with a DuckDB value-hash oracle in
the driver contract — see COVERAGE.md):

  1. vocabulary    corpus top-k census + OOV health check
  2. merges        BPE merge-candidate mining (tokenizer training input)
  3. encoding      words -> dense frequency-rank ids (unk for OOV)
  4. packing       every token placed into its fixed-length sequence
  5. balance       serpentine token-balanced shard layout (equal work)
  6. monitoring    embedding-distribution drift between two snapshots

Run:  python examples/tokenizer_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entity_resolution_spark import get_spark
from entity_resolution_spark.operators.kmeans import embedding_drift
from entity_resolution_spark.operators.sampling import balanced_shards
from entity_resolution_spark.operators.terms import top_vocabulary, vocab_coverage
from entity_resolution_spark.operators.tokenize import (
    bpe_pair_counts,
    encode_documents,
    pack_token_ids,
)
from entity_resolution_spark.session import ensure_py_files

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("tokenizer-pipeline", cores=8, shuffle_partitions=8)
    ensure_py_files(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # 1. vocabulary health
    vocab = top_vocabulary(docs, 1000)
    cov = vocab_coverage(docs, vocab=vocab)
    print("== OOV check ==")
    cov.agg(F.avg("oov_rate").alias("mean_oov_rate")).show()

    # 2. what a BPE trainer would merge first
    print("== top BPE merge candidates ==")
    bpe_pair_counts(docs, k=5).show()

    # 3-4. encode and pack the training stream
    packed = pack_token_ids(docs, seq_len=512, vocab_size=1000)
    print("== packed stream ==")
    packed.groupBy("seq_id").count().orderBy("seq_id").show(5)

    # 5. equal-work shards by document weight
    shards = balanced_shards(
        docs.select("doc_id", "n_chars"), weight_col="n_chars", n_shards=4
    )
    print("== shard balance (total chars per shard) ==")
    shards.groupBy("shard").agg(F.sum("weight").alias("chars")).orderBy("shard").show()

    # 6. would a second snapshot shift the embedding distribution?
    drift = embedding_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=8,
        iters=2,
    )
    print("== embedding drift (per k-means cell) ==")
    drift.orderBy(F.desc(F.abs(F.col("delta")))).show()
    spark.stop()


if __name__ == "__main__":
    main()
