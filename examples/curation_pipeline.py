#!/usr/bin/env python
"""Training-data curation walkthrough: the full chain from raw documents
to reproducible training shards, on the driver's sf0.001 tables.

Stages (each a first-class operator with a DuckDB value-hash oracle in
the driver contract — see COVERAGE.md):

  1. cleaning      corpus-level boilerplate removal (RefinedWeb-style)
  2. quality       bigram-LM perplexity (CCNet-style) + heuristic score
  3. dedup         fused curation (quality gate -> exact -> near-dup CC)
  4. ingest gate   streaming dedup of a second "crawl drop" against the
                   curated corpus's persisted sketches
  5. layout        leakage-safe splits -> seeded shuffle + shard coords

Run:  python examples/curation_pipeline.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entity_resolution_spark import get_spark
from entity_resolution_spark.functions.text import quality_score_col
from entity_resolution_spark.operators.boilerplate import remove_boilerplate_segments
from entity_resolution_spark.operators.curation import curate_corpus
from entity_resolution_spark.operators.lm import bigram_lm_cross_entropy
from entity_resolution_spark.operators.sampling import leakage_safe_split, shuffle_shards
from entity_resolution_spark.streaming.dedup_gate import accepted_corpus, run_dedup_gate

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark(app_name="curation_demo", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    print(f"raw corpus: {docs.count()} docs")

    # 1. corpus-level boilerplate removal
    cleaned = remove_boilerplate_segments(docs)
    print("boilerplate removal:")
    cleaned.agg(
        F.sum("n_removed").alias("segments_removed"),
        F.sum("n_segments").alias("segments_total"),
    ).show()

    # 2. quality signals: heuristic score + LM perplexity
    scored = (
        docs.select("doc_id", quality_score_col(F.col("text")).alias("quality"))
        .join(bigram_lm_cross_entropy(docs), "doc_id")
    )
    print("quality + perplexity (5 most anomalous docs):")
    scored.orderBy(F.desc("perplexity")).show(5)

    # 3. fused curation: quality gate -> exact collapse -> near-dup CC
    curated = curate_corpus(docs, min_quality=0.3, min_jaccard=0.6)
    print("curation statuses:")
    curated.groupBy("status").count().orderBy("status").show()

    # 4. streaming ingest gate: a second drop (the same corpus, re-keyed —
    #    a worst-case all-duplicate crawl) is almost entirely rejected
    base = tempfile.mkdtemp(prefix="curation_demo_")
    inp, state, ckpt = (os.path.join(base, d) for d in ("in", "state", "ckpt"))
    os.makedirs(inp)
    ts = F.timestamp_seconds(F.lit(1_700_000_000))
    first = docs.select("doc_id", "text", "source").withColumn("event_time", ts)
    first.repartition(1).write.mode("append").parquet(inp)
    run_dedup_gate(spark, inp, state, ckpt)
    redrop = first.withColumn("doc_id", F.col("doc_id") + 100_000)
    redrop.repartition(1).write.mode("append").parquet(inp)
    run_dedup_gate(spark, inp, state, ckpt)
    admitted = accepted_corpus(spark, state)
    n_new = admitted.filter(F.col("doc_id") >= 100_000).count()
    print(f"ingest gate: {admitted.count()} docs in corpus; "
          f"{n_new} of {docs.count()} re-dropped docs admitted (near-dups rejected)")

    # 5. leakage-safe splits + reproducible shard layout
    splits = leakage_safe_split(docs)
    layout = shuffle_shards(splits.filter(F.col("split") == "train"), n_shards=4)
    print("train-shard layout (first rows of shard 0):")
    layout.filter(F.col("shard") == 0).orderBy("pos").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
