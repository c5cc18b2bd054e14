#!/usr/bin/env python
"""Corpus-admission walkthrough: decide whether a new crawl snapshot is
safe to fold into a standing training corpus, using the engine-portable
sketch suite + quality diagnostics — every stage a first-class operator
with a DuckDB value-hash oracle in the driver contract (COVERAGE.md).

Stages:

  1. cardinality   HyperLogLog vocabulary estimate of the new snapshot
                   (is the vocab growing, or is this boilerplate?)
  2. zipf          Zipf-law fit — natural text slopes near -1; synthetic
                   or template-flooded corpora drift off
  3. quality       the seven Gopher/MassiveWeb rules, pass rate per source
  4. blocklist     Bloom-filter probe against a banned-digest set
                   (no false negatives; broadcast join, no corpus shuffle)
  5. overlap       MinHash UNION sketches: content overlap of the new
                   snapshot's sources vs the standing corpus's — no
                   document pairing
  6. retrieval     BM25 spot-check that indexing-critical queries still
                   retrieve sensible documents
  7. admission     Efraimidis-Spirakis weighted sample of admitted docs,
                   laid out with the padding-minimizing batch layout

Run:  python examples/corpus_admission.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entity_resolution_spark import get_spark
from entity_resolution_spark.functions.text import gopher_rules_cols
from entity_resolution_spark.operators.bloom import bloom_build, bloom_probe
from entity_resolution_spark.operators.cross_corpus import source_sketch_similarity
from entity_resolution_spark.operators.sampling import (
    batch_by_length,
    padding_stats,
    weighted_sample,
)
from entity_resolution_spark.operators.stats import hll_count_distinct, zipf_fit
from entity_resolution_spark.operators.terms import bm25_topk
from entity_resolution_spark.session import ensure_py_files

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("corpus-admission", cores=8, shuffle_partitions=8)
    ensure_py_files(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # "new snapshot" = half the sources; "standing corpus" = the rest
    new = docs.filter(F.col("source") >= "src10")
    standing = docs.filter(F.col("source") < "src10")

    # 1. vocabulary cardinality (HLL, bit-identical registers anywhere)
    toks = new.select(
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias("val")
    )
    hll = hll_count_distinct(toks, "val").collect()[0]
    print(f"1. HLL vocab estimate: {hll['estimate']:.1f} "
          f"({hll['nonzero_buckets']} buckets live)")

    # 2. Zipf health
    z = zipf_fit(new).collect()[0]
    print(f"2. Zipf slope {z['zipf_slope']} r2 {z['zipf_r2']} "
          f"over {z['n_types']} types / {z['n_tokens']} tokens")

    # 3. Gopher pass rate per source
    cols = gopher_rules_cols(F.col("text"))
    flags = new.select("source", *[c.alias(k) for k, c in cols.items()])
    rate = (
        flags.groupBy("source")
        .agg(F.round(F.avg("passes_gopher"), 3).alias("pass_rate"))
        .orderBy("source")
    )
    print("3. Gopher pass rate (first 5 sources):")
    rate.show(5, truncate=False)

    # 4. Bloom blocklist probe (banned = standing corpus digests, demo)
    banned = standing.select(F.sha2(F.col("text"), 256).alias("digest")).limit(50)
    bloom = bloom_build(banned, "digest")
    probed = bloom_probe(
        new.select("doc_id", F.sha2(F.col("text"), 256).alias("digest")),
        bloom,
        "digest",
    )
    n_blocked = probed.filter(F.col("member") == 1).count()
    print(f"4. Bloom blocklist: {n_blocked} of {new.count()} docs flagged")

    # 5. cross-source content overlap by sketch union algebra
    both = standing.union(new)
    overlap = source_sketch_similarity(both)
    print("5. Highest-overlap source pairs:")
    overlap.orderBy(F.desc("est_jaccard")).show(5, truncate=False)

    # 6. retrieval spot-check
    hits = bm25_topk(new, [("q", "customer slow join")], k=3)
    print("6. BM25 top-3 for 'customer slow join':")
    hits.show(truncate=False)

    # 7. admitted sample + padding-efficient layout
    admitted = probed.filter(F.col("member") == 0).join(new, ["doc_id"])
    sample = weighted_sample(admitted, k=100, weight_col="n_chars")
    layout = batch_by_length(
        sample.join(new.select("doc_id", "n_chars"), "doc_id"), batch_size=16
    )
    eff = padding_stats(layout).collect()[0]
    print(f"7. admitted sample of {sample.count()} docs -> "
          f"{eff['n_batches']} batches, padding efficiency {eff['efficiency']}")

    spark.stop()


if __name__ == "__main__":
    main()
