#!/usr/bin/env python
"""Record-linkage walkthrough: the classic ER stack end to end, every
stage a first-class operator with a DuckDB value-hash oracle in the
driver contract (COVERAGE.md).

  1. blocking      two complementary schemes — sorted-neighborhood over a
                   normalized text prefix, and token blocking pruned by
                   meta-blocking WNP (keep edges that beat their
                   endpoints' mean weight)
  2. comparison    gamma agreement vectors over the union of candidates
  3. model         Fellegi-Sunter EM — m/u/lambda fitted unsupervised over
                   the bounded pattern census, scored as a pure literal
                   expression (log2 match weight + posterior)
  4. clustering    connected components over high-posterior edges
  5. golden record field-level survivorship (modal lang/source, longest
                   text, max n_chars) per entity cluster
  6. review       uncertainty-sampled labeling batch (pairs nearest
                   posterior 0.5) + per-field waterfall explanation of
                   the top match

Run:  python examples/record_linkage.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entity_resolution_spark import get_spark
from entity_resolution_spark.operators.blocking import sorted_neighborhood_pairs
from entity_resolution_spark.operators.clustering import connected_components
from entity_resolution_spark.operators.linkage import (
    comparison_vectors,
    fs_score,
    fs_train,
)
from entity_resolution_spark.operators.metablocking import (
    meta_blocking_wnp,
    shingle_postings,
)
from entity_resolution_spark.operators.survivorship import golden_records

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. blocking: union of SNM neighbours and WNP-surviving graph edges
    snm = sorted_neighborhood_pairs(
        docs.withColumn(
            "sort_key",
            F.substring(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), 1, 40),
        ),
        ["sort_key"],
        window=10,
    ).select("left_id", "right_id")
    wnp = meta_blocking_wnp(shingle_postings(docs, n=3), max_block_size=1000)
    cand = snm.unionByName(wnp.select("left_id", "right_id")).distinct()
    print(f"candidates: snm={snm.count()} wnp={wnp.count()} union={cand.count()}")

    # 2-3. comparison vectors -> EM-fitted Fellegi-Sunter scores
    vec = comparison_vectors(
        cand,
        docs,
        {
            "g_lang": "lang",
            "g_source": "source",
            "g_len": ("n_chars", lambda l, r: F.floor(l / 100).eqNullSafe(F.floor(r / 100))),
            "g_pfx": (
                "text",
                lambda l, r: F.substring(F.lower(l), 1, 24).eqNullSafe(
                    F.substring(F.lower(r), 1, 24)
                ),
            ),
        },
    )
    gammas = ["g_lang", "g_source", "g_len", "g_pfx"]
    model = fs_train(vec, gammas, iters=8)
    print(f"fitted: lambda={model.lam:.4f} m={model.m} u={model.u}")
    scored = fs_score(vec, model)

    # 4. entity clusters from confident edges
    edges = scored.where(F.col("posterior") >= 0.9)
    print(f"edges kept at posterior>=0.9: {edges.count()}")
    asg = connected_components(
        edges.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    ).select(F.col("file_id").alias("doc_id"), "cluster_id")

    # 5. one golden record per entity
    golden = golden_records(
        asg,
        docs,
        {"lang": "majority", "source": "majority", "text": "longest", "n_chars": "max"},
    )
    print(f"entities: {golden.count()}")
    golden.orderBy("cluster_id").show(5, truncate=60)

    # 6. the human-in-the-loop surfaces: what to label next, and why the
    #    top pair matched (additive per-field weight decomposition)
    from entity_resolution_spark.operators.linkage import fs_explain, review_queue

    print("label these next (nearest the decision boundary):")
    review_queue(scored, 5).select(
        "left_id", "right_id", "posterior", "margin"
    ).show()
    print("why the most confident pair matched:")
    top = scored.orderBy(F.desc("posterior"), "left_id", "right_id").limit(1)
    fs_explain(top, model).select(
        "left_id", "right_id", *[f"wt_{g}" for g in gammas], "wt_prior", "wt_total"
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
