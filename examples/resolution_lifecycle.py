#!/usr/bin/env python
"""Resolution lifecycle walkthrough: what happens to a standing
resolution AFTER the first batch run — the four delta-proportional verbs
(each equal to its batch counterpart, oracle-pinned in the driver
contract; COVERAGE.md):

  1. resolve       the initial batch run over the corpus
  2. fold          resolve_incremental: a new snapshot merged without
                   re-scoring the old corpus
  3. review        apply_review_decisions: clerical match / non_match
                   verdicts folded in as edge-level overrides
  4. retract       retract_and_repair: right-to-be-forgotten deletions
                   with promotion of new sha-group representatives
  5. re-threshold  rethreshold_clusters: a new similarity threshold
                   applied straight from the scored lineage

Run:  python examples/resolution_lifecycle.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entity_resolution_spark.config import PipelineConfig
from entity_resolution_spark.datagen import generate_repo_files
from entity_resolution_spark.plans.incremental import resolve_incremental
from entity_resolution_spark.plans.pipeline import resolve
from entity_resolution_spark.plans.rethreshold import rethreshold_clusters
from entity_resolution_spark.plans.retraction import retract_and_repair
from entity_resolution_spark.plans.reviews import apply_review_decisions
from entity_resolution_spark.session import get_spark


def n_clusters(clusters):
    return clusters.select("cluster_id").distinct().count()


def main() -> None:
    spark = get_spark("lifecycle-demo", cores=8, shuffle_partitions=8)
    cfg = PipelineConfig()

    # 1. initial batch resolution
    files = generate_repo_files(spark, 150).localCheckpoint()
    res = resolve(files, cfg)
    print(f"[resolve]      rows={files.count()}  clusters={n_clusters(res.clusters)}")

    # 2. fold a near-duplicate snapshot delta (no old-vs-old re-scoring)
    delta = (
        files.filter(F.pmod(F.col("file_id"), F.lit(20)) == 0)
        .withColumn("file_id", F.col("file_id") + F.lit(10_000_000))
        .withColumn("path", F.concat(F.col("path"), F.lit(".mirror")))
    )
    inc = resolve_incremental(res.features, res.clusters, delta, cfg)
    print(f"[fold]         +{delta.count()} rows  clusters={n_clusters(inc.clusters)}")

    # 3. clerical review: sever one matched pair, link two singletons
    some_match = (
        inc.scored.filter(F.col("score") >= cfg.similarity_threshold)
        .orderBy("left_id", "right_id")
        .limit(1)
        .select("left_id", "right_id")
        .collect()
    )
    decisions = [(int(r["left_id"]), int(r["right_id"]), "non_match") for r in some_match]
    ids = sorted(r["file_id"] for r in inc.clusters.limit(4).collect())
    decisions.append((ids[0], ids[1], "match"))
    rev = apply_review_decisions(
        inc.features,
        inc.clusters,
        inc.scored,
        spark.createDataFrame(decisions, "left_id long, right_id long, decision string"),
        cfg,
    )
    print(f"[review]       {len(decisions)} verdicts  clusters={n_clusters(rev.clusters)}")

    # 4. retract a deletion batch (includes sha-rep promotion cases)
    deleted = inc.features.filter(F.pmod(F.col("file_id"), F.lit(17)) == 0).select(
        "file_id"
    )
    ret = retract_and_repair(
        inc.features, rev.clusters, inc.scored, deleted, cfg
    )
    print(f"[retract]      -{deleted.count()} rows  clusters={n_clusters(ret.clusters)}")

    # 5. re-threshold the ORIGINAL run's lineage down to 70 (re-scores
    # only the suspect pairs the old bound rejected)
    rt = rethreshold_clusters(res.features, res.scored, 70, cfg)
    rescored = rt.metrics.filter(
        "stage = 'rethreshold' AND metric = 'rescored_pairs'"
    ).collect()[0]["value"]
    print(
        f"[re-threshold] 80 -> 70  rescored={int(rescored)} pairs  "
        f"clusters={n_clusters(rt.clusters)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
