"""Record retraction with delta-proportional cluster repair.

The lifecycle gap between ``resolve()`` (batch) and ``resolve_incremental``
(additive folds): DELETING records — right-to-be-forgotten requests,
takedowns, licensing revocations — without re-resolving the corpus. A full
re-run per deletion batch is the same O(corpus) cost the incremental plan
exists to avoid; this plan repairs only what a deletion can actually
change:

- clusters not containing a deleted row keep their assignment verbatim
  (connected components are closed under removing rows outside them);
- within affected clusters, the surviving evidence is REPLAYED, not
  re-scored: matched pairs from the prior scored lineage whose endpoints
  both survive, plus exact-duplicate star edges recomputed among the
  survivors' sha groups — connected components over this delta-bounded
  edge set re-closes the affected clusters (they can split into several);
- the one genuinely new piece of evidence a deletion creates: when a
  deleted row was its sha group's REPRESENTATIVE, the surviving minimum
  becomes the new representative and its pairwise evidence has never been
  scored (non-representatives skip scoring by design). Promoted
  representatives are folded back through ``resolve_incremental`` — the
  existing delta-proportional machinery — so they are scored against the
  full blocking index exactly as a batch run over the survivors would
  score them (a promoted row's basename/path features differ from its
  deleted representative's, so it can match rows the old representative
  did not).

Every control frame (deleted ids, affected clusters, promoted ids, member
sets) is bounded by the deletion batch x cluster sizes and broadcast; the
corpus is scanned (column-pruned, semi-probed), never shuffled.

Equivalence: with no skew cap crossed, ``retract_and_repair`` produces
exactly the clusters of ``resolve(survivors)`` (asserted in
tests/test_incremental_resolve.py and by the driver oracle
``retract_repair_clusters`` — the batch SQL program over the surviving
rows). The same budget caveat as the incremental plan applies: deletion
shrinks blocks, so a batch re-run could re-admit pairs a prior fold's
per-block budget thinned; below the caps the two are identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.clustering import connected_components
from .incremental import IncrementalResult, resolve_incremental
from .pipeline import sha_group_key


@dataclass
class RetractionResult:
    features: DataFrame  # surviving features — reusable as the next prior
    clusters: DataFrame  # (file_id, cluster_id) over the survivors
    metrics: DataFrame  # (stage, metric, value)
    blocks: DataFrame | None = None  # surviving blocking index (if one was
    # passed in), with the fold's additions — the next prior_blocks


def retract_and_repair(
    prior_features: DataFrame,
    prior_clusters: DataFrame,
    prior_scored: DataFrame,
    deleted_ids: DataFrame,
    cfg: PipelineConfig | None = None,
    prior_blocks: DataFrame | None = None,
) -> RetractionResult:
    """Remove ``deleted_ids`` ((file_id) frame) from a prior resolution and
    repair only the affected clusters.

    prior_features / prior_clusters / prior_scored: ``ResolutionResult``'s
    ``.features`` / ``.clusters`` / ``.scored`` (or the StageStore's
    ``lineage`` table) from the previous run. prior_blocks optionally
    reuses the persisted blocking index; deleted entries are dropped from
    it so later folds can never match against retracted records.
    """
    cfg = cfg or PipelineConfig()
    spark = prior_features.sparkSession
    import time

    stage_secs: dict[str, float] = {}
    t0 = time.time()

    del_ids = deleted_ids.select("file_id").distinct().localCheckpoint(eager=True)
    n_deleted = del_ids.count()
    feat_surv = prior_features.join(F.broadcast(del_ids), "file_id", "left_anti")

    # --- promoted representatives -------------------------------------
    # sha groups that CONTAIN a deleted row are the only groups whose
    # representative can change; probe the corpus with the deleted rows'
    # digest keys (deletion-batch-bounded broadcast, corpus scanned only).
    del_keys = (
        prior_features.join(F.broadcast(del_ids), "file_id", "left_semi")
        .select(sha_group_key().alias("__sha_key"))
        .distinct()
    )
    aff_sha = prior_features.withColumn("__sha_key", sha_group_key()).join(
        F.broadcast(del_keys), "__sha_key"
    )
    old_rep = aff_sha.groupBy("__sha_key").agg(F.min("file_id").alias("old_rep"))
    surv_rep = (
        aff_sha.join(F.broadcast(del_ids), "file_id", "left_anti")
        .groupBy("__sha_key")
        .agg(F.min("file_id").alias("new_rep"))
    )
    promoted = (
        old_rep.join(
            F.broadcast(del_ids.withColumnRenamed("file_id", "old_rep")),
            "old_rep",
            "left_semi",
        )
        .join(surv_rep, "__sha_key")
        .select(F.col("new_rep").alias("file_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_promoted = promoted.count()
    stage_secs["promotion_census"] = round(time.time() - t0, 3)

    # --- phase A: retract + re-close affected clusters ----------------
    t0 = time.time()
    touched = del_ids.unionByName(promoted)
    aff_clusters = (
        prior_clusters.join(F.broadcast(touched), "file_id", "left_semi")
        .select("cluster_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    unchanged = prior_clusters.join(
        F.broadcast(aff_clusters), "cluster_id", "left_anti"
    )
    # surviving, non-promoted members of the affected clusters — the rows
    # whose assignment must be recomputed from surviving evidence
    members = (
        prior_clusters.join(F.broadcast(aff_clusters), "cluster_id", "left_semi")
        .join(F.broadcast(touched), "file_id", "left_anti")
        .select("file_id")
        .localCheckpoint(eager=True)
    )
    # replayed near evidence: prior matched pairs with both endpoints in
    # the member set (never re-scored — pair scores are pair-local)
    near = (
        prior_scored.filter(F.col("score") >= cfg.similarity_threshold)
        .join(
            F.broadcast(members.withColumnRenamed("file_id", "left_id")),
            "left_id",
            "left_semi",
        )
        .join(
            F.broadcast(members.withColumnRenamed("file_id", "right_id")),
            "right_id",
            "left_semi",
        )
        .select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    )
    # exact star edges among the surviving members' sha groups (interim
    # representative = min member; the promoted-rep fold below re-collapses
    # groups that gained their true new representative)
    mem_feat = feat_surv.join(F.broadcast(members), "file_id", "left_semi")
    mem_sha = mem_feat.withColumn("__sha_key", sha_group_key())
    mem_rep = mem_sha.groupBy("__sha_key").agg(F.min("file_id").alias("rep_id"))
    exact = (
        mem_sha.join(mem_rep.hint("shuffle_hash"), "__sha_key")
        .filter(F.col("file_id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("src"), F.col("file_id").alias("dst"))
    )
    edges = near.unionByName(exact).localCheckpoint(eager=True)
    components = connected_components(edges, cfg)
    singles = members.join(components, "file_id", "left_anti").select(
        "file_id", F.col("file_id").alias("cluster_id")
    )
    phase_a = unchanged.unionByName(components).unionByName(singles)
    stage_secs["retract_reclose"] = round(time.time() - t0, 3)

    blocks_surv = (
        prior_blocks.join(F.broadcast(touched), "file_id", "left_anti")
        if prior_blocks is not None
        else None
    )

    if n_promoted == 0:
        rows = [
            ("retraction", "deleted_rows", float(n_deleted)),
            ("retraction", "promoted_reps", 0.0),
            ("retraction", "affected_prior_clusters", float(aff_clusters.count())),
        ] + [(k, "seconds", float(v)) for k, v in stage_secs.items()]
        metrics = spark.createDataFrame(
            rows, "stage string, metric string, value double"
        )
        return RetractionResult(feat_surv, phase_a, metrics, blocks_surv)

    # --- phase B: fold promoted representatives back in ---------------
    # They are "new" to the scoring stage (non-representatives never
    # scored), so the additive incremental plan applies verbatim: prior =
    # survivors minus the promoted rows, delta = the promoted rows' raw
    # records. resolve_incremental re-collapses their sha groups (they are
    # each group's minimum survivor, so they become the representative),
    # blocks + scores them against the full index, and re-closes only the
    # components they touch.
    t0 = time.time()
    raw_cols = [
        c
        for c in ("repo", "path", "commit", "lang", "content", "file_id")
        if c in prior_features.columns
    ]
    promoted_files = prior_features.join(
        F.broadcast(promoted), "file_id", "left_semi"
    ).select(*raw_cols)
    prior_wo_promoted = feat_surv.join(
        F.broadcast(promoted), "file_id", "left_anti"
    )
    clusters_wo_promoted = phase_a.join(
        F.broadcast(promoted), "file_id", "left_anti"
    )
    fold: IncrementalResult = resolve_incremental(
        prior_wo_promoted,
        clusters_wo_promoted,
        promoted_files,
        cfg,
        prior_blocks=blocks_surv,
    )
    stage_secs["promotion_fold"] = round(time.time() - t0, 3)

    rows = [
        ("retraction", "deleted_rows", float(n_deleted)),
        ("retraction", "promoted_reps", float(n_promoted)),
        ("retraction", "affected_prior_clusters", float(aff_clusters.count())),
    ] + [(k, "seconds", float(v)) for k, v in stage_secs.items()]
    metrics = spark.createDataFrame(
        rows, "stage string, metric string, value double"
    ).unionByName(fold.metrics)
    return RetractionResult(fold.features, fold.clusters, metrics, fold.blocks)
