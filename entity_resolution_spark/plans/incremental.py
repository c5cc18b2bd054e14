"""Incremental record linkage: fold a batch of NEW files into an existing
resolution without re-scoring the old corpus.

The batch pipeline (plans/pipeline.py) is O(corpus) per run in its pairwise
stages; at 10^12 files the corpus grows by small deltas and a full re-run
per delta is the thing a production deployment cannot afford. This plan
exploits two closure properties of the batch design:

- connected-component membership is preserved by the (file_id, cluster_id)
  assignment, so prior matched edges can be replayed as O(n) *star edges*
  (cluster_id -> file_id) instead of being re-scored;
- blocking keys are per-row (content/path addressed, corpus-independent),
  so old rows keep their keys and only new-vs-(old ∪ new) pairs inside
  shared blocks need scoring — never old-vs-old.

Cost per increment is DELTA-PROPORTIONAL — the corpus is scanned
(column-pruned, broadcast-probed) but never shuffled:

- exact collapse runs only on sha groups containing a new digest (the
  increment's digest set broadcasts; the union is semi-probed);
- the old blocking index is semi-probed against the increment's key set
  (pass ``prior_blocks`` to reuse the persisted index; otherwise old keys
  are recomputed map-side — compute, not shuffle);
- scoring features are semi-probed down to actual pair members before the
  scoring joins, so the corpus light-feature frame never shuffles;
- connected components runs only over components touched by a new edge:
  prior clusters replay their star edges iff an endpoint belongs to them;
  every other row keeps its prior assignment verbatim.

The broadcast frames (digests, block keys, pair ids, touched clusters) are
all O(delta x keys); for a delta that is a large fraction of the corpus,
run the batch ``resolve()`` instead — it is the same price at that point.

Equivalence: with no skew cap crossed, ``resolve_incremental(A, B)``
produces exactly the clusters of ``resolve(A ∪ B)`` (asserted in
tests/test_incremental_resolve.py). When the union pushes a block across a
budget/stop threshold the two can differ — incremental keeps strictly MORE
edges (prior decisions are never un-made), batch re-thins.

Skew note: the asymmetric block join bounds each partition at
(block_size + new_in_block) rows; stop-keys (> block_key_drop_limit) are
dropped exactly like the batch path, and implied-pair budgets hash-thin the
join output deterministically. Hot-block triangular tiling is not needed
here because one join side is the (small) increment.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.blocking import exploded_blocks, with_block_keys, with_features
from ..operators.clustering import connected_components
from ..operators.scoring import matched_edges, score_pairs
from .pipeline import exact_duplicate_edges, sha_group_key


@dataclass
class IncrementalResult:
    features: DataFrame  # old ∪ new features — reusable as the next prior
    scored: DataFrame  # scored candidate pairs involving >= 1 new file
    clusters: DataFrame  # (file_id, cluster_id) over old ∪ new
    metrics: DataFrame  # (stage, metric, value)
    blocks: DataFrame | None = None  # updated blocking index (old ∪ new) —
    # persist and pass as the next fold's prior_blocks


def incremental_dropped_keys(
    old_blocks: DataFrame, new_blocks: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Stop-keys removed from this fold's candidate generation (touched
    keys whose total membership exceeds the drop limit) — surfaced, never
    silent, mirroring the batch path's dropped_block_keys."""
    cfg = cfg or PipelineConfig()
    new_keys = new_blocks.select("block_key").distinct()
    live_old = old_blocks.join(F.broadcast(new_keys), "block_key", "left_semi")
    idx = live_old.unionByName(new_blocks)
    return (
        idx.groupBy("block_key")
        .agg(F.count("*").alias("block_size"))
        .filter(F.col("block_size") > cfg.block_key_drop_limit)
    )


def incremental_candidate_pairs(
    old_blocks: DataFrame, new_blocks: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """old index x new index -> (left_id, right_id, block_key) where the
    right side is new. Same skew ladder semantics as the batch
    candidate_pairs: stop-keys dropped (surfaced via
    incremental_dropped_keys), per-block pair budget hash-thinned
    deterministically, cross-key dedup keeps the min block_key.

    Delta-proportional: the set of keys the increment touches is broadcast
    and the (corpus-sized) old index is SEMI-PROBED against it — the old
    index is scanned, never shuffled, and everything downstream (census,
    joins, budgets) runs on the delta-bounded live subset.
    """
    cfg = cfg or PipelineConfig()
    new_keys = new_blocks.select("block_key").distinct()
    live_old = old_blocks.join(F.broadcast(new_keys), "block_key", "left_semi")
    tagged = live_old.withColumn("__is_new", F.lit(False)).unionByName(
        new_blocks.withColumn("__is_new", F.lit(True))
    )
    census = tagged.groupBy("block_key").agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("__is_new").cast("long")).alias("n_new"),
    )
    live = census.filter(
        (F.col("n_new") >= 1)
        & (F.col("n_total") >= 2)
        & (F.col("n_total") <= cfg.block_key_drop_limit)
    )
    est = (F.col("n_total").cast("long") * F.col("n_new").cast("long")).alias("est")
    live = live.withColumn(
        "__k",
        F.greatest(
            F.lit(1), F.ceil(est / cfg.max_pairs_per_hot_block)
        ).cast("long"),
    ).select("block_key", "__k")
    idx = tagged.join(live.hint("shuffle_hash"), "block_key")
    a = idx.alias("a")
    b = idx.filter(F.col("__is_new")).hint("shuffle_hash").alias("b")
    pairs = (
        a.join(b, "block_key")
        .where(F.col("a.file_id") != F.col("b.file_id"))
        .select(
            F.least("a.file_id", "b.file_id").alias("left_id"),
            F.greatest("a.file_id", "b.file_id").alias("right_id"),
            "block_key",
            F.col("a.__k").alias("__k"),
        )
    )
    pairs = pairs.where(
        F.pmod(F.xxhash64("left_id", "right_id"), F.col("__k")) == 0
    )
    return pairs.groupBy("left_id", "right_id").agg(F.min("block_key").alias("block_key"))


def resolve_incremental(
    prior_features: DataFrame,
    prior_clusters: DataFrame,
    new_files: DataFrame,
    cfg: PipelineConfig | None = None,
    prior_blocks: DataFrame | None = None,
) -> IncrementalResult:
    """Merge ``new_files`` (north-rule shape) into a prior resolution.

    prior_features/prior_clusters: ``ResolutionResult.features`` /
    ``.clusters`` of the previous run (or read back from its StageStore).
    prior_blocks: optionally the previous blocking index (block_key,
    file_id) to skip recomputing MinHash keys for the old corpus.
    """
    cfg = cfg or PipelineConfig()
    spark = new_files.sparkSession
    from ..session import ensure_py_files
    from ..sources.readers import validate_schema

    ensure_py_files(spark)
    validate_schema(new_files)
    if "file_id" not in new_files.columns:
        id_cols = [c for c in ("repo", "path", "commit") if c in new_files.columns]
        new_files = new_files.withColumn(
            "file_id", F.xxhash64(*[F.col(c) for c in id_cols])
        )

    stage_secs: dict[str, float] = {}
    import time

    def _force(name: str, df: DataFrame) -> DataFrame:
        out = df.persist()
        t0 = time.time()
        out.count()
        stage_secs[name] = round(time.time() - t0, 3)
        return out

    def _ck(name: str, df: DataFrame) -> DataFrame:
        """Eager checkpoint for delta-bounded frames whose lineage carries a
        broadcast-hinted join: Spark's cache matching never HITS a persisted
        frame with such a plan, so each consumer would re-run the whole
        subtree (incl. the band UDF over the old corpus — measured 2x the
        fold). The checkpoint severs the lineage instead."""
        t0 = time.time()
        out = df.localCheckpoint(eager=True)
        stage_secs[name] = round(time.time() - t0, 3)
        return out

    new_feat = _force("features_new", with_features(new_files, cfg))
    feat_all = prior_features.unionByName(new_feat.select(prior_features.columns))
    new_ids = new_feat.select("file_id")

    # Exact collapse restricted to AFFECTED sha groups (groups containing a
    # new digest): the increment's digest set is broadcast and the union is
    # semi-probed — the corpus is scanned (column-pruned to the narrow sha
    # projection), never shuffled or re-collapsed. Unaffected groups keep
    # their membership through the prior clusters. Edges here are the only
    # exact edges whose components can change.
    aff = feat_all.withColumn("__sha_key", sha_group_key()).join(
        F.broadcast(new_feat.select(sha_group_key().alias("__sha_key")).distinct()),
        "__sha_key",
    )
    rep_map = aff.groupBy("__sha_key").agg(F.min("file_id").alias("rep_id"))
    aff = aff.join(rep_map.hint("shuffle_hash"), "__sha_key")
    exact_edges = (
        aff.filter(F.col("file_id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("src"), F.col("file_id").alias("dst"))
    )
    aff_reps = _ck(
        "exact_collapse",
        aff.filter(F.col("file_id") == F.col("rep_id")).drop("rep_id", "__sha_key"),
    )
    # only new rows that became their group's representative need blocking
    # keys; a new row folded under an existing old rep rides its star edge
    new_reps = aff_reps.join(new_ids, "file_id", "left_semi")

    if prior_blocks is None:
        # no reusable index: recompute old reps' keys (O(corpus) map-side
        # work, no corpus shuffle — the documented cost of not persisting
        # the blocking index between folds)
        old_rep_rows, _ = exact_duplicate_edges(prior_features)
        old_blocks = exploded_blocks(with_block_keys(old_rep_rows, cfg)).filter(
            ~F.col("block_key").startswith("sha:")
        )
    else:
        # old entries whose file_id is no longer a rep (its sha group gained
        # a smaller-id member) are harmless: their pairs drop at the scoring
        # join and the new rep carries its own keys
        old_blocks = prior_blocks
    new_blocks = _ck(
        "blocking_new",
        exploded_blocks(with_block_keys(new_reps, cfg)).filter(
            ~F.col("block_key").startswith("sha:")
        ),
    )

    pairs = _ck(
        "candidates", incremental_candidate_pairs(old_blocks, new_blocks, cfg)
    )
    # scoring features: semi-probe the union down to actual pair members
    # (broadcast of the delta-bounded id set) — the corpus light-feature
    # frame is never shuffled into the scoring joins
    pair_ids = (
        pairs.select(F.col("left_id").alias("file_id"))
        .unionByName(pairs.select(F.col("right_id").alias("file_id")))
        .distinct()
    )
    # localCheckpoint, not just lazy: a persisted frame whose lineage
    # contains this broadcast semi-join never gets cache HITS downstream
    # (observed: every consumer of `scored` re-ran the whole scoring
    # subtree, 4s+ per reference at test scale) — materializing the
    # delta-bounded probe result restores normal cache behavior
    feat_scoring = feat_all.join(
        F.broadcast(pair_ids), "file_id", "left_semi"
    ).localCheckpoint(eager=True)
    from ..operators.scoring import ScoringContext

    scoring_ctx = ScoringContext()
    scored = _force(
        "scoring", score_pairs(pairs, feat_scoring, cfg, ctx=scoring_ctx)
    )
    stage_secs["scoring_p1_fill"] = scoring_ctx.p1_fill_seconds
    scoring_ctx.release_phase1()

    near = matched_edges(scored, cfg).select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    )
    # The delta frames below fan out into several consumers (touched set,
    # star replay, CC input, final assembly, metrics) and their lineages
    # carry broadcasts + aggregations: without a materialization boundary
    # each consumer re-executes the whole subtree and the evaluation count
    # multiplies through the DAG (measured: minutes instead of seconds on a
    # 30-row delta). They are delta-bounded — checkpointing them is cheap.
    t0 = time.time()
    new_edges = near.unionByName(exact_edges).localCheckpoint(eager=True)
    stage_secs["edges"] = round(time.time() - t0, 3)

    # Connected components over AFFECTED components only: prior clusters
    # touched by any new edge replay their star edges; everything else
    # keeps its prior assignment untouched. CC input is delta-bounded —
    # O(new edges + members of touched clusters), not O(corpus).
    t0 = time.time()
    touched = (
        new_edges.select(F.col("src").alias("file_id"))
        .unionByName(new_edges.select(F.col("dst").alias("file_id")))
        .distinct()
    )
    aff_clusters = (
        prior_clusters.join(F.broadcast(touched), "file_id", "left_semi")
        .select("cluster_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    star_aff = (
        prior_clusters.join(F.broadcast(aff_clusters), "cluster_id", "left_semi")
        .filter(F.col("file_id") != F.col("cluster_id"))
        .select(F.col("cluster_id").alias("src"), F.col("file_id").alias("dst"))
    )
    components = connected_components(new_edges.unionByName(star_aff), cfg)
    unchanged = prior_clusters.join(
        F.broadcast(aff_clusters), "cluster_id", "left_anti"
    ).select("file_id", "cluster_id")
    new_singletons = (
        new_ids.join(components, "file_id", "left_anti")
        .select("file_id", F.col("file_id").alias("cluster_id"))
    )
    clusters = unchanged.unionByName(components).unionByName(new_singletons)
    n_clusters = clusters.select("cluster_id").distinct().count()
    stage_secs["clustering"] = round(time.time() - t0, 3)

    rows = [
        ("input_new", "rows", float(new_ids.count())),
        ("candidates", "pairs", float(pairs.count())),
        (
            "candidates",
            "dropped_keys",
            float(incremental_dropped_keys(old_blocks, new_blocks, cfg).count()),
        ),
        ("scoring", "scored_pairs", float(scored.count())),
        ("clustering", "affected_prior_clusters", float(aff_clusters.count())),
        ("clustering", "clusters", float(n_clusters)),
    ] + [(k, "seconds", float(v)) for k, v in stage_secs.items()]
    metrics = spark.createDataFrame(rows, "stage string, metric string, value double")
    return IncrementalResult(
        feat_all, scored, clusters, metrics, old_blocks.unionByName(new_blocks)
    )
