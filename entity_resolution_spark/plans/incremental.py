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

Cost per increment: features for the new batch only; one narrow shuffle
over (sha, id) of the old corpus for the exact-duplicate collapse; block
keys for new representatives (plus optionally reusing a persisted blocking
index for old rows — pass ``prior_blocks``; otherwise old keys are
recomputed map-side); scoring restricted to pairs with >= 1 new side; CC
over star + exact + new-match edges.

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
from ..operators.clustering import assign_clusters, connected_components
from ..operators.scoring import matched_edges, score_pairs
from .pipeline import exact_duplicate_edges


@dataclass
class IncrementalResult:
    features: DataFrame  # old ∪ new features — reusable as the next prior
    scored: DataFrame  # scored candidate pairs involving >= 1 new file
    clusters: DataFrame  # (file_id, cluster_id) over old ∪ new
    metrics: DataFrame  # (stage, metric, value)


def incremental_candidate_pairs(
    blocks: DataFrame, new_ids: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """(block_key, file_id) x new ids -> (left_id, right_id, block_key)
    where at least one side is new. Same skew ladder semantics as the batch
    candidate_pairs: stop-keys dropped, per-block pair budget hash-thinned
    deterministically, cross-key dedup keeps the min block_key.
    """
    cfg = cfg or PipelineConfig()
    tagged = blocks.join(
        new_ids.select("file_id").withColumn("__is_new", F.lit(True)),
        "file_id",
        "left",
    ).withColumn("__is_new", F.coalesce("__is_new", F.lit(False)))
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

    new_feat = _force("features_new", with_features(new_files, cfg))
    feat_all = prior_features.unionByName(new_feat.select(prior_features.columns))
    new_ids = new_feat.select("file_id")

    # exact collapse over the union: one narrow shuffle on (sha, id); a new
    # row whose digest already exists joins its group through a star edge
    # and never reaches blocking/scoring
    reps, exact_edges = exact_duplicate_edges(feat_all)
    reps = _force("exact_collapse", reps)

    if prior_blocks is None:
        keyed = with_block_keys(reps, cfg)
        blocks = exploded_blocks(keyed).filter(
            ~F.col("block_key").startswith("sha:")
        )
    else:
        new_reps = reps.join(new_ids, "file_id", "left_semi")
        new_blocks = exploded_blocks(with_block_keys(new_reps, cfg)).filter(
            ~F.col("block_key").startswith("sha:")
        )
        # old entries whose file_id is no longer a rep (its sha group gained
        # a smaller-id member) are harmless: their pairs drop at the scoring
        # join and the new rep carries its own keys
        blocks = prior_blocks.unionByName(new_blocks)
    blocks = _force("blocking", blocks)

    pairs = _force("candidates", incremental_candidate_pairs(blocks, new_ids, cfg))
    scored = _force("scoring", score_pairs(pairs, reps, cfg))
    from ..operators.scoring import release_phase1

    release_phase1()

    star = prior_clusters.filter(F.col("file_id") != F.col("cluster_id")).select(
        F.col("cluster_id").alias("src"), F.col("file_id").alias("dst")
    )
    near = matched_edges(scored, cfg).select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    )
    all_edges = near.unionByName(exact_edges).unionByName(star)

    t0 = time.time()
    components = connected_components(all_edges, cfg)
    clusters = assign_clusters(feat_all, components)
    n_clusters = clusters.select("cluster_id").distinct().count()
    stage_secs["clustering"] = round(time.time() - t0, 3)

    rows = [
        ("input_new", "rows", float(new_ids.count())),
        ("candidates", "pairs", float(pairs.count())),
        ("scoring", "scored_pairs", float(scored.count())),
        ("clustering", "clusters", float(n_clusters)),
    ] + [(k, "seconds", float(v)) for k, v in stage_secs.items()]
    metrics = spark.createDataFrame(rows, "stage string, metric string, value double")
    return IncrementalResult(feat_all, scored, clusters, metrics)
