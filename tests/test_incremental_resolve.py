"""resolve_incremental == batch resolve on the union (no caps crossed)."""

from pyspark.sql import functions as F

from entity_resolution_spark.config import PipelineConfig
from entity_resolution_spark.datagen import generate_repo_files
from entity_resolution_spark.plans.incremental import resolve_incremental
from entity_resolution_spark.plans.pipeline import resolve


def _cluster_sets(clusters_df):
    """Partition-shape comparison: frozenset of member-frozensets (cluster
    ids themselves are min-file-id, so direct dict compare also works)."""
    rows = clusters_df.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["file_id"])
    return {cid: frozenset(m) for cid, m in by_cluster.items()}


def _split(files):
    old = files.filter(F.pmod(F.xxhash64("path"), F.lit(4)) != 0)
    new = files.filter(F.pmod(F.xxhash64("path"), F.lit(4)) == 0)
    return old, new


def test_incremental_matches_batch_union(spark):
    files = generate_repo_files(spark, 120).localCheckpoint()
    old, new = _split(files)
    cfg = PipelineConfig()

    prior = resolve(old, cfg)
    inc = resolve_incremental(prior.features, prior.clusters, new, cfg)
    batch = resolve(files, cfg)

    assert _cluster_sets(inc.clusters) == _cluster_sets(batch.clusters)


def test_incremental_with_reused_blocking_index(spark):
    """Passing the prior blocking index (the 100 TB mode: old keys are not
    recomputed) must give the same clusters."""
    from entity_resolution_spark.operators.blocking import (
        exploded_blocks,
        with_block_keys,
    )
    from entity_resolution_spark.plans.pipeline import exact_duplicate_edges

    files = generate_repo_files(spark, 100).localCheckpoint()
    old, new = _split(files)
    cfg = PipelineConfig()

    prior = resolve(old, cfg)
    old_reps, _ = exact_duplicate_edges(prior.features)
    prior_blocks = exploded_blocks(with_block_keys(old_reps, cfg)).filter(
        ~F.col("block_key").startswith("sha:")
    )

    inc = resolve_incremental(
        prior.features, prior.clusters, new, cfg, prior_blocks=prior_blocks
    )
    batch = resolve(files, cfg)
    assert _cluster_sets(inc.clusters) == _cluster_sets(batch.clusters)


def test_incremental_exact_dup_joins_without_scoring(spark):
    """A new file byte-identical to an old one joins its cluster through
    the exact-duplicate star edge; no candidate pair is scored for it."""
    rows_old = [
        ("r1", "src/alpha.py", "c1", "py", "def alpha():\n    return 1\n" * 10),
        ("r2", "src/beta.py", "c2", "py", "def beta():\n    return 2\n" * 10),
    ]
    rows_new = [
        ("r3", "vendored/alpha.py", "c3", "py", "def alpha():\n    return 1\n" * 10),
    ]
    schema = "repo string, path string, commit string, lang string, content string"
    old = spark.createDataFrame(rows_old, schema)
    new = spark.createDataFrame(rows_new, schema)
    cfg = PipelineConfig()
    prior = resolve(old, cfg)
    inc = resolve_incremental(prior.features, prior.clusters, new, cfg)
    sets = _cluster_sets(inc.clusters)
    sizes = sorted(len(m) for m in sets.values())
    assert sizes == [1, 2]  # alpha pair merged, beta alone


def test_chained_folds_with_index_reuse_match_batch(spark):
    """Three deltas folded in sequence — each reusing the previous fold's
    returned blocking index — must equal one batch resolve of everything.
    This pins the .blocks contract (old ∪ new) across a chain, the
    continuous loop's operating mode."""
    files = generate_repo_files(spark, 90).localCheckpoint()
    parts = [
        files.filter(F.pmod(F.xxhash64("path"), F.lit(3)) == i) for i in range(3)
    ]
    cfg = PipelineConfig()

    prior = resolve(parts[0], cfg)
    feats, clusters, blocks = prior.features, prior.clusters, prior.blocks
    for delta in parts[1:]:
        inc = resolve_incremental(feats, clusters, delta, cfg, prior_blocks=blocks)
        feats, clusters, blocks = inc.features, inc.clusters, inc.blocks

    batch = resolve(files, cfg)
    assert _cluster_sets(clusters) == _cluster_sets(batch.clusters)


def test_incremental_matches_batch_on_skewed_splits(spark):
    """Equivalence must hold regardless of the delta's shape: a tiny tail
    delta and a majority delta (the fold is documented for small deltas but
    must stay CORRECT for any split)."""
    files = generate_repo_files(spark, 70).localCheckpoint()
    cfg = PipelineConfig()
    batch = resolve(files, cfg)
    for modulus, residue in ((10, 0), (10, 5), (2, 0)):
        old = files.filter(F.pmod(F.xxhash64("commit"), F.lit(modulus)) != residue)
        new = files.filter(F.pmod(F.xxhash64("commit"), F.lit(modulus)) == residue)
        prior = resolve(old, cfg)
        inc = resolve_incremental(prior.features, prior.clusters, new, cfg)
        assert _cluster_sets(inc.clusters) == _cluster_sets(batch.clusters), (
            modulus,
            residue,
        )


def test_incremental_stop_keys_are_surfaced(spark):
    """A touched key over the drop limit generates zero pairs AND appears
    in the dropped-keys metric — no silent truncation in the fold."""
    from entity_resolution_spark.plans.incremental import incremental_dropped_keys

    cfg = PipelineConfig()
    small_cfg_limit = 5
    old_blocks = spark.range(10).select(
        F.lit("path:py:util:0").alias("block_key"), F.col("id").alias("file_id")
    )
    new_blocks = spark.range(2).select(
        F.lit("path:py:util:0").alias("block_key"),
        (F.col("id") + 100).alias("file_id"),
    )
    import dataclasses

    cfg = dataclasses.replace(cfg, block_key_drop_limit=small_cfg_limit)
    from entity_resolution_spark.plans.incremental import incremental_candidate_pairs

    assert incremental_candidate_pairs(old_blocks, new_blocks, cfg).count() == 0
    dropped = incremental_dropped_keys(old_blocks, new_blocks, cfg).collect()
    assert len(dropped) == 1 and dropped[0].block_size == 12
