"""Density-based clustering (DBSCAN, Ester et al. KDD'96) over embeddings.

The classic trio the centroid methods can't express: CORE points (dense
neighborhoods) seed clusters, BORDER points attach to a neighboring core,
NOISE stays unclustered — so sparse in-between vectors don't bridge two
dense topics the way connected components would merge them.

Spark-first decomposition, all set algebra on DataFrames:

1. eps-neighborhood = the hyperplane-LSH candidate graph verified by exact
   cosine (``dedup.embedding_cosine_pairs`` — the same bucketed, never
   all-pairs plan the near-dup path uses; neighborhoods are "cosine >=
   min_cosine, LSH-recalled", and the DuckDB oracle replicates the LSH
   bit-for-bit so the contract checks the whole construction);
2. degree census (one hash-agg) -> core = degree >= min_pts;
3. clusters = connected components over the core-core subgraph
   (``clustering.connected_components`` — checkpointed large/small-star),
   cluster id = min core id in the component; isolated cores label
   themselves;
4. border = non-core adjacent to >= 1 core, attached to its MINIMUM-id
   core neighbor (deterministic stand-in for DBSCAN's arbitrary pick);
5. everything else = noise (cluster_id NULL).

At 100 TB: the only super-linear step is the LSH self-join, which rides
the skew-capped machinery inside embedding_cosine_pairs; degree/core/
border are single hash-aggs and semi-joins on (id, id) pairs; CC runs on
the core subgraph only (a fraction of the already-thresholded edge set).

Reference parity: the reference has no density clustering; this is an
engine-added operator in the dedup/similarity family (SURVEY.md §2
"beyond-reference" axis), same contract treatment as SemDeDup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan_clusters(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.3,
    min_pts: int = 3,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """-> (id_col, role in {'core','border','noise'}, cluster_id nullable).

    ``min_pts`` counts NEIGHBORS (the point itself excluded), so
    ``min_pts=3`` means a 4-point dense neighborhood in the usual
    self-inclusive DBSCAN convention.
    """
    from .clustering import connected_components
    from .dedup import embedding_cosine_pairs

    pairs = embedding_cosine_pairs(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        min_cosine=min_cosine,
        n_planes=n_planes,
        n_tables=n_tables,
        seed=seed,
    )
    sym = pairs.select(
        F.col("left_id").alias("s"), F.col("right_id").alias("d")
    ).unionByName(
        pairs.select(F.col("right_id").alias("s"), F.col("left_id").alias("d"))
    )
    core = (
        sym.groupBy("s")
        .agg(F.count("*").alias("deg"))
        .where(F.col("deg") >= min_pts)
        .select(F.col("s").alias("id"))
    )
    core_edges = (
        sym.join(core.select(F.col("id").alias("s")), "s", "left_semi")
        .join(core.select(F.col("id").alias("d")), "d", "left_semi")
        .select(F.col("s").alias("src"), F.col("d").alias("dst"))
    )
    comp = connected_components(core_edges).select(
        F.col("file_id").alias("id"), "cluster_id"
    )
    core_lab = (
        core.join(comp, "id", "left")
        .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
    )
    border = (
        sym.join(core.select(F.col("id").alias("d")), "d", "left_semi")
        .join(core.select(F.col("id").alias("s")), "s", "left_anti")
        .groupBy("s")
        .agg(F.min("d").alias("core_nb"))
    )
    border_lab = border.join(
        core_lab.select(F.col("id").alias("core_nb"), "cluster_id"), "core_nb"
    ).select(F.col("s").alias("id"), "cluster_id")
    labeled = core_lab.withColumn("role", F.lit("core")).unionByName(
        border_lab.withColumn("role", F.lit("border"))
    )
    return (
        emb.select(F.col(id_col).cast("long").alias("id"))
        .join(labeled, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("role", F.lit("noise")).alias("role"),
            "cluster_id",
        )
    )
