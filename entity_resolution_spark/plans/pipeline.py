"""End-to-end record-linkage pipeline (SURVEY.md §2.11 stage map).

    repo_files ──Stage 1──► features (+sha256, tokens, blocking keys)
               ──Stage 1b─► exact-duplicate collapse (sha groups → star edges)
               ──Stage 2──► candidate pairs (blocked, salted self-join)
               ──Stage 3──► scored pairs (Arrow pandas-UDF blend)
               ──Stage 4──► connected components → clusters
               ──Stage 5──► consolidated canonical entities + metrics/lineage

The exact-duplicate collapse is the engine's biggest asymptotic win over the
reference design: rows with identical ``content_sha256`` never enter
pairwise scoring at all — one representative per digest proceeds, and the
rest rejoin their representative's cluster through O(n) star edges. On a
100 TB corpus where boilerplate files repeat millions of times, this turns
the worst quadratic blocks into linear work *before* blocking even runs.

Every stage can persist through a StageStore (parquet/Iceberg) and a
restart resumes from the last complete stage (north_rule resumability).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.blocking import exploded_blocks, with_block_keys, with_features
from ..operators.candidates import candidate_pairs, dropped_block_keys
from ..operators.clustering import assign_clusters, connected_components
from ..operators.scoring import matched_edges, score_pairs
from ..sources.io import StageStore


@dataclass
class ResolutionResult:
    features: DataFrame  # per-file derived features incl. content_sha256
    scored: DataFrame  # all scored candidate pairs (lineage of every decision)
    clusters: DataFrame  # (file_id, cluster_id)
    metrics: DataFrame  # (stage, metric, value)
    dropped_keys: DataFrame  # stop-keys removed from blocking, with sizes


def exact_duplicate_edges(feat: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(representatives, star edges rep->member) by content_sha256.

    One shuffle on the digest; the window-min avoids a self-join.
    """
    w = Window.partitionBy("content_sha256")
    tagged = feat.withColumn("rep_id", F.min("file_id").over(w))
    reps = tagged.filter(F.col("file_id") == F.col("rep_id")).drop("rep_id")
    edges = (
        tagged.filter(F.col("file_id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("src"), F.col("file_id").alias("dst"))
    )
    return reps, edges


def resolve(
    files: DataFrame,
    cfg: PipelineConfig | None = None,
    store: StageStore | None = None,
    spark: SparkSession | None = None,
) -> ResolutionResult:
    """Run (or resume) the full pipeline on a (repo, path, commit, lang,
    content[, file_id]) frame."""
    cfg = cfg or PipelineConfig()
    spark = spark or files.sparkSession
    from ..session import ensure_py_files

    ensure_py_files(spark)  # pandas UDFs must import this package on workers

    if "file_id" not in files.columns:
        files = files.withColumn("file_id", F.monotonically_increasing_id())

    def _stage(name: str, compute, partition_by=None) -> DataFrame:
        if store is None:
            return compute()
        return store.get_or_compute(spark, name, compute, partition_by)

    feat = _stage("features", lambda: with_features(files, cfg))
    if store is None:
        # no stage materialization -> cache the frames consumed by multiple
        # downstream actions (scoring UDF must run once, not once per action)
        feat = feat.persist()
    reps, exact_edges = exact_duplicate_edges(feat)

    keyed = with_block_keys(reps, cfg)
    # sha keys are singletons among representatives by construction — drop
    # them before the explode so the blocking index stays lean
    blocks = exploded_blocks(keyed).filter(~F.col("block_key").startswith("sha:"))

    pairs = _stage("pairs", lambda: candidate_pairs(blocks, cfg))
    scored = _stage("scored", lambda: score_pairs(pairs, reps, cfg))
    if store is None:
        # Materialize the expensive stages ONCE, in order, before the
        # connected-components loop: its per-iteration checkpoints and the
        # metrics pass would otherwise each re-derive blocking + scoring
        # from cold caches (observed 5x wall-clock blowup). With a
        # StageStore the parquet writes play this role.
        pairs = pairs.persist()
        scored = scored.persist()
        scored.count()

    near_edges = matched_edges(scored, cfg)
    all_edges = near_edges.select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    ).unionByName(exact_edges)

    components = connected_components(all_edges, cfg)
    clusters = _stage("clusters", lambda: assign_clusters(feat, components))

    dropped = dropped_block_keys(blocks, cfg)
    metrics = _build_metrics(spark, files, pairs, scored, clusters, cfg)
    if store is not None:
        store.write("metrics", metrics)
        store.write("lineage", scored)  # every pair decision, with block_key provenance

    return ResolutionResult(feat, scored, clusters, metrics, dropped)


def _build_metrics(spark, files, pairs, scored, clusters, cfg) -> DataFrame:
    """Stage-level metrics table. Computed in one pass per frame; at scale
    these are the dashboards that prove the skew handling worked."""
    n_files = files.count()
    n_pairs = pairs.count()
    agg = scored.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum((F.col("score") >= cfg.similarity_threshold).cast("long")), F.lit(0)).alias("m"),
    ).collect()[0]
    n_clusters = clusters.select("cluster_id").distinct().count()
    rows = [
        ("input", "rows", float(n_files)),
        ("candidates", "pairs", float(n_pairs)),
        ("scoring", "scored_pairs", float(agg["n"])),
        ("scoring", "matched_pairs", float(agg["m"])),
        ("clustering", "clusters", float(n_clusters)),
    ]
    return spark.createDataFrame(rows, "stage string, metric string, value double")
