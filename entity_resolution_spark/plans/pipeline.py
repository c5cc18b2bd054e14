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
from ..operators.scoring import ScoringContext, matched_edges, score_pairs
from ..sources.io import StageStore


@dataclass
class ResolutionResult:
    features: DataFrame  # per-file derived features incl. content_sha256
    scored: DataFrame  # all scored candidate pairs (lineage of every decision)
    clusters: DataFrame  # (file_id, cluster_id)
    metrics: DataFrame  # (stage, metric, value)
    dropped_keys: DataFrame  # stop-keys removed from blocking, with sizes
    blocks: DataFrame | None = None  # (block_key, file_id) index over reps —
    # persist it (StageStore/parquet) and hand it to resolve_incremental as
    # prior_blocks so later folds skip re-keying the old corpus
    scoring_ctx: "ScoringContext | None" = None  # per-call scoring-stage
    # state (phase-1 fill seconds + cache handle); interleaved resolve()
    # calls in one session each carry their own


def sha_group_key():
    """Exact-duplicate group key over (content_sha256, file_id) columns:
    NULL content keys by the row's own file_id — unknown bytes are not
    duplicates of other unknowns (see exact_duplicate_edges). Shared with
    the incremental plan so both collapse into identical groups."""
    return F.coalesce(
        F.col("content_sha256"),
        F.concat(F.lit("__null__:"), F.col("file_id").cast("string")),
    )


def exact_duplicate_edges(feat: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(representatives, star edges rep->member) by content_sha256.

    Hash-aggregate to a (digest, rep_id) map, then hash-join it back: the
    aggregate's map-side combine shrinks even a 10^9-member boilerplate
    digest to one row per partition before the shuffle, and neither step
    sorts — a window-min here (the earlier design) sorts every partition by
    digest, which makes the one mega-digest group a single-task external
    sort at 100 TB.

    NULL content (unknown bytes) is NOT a duplicate of other unknowns: each
    null-content row keys by its own file_id and stays a singleton here —
    otherwise every content-less row in the corpus would merge into one
    mega-cluster. The sha256 column itself stays NULL (the per-row
    invariant is sha-of-content, not sha-of-coalesce).
    """
    tagged = feat.withColumn("__sha_key", sha_group_key())
    rep_map = tagged.groupBy("__sha_key").agg(F.min("file_id").alias("rep_id"))
    joined = tagged.join(rep_map.hint("shuffle_hash"), "__sha_key")
    reps = joined.filter(F.col("file_id") == F.col("rep_id")).drop("rep_id", "__sha_key")
    edges = (
        joined.filter(F.col("file_id") != F.col("rep_id"))
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
    import time

    cfg = cfg or PipelineConfig()
    spark = spark or files.sparkSession
    from ..session import ensure_py_files

    ensure_py_files(spark)  # pandas UDFs must import this package on workers

    # fail fast with a complete report instead of an unresolved-column error
    # deep inside the feature/blocking plan (P4 semantics, readers.py)
    from ..sources.readers import validate_schema

    validate_schema(files)

    if "file_id" not in files.columns:
        # deterministic fallback id: monotonically_increasing_id() is
        # partition-dependent, which made cluster_id = min(file_id)
        # nondeterministic across runs/parallelism. A content-address over
        # the identity columns is stable under any partitioning (64-bit
        # birthday collisions only matter past ~10^9 files; callers at that
        # scale should assign their own ids).
        id_cols = [c for c in ("repo", "path", "commit") if c in files.columns]
        files = files.withColumn("file_id", F.xxhash64(*[F.col(c) for c in id_cols]))

    stage_secs: dict[str, float] = {}

    # ERS_TRACE_RESOLVE=1: stamp every step boundary to stderr — localizes
    # wall-clock that the stage timers don't attribute (plan analysis,
    # lazy-build glue) without changing any plan
    import os as _os
    import sys as _sys

    _trace_on = _os.environ.get("ERS_TRACE_RESOLVE", "") not in ("", "0")
    _t_last = [time.time()]

    def _trace(label: str) -> None:
        if _trace_on:
            now = time.time()
            print(f"[resolve-trace] {label}: +{now - _t_last[0]:.1f}s", file=_sys.stderr)
            _t_last[0] = now

    def _timed(name: str, thunk):
        t0 = time.time()
        r = thunk()
        stage_secs[name] = round(time.time() - t0, 3)
        _trace(f"timed:{name}")
        return r

    def _stage(name: str, compute, partition_by=None) -> DataFrame:
        if store is None:
            return compute()
        return _timed(name, lambda: store.get_or_compute(spark, name, compute, partition_by))

    # No stage materialization -> cache AND FORCE the frames consumed by
    # multiple downstream branches, in dependency order. Forcing matters as
    # much as caching: the scoring joins read `reps` through four concurrent
    # stages, and concurrent readers of an unfilled cache each recompute its
    # full lineage (observed 2x+ wall-clock). With a StageStore the parquet
    # writes create the same ordered boundaries.
    def _force(name: str, df: DataFrame) -> DataFrame:
        if store is not None:
            return df
        out = df.persist()
        _timed(name, out.count)
        return out

    feat = _force("features", _stage("features", lambda: with_features(files, cfg)))
    reps, exact_edges = exact_duplicate_edges(feat)
    _trace("build:exact_edges")
    reps = _force("exact_collapse", reps)

    keyed = with_block_keys(reps, cfg)
    # sha keys are singletons among representatives by construction — drop
    # them before the explode so the blocking index stays lean.
    # Persisted: the blocking index is read by candidate generation AND the
    # block-census metrics/dropped-keys reports — without the cache each
    # reader re-runs the MinHash band UDF over the whole corpus (measured
    # as most of the metrics stage's cost). Fill happens inside the
    # candidates stage; the frame is only (block_key, file_id).
    blocks = exploded_blocks(keyed).filter(
        ~F.col("block_key").startswith("sha:")
    ).persist()

    _trace("build:blocks")
    pairs = _force("candidates", _stage("pairs", lambda: candidate_pairs(blocks, cfg)))
    scoring_ctx = ScoringContext()
    scored = _force(
        "scoring",
        _stage("scored", lambda: score_pairs(pairs, reps, cfg, ctx=scoring_ctx)),
    )
    # the eager phase-1 fill inside score_pairs runs at build time, before
    # _force's timer starts — surface it as its own stage row (read from
    # THIS call's context, so interleaved resolves don't cross-contaminate).
    # DISJOINT accounting: 'scoring_p1_fill' covers the phase-1 census + JW
    # + cache fill; 'scoring' covers ONLY the later phase-2 materialization
    # count, which reads phase 1 from cache — the two never overlap, so the
    # stage rows are additive to the job total (bench.py records
    # stage_sum/unattributed to prove it per run).
    stage_secs["scoring_p1_fill"] = scoring_ctx.p1_fill_seconds
    # the scored union is materialized (persisted count or StageStore
    # write) — phase-1's internal cache is no longer needed
    scoring_ctx.release_phase1()

    _trace("release_phase1")
    near_edges = matched_edges(scored, cfg)
    all_edges = near_edges.select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    ).unionByName(exact_edges)

    components = _timed("clustering", lambda: connected_components(all_edges, cfg))
    clusters = _stage("clusters", lambda: assign_clusters(feat, components))
    _trace("build:clusters")

    dropped = dropped_block_keys(blocks, cfg)
    metrics = _timed(
        "metrics",
        lambda: _build_metrics(spark, files, pairs, scored, clusters, cfg, blocks=blocks),
    )
    timing = spark.createDataFrame(
        [(k, "seconds", float(v)) for k, v in stage_secs.items()],
        "stage string, metric string, value double",
    )
    metrics = metrics.unionByName(timing)
    if store is not None:
        store.write("metrics", metrics)
        store.write("lineage", scored)  # every pair decision, with block_key provenance

    _trace("build:timing_union")
    return ResolutionResult(
        feat, scored, clusters, metrics, dropped, blocks, scoring_ctx
    )


def _build_metrics(spark, files, pairs, scored, clusters, cfg, blocks=None) -> DataFrame:
    """Stage-level metrics table. Computed in one pass per frame; at scale
    these are the dashboards that prove the skew handling worked."""
    n_files = files.count()
    n_pairs = pairs.count()
    agg = scored.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum((F.col("score") >= cfg.similarity_threshold).cast("long")), F.lit(0)).alias("m"),
    ).collect()[0]
    n_clusters = clusters.select("cluster_id").distinct().count()
    # whether the compiled LCS/JW kernel loaded (driver probe; workers share
    # the same fs + content-addressed .so). A silent fallback to the pure-
    # Python kernel is ~8x slower scoring — this row makes slow samples
    # attributable instead of mysterious.
    from ..functions._lcs_native import get_lib

    rows = [
        ("input", "rows", float(n_files)),
        ("candidates", "pairs", float(n_pairs)),
        ("scoring", "scored_pairs", float(agg["n"])),
        ("scoring", "matched_pairs", float(agg["m"])),
        ("scoring", "native_kernel", 1.0 if get_lib() is not None else 0.0),
        ("clustering", "clusters", float(n_clusters)),
    ]
    if blocks is not None:
        # block-size distribution — the skew evidence (how close the
        # largest block sits to the salting threshold and how many blocks
        # crossed it). One aggregate pass over the census.
        census = blocks.groupBy("block_key").agg(F.count("*").alias("n"))
        b = census.agg(
            F.count("*").alias("blocks"),
            F.max("n").alias("max_block"),
            F.expr("percentile_approx(n, 0.99)").alias("p99_block"),
            F.sum((F.col("n") > cfg.max_block_size).cast("long")).alias("salted_blocks"),
            F.sum((F.col("n") > cfg.block_key_drop_limit).cast("long")).alias("dropped_keys"),
        ).collect()[0]
        rows += [
            ("blocking", "blocks", float(b["blocks"])),
            ("blocking", "max_block_size", float(b["max_block"] or 0)),
            ("blocking", "p99_block_size", float(b["p99_block"] or 0)),
            ("blocking", "salted_blocks", float(b["salted_blocks"] or 0)),
            ("blocking", "dropped_keys", float(b["dropped_keys"] or 0)),
        ]
    return spark.createDataFrame(rows, "stage string, metric string, value double")
