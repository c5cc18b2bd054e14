"""Adversarial-input battery for resolve(): inputs a 100 TB crawl of real
repositories WILL contain — non-ASCII content, pathless files, megabyte
blobs, duplicated identity rows — must degrade gracefully, never corrupt
clusters or blow up a stage (SURVEY.md §7.3 robustness items)."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.config import PipelineConfig
from entity_resolution_spark.datagen import generate_repo_files
from entity_resolution_spark.plans.pipeline import resolve


def _files(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_unicode_content_exact_dups_cluster(spark):
    """sha256 runs over UTF-8 bytes: identical non-ASCII content must
    collapse into one cluster, distinct non-ASCII content must not."""
    cyr = "def жизнь():\n    return 'смысл' * 42\n"
    emoji = "# 🎉🎊\nANSWER = '🌍 hello'\n"
    rows = [
        ("r/u", "a/один.py", "a" * 40, "python", cyr),
        ("r/u", "b/два.py", "b" * 40, "python", cyr),
        ("r/u", "c/три.py", "c" * 40, "python", emoji),
    ]
    res = resolve(_files(spark, rows), PipelineConfig())
    shas = {r.path: r.content_sha256 for r in res.features.collect()}
    assert shas["a/один.py"] == shas["b/два.py"] != shas["c/три.py"]
    clusters = {r.file_id: r.cluster_id for r in res.clusters.collect()}
    feats = {r.path: r.file_id for r in res.features.collect()}
    assert clusters[feats["a/один.py"]] == clusters[feats["b/два.py"]]
    assert clusters[feats["a/один.py"]] != clusters[feats["c/три.py"]]


def test_pathless_and_dotfile_paths(spark):
    """A path with no '/' (basename == path) and a dotfile whose whole name
    is an 'extension' must still produce usable blocking keys."""
    rows = [
        ("r/p", "Makefile", "a" * 40, "make", "all:\n\techo build\n"),
        ("r/p", ".gitignore", "b" * 40, "text", "*.pyc\n__pycache__/\n"),
        ("r/p", "sub/Makefile", "c" * 40, "make", "all:\n\techo build\n"),
    ]
    res = resolve(_files(spark, rows), PipelineConfig())
    clusters = {r.file_id: r.cluster_id for r in res.clusters.collect()}
    feats = {r.path: r.file_id for r in res.features.collect()}
    # identical Makefiles merge (exact sha), .gitignore stays apart
    assert clusters[feats["Makefile"]] == clusters[feats["sub/Makefile"]]
    assert clusters[feats[".gitignore"]] != clusters[feats["Makefile"]]


def test_megabyte_blob_resolves(spark):
    """Two near-identical ~1 MB single-line minified blobs must resolve into
    one cluster WITHOUT a quadratic LCS straggler: the edit ratio runs on
    the first lev_max_chars per side (full 1M x 1M bit-parallel LCS is
    ~1.6e10 word-ops — minutes for ONE pair)."""
    blob = ";".join(f"var v{i}={i}" for i in range(87000))  # ~1.05 MB, one line
    base = generate_repo_files(spark, 20)
    big = _files(
        spark,
        [
            ("r/big", "dist/app.min.js", "a" * 40, "javascript", blob),
            ("r/big", "dist/app2.min.js", "b" * 40, "javascript", blob + ";var zz=1"),
        ],
    )
    files = base.select("repo", "path", "commit", "lang", "content").unionByName(big)
    res = resolve(files, PipelineConfig())
    feats = {r.path: r.file_id for r in res.features.collect() if r.repo == "r/big"}
    clusters = {r.file_id: r.cluster_id for r in res.clusters.collect()}
    # near-identical megabyte blobs are near-dups: same prefix key + bands,
    # token jaccard ~1, truncated-but-clamped edit ratio ~100
    assert clusters[feats["dist/app.min.js"]] == clusters[feats["dist/app2.min.js"]]


def test_lev_truncation_clamps_to_length_bound(spark):
    """A pair sharing its first lev_max_chars but wildly different in total
    length must NOT get the truncated ratio at face value: the clamp caps
    lev_ratio at the full-length bound 200*min/(n_l+n_r), so a 30k-char
    file cannot 'match' a 300k-char file just because the window agreed."""
    from entity_resolution_spark.operators.scoring import score_pairs

    prefix = ";".join(f"let q{i}={i}" for i in range(3000))  # ~30k chars
    tail = ";".join(f"let t{i}='{i}'" for i in range(27000))  # ~300k more
    files = _files(
        spark,
        [
            ("r/t", "a/w.js", "a" * 40, "javascript", prefix),
            ("r/t", "b/w.js", "b" * 40, "javascript", prefix + ";" + tail),
        ],
    )
    from entity_resolution_spark.operators.blocking import with_features

    cfg = PipelineConfig()
    feat = with_features(files, cfg).withColumn(
        "file_id", F.xxhash64("repo", "path", "commit")
    )
    ids = [r.file_id for r in feat.select("file_id").collect()]
    pairs = spark.createDataFrame(
        [(min(ids), max(ids), "pfx:test")], "left_id long, right_id long, block_key string"
    )
    row = score_pairs(pairs, feat, cfg).collect()[0]
    n_l, n_r = sorted(
        [r["n"] for r in feat.select(F.length("norm_content").alias("n")).collect()]
    )
    assert row.lev_ratio <= int(200.0 * n_l / (n_l + n_r))  # clamped, not ~100
    assert row.score < cfg.similarity_threshold


def test_lev_truncation_tail_divergence_rejected(spark):
    """Two SAME-length files identical in the first lev_max_chars but
    totally divergent after must NOT score lev_ratio ~100: the length
    bound is 100 when lengths are equal (it cannot help), so the tail
    sample must supply the divergence. Minified bundles — the truncation
    guard's stated motivation — often share a long preamble."""
    from entity_resolution_spark.operators.blocking import with_features
    from entity_resolution_spark.operators.scoring import score_pairs

    cfg = PipelineConfig()
    prefix = ";".join(f"let q{i}={i}" for i in range(3000))  # ~30k shared
    files = _files(
        spark,
        [
            ("r/t", "a/w.js", "a" * 40, "javascript", prefix + ";" + "a" * 30000),
            ("r/t", "b/w.js", "b" * 40, "javascript", prefix + ";" + "b" * 30000),
        ],
    )
    feat = with_features(files, cfg).withColumn(
        "file_id", F.xxhash64("repo", "path", "commit")
    )
    ids = [r.file_id for r in feat.select("file_id").collect()]
    pairs = spark.createDataFrame(
        [(min(ids), max(ids), "pfx:test")], "left_id long, right_id long, block_key string"
    )
    row = score_pairs(pairs, feat, cfg).collect()[0]
    # head window (first 25k) is identical -> raw ratio 100; equal lengths
    # -> length bound 100; the tail sample (all-a vs all-b) is what rejects
    assert row.lev_ratio < 30
    assert row.score < cfg.similarity_threshold


def test_duplicated_identity_rows_collapse_to_one_id(spark):
    """The deterministic file_id fallback hashes (repo, path, commit): a row
    emitted twice upstream (e.g. a retried extract task) maps to ONE id and
    ONE cluster membership decision — ingestion retries cannot fork
    clusters. The duplicate carries identical content so it is pure replay,
    and downstream consumers see exactly-once semantics after a distinct."""
    row = ("r/d", "pkg/mod.py", "a" * 40, "python", "def f():\n    return 1\n")
    other = ("r/d", "pkg/other.py", "b" * 40, "python", "class Z:\n    pass\n")
    res = resolve(_files(spark, [row, row, other]), PipelineConfig())
    ids = [r.file_id for r in res.features.filter(F.col("path") == "pkg/mod.py").collect()]
    assert len(ids) == 2 and len(set(ids)) == 1
    mod_clusters = (
        res.clusters.join(
            res.features.filter(F.col("path") == "pkg/mod.py").select("file_id").distinct(),
            "file_id",
        )
        .select("cluster_id")
        .distinct()
        .count()
    )
    assert mod_clusters == 1


def test_whitespace_only_content_stays_apart_from_empty(spark):
    """All-whitespace and empty-string content normalize to the same empty
    norm_content but have DIFFERENT sha256 — they must not exact-merge, and
    degenerate-key guards keep them out of corpus-wide blocks."""
    rows = [
        ("r/w", "a/blank1.py", "a" * 40, "python", "   \n\t\n"),
        ("r/w", "b/blank2.py", "b" * 40, "python", ""),
        ("r/w", "c/code.py", "c" * 40, "python", "def f():\n    return 1\n"),
    ]
    res = resolve(_files(spark, rows), PipelineConfig())
    shas = [r.content_sha256 for r in res.features.collect()]
    assert len(set(shas)) == 3
    assert res.clusters.select("cluster_id").distinct().count() == 3
