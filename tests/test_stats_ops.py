"""Unit tests for the round-3 corpus-composition + embedding-mining
operators: perplexity buckets, corpus report, stratified sampling,
embedding decontamination, vocabulary coverage, contrastive mining."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.contrastive import contrastive_pairs
from entity_resolution_spark.operators.decontam import embedding_contamination
from entity_resolution_spark.operators.lm import perplexity_buckets
from entity_resolution_spark.operators.sampling import stratified_sample
from entity_resolution_spark.operators.stats import corpus_report
from entity_resolution_spark.operators.terms import vocab_coverage
from entity_resolution_spark.session import ensure_py_files


@pytest.fixture(scope="module", autouse=True)
def _py_files(spark):
    ensure_py_files(spark)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


# --- perplexity_buckets ----------------------------------------------------


def test_perplexity_buckets_terciles_and_unscored(spark):
    rows = [(i, f"alpha beta gamma token{i % 7} delta", "en", "s") for i in range(9)]
    rows += [(100, "solo", "en", "s"), (101, None, "en", "s")]
    out = perplexity_buckets(_docs(spark, rows)).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["doc_id"])
    # 9 scored docs -> exactly 3 per tercile; <2-token docs are unscored
    assert sorted(len(by_bucket[b]) for b in ("head", "middle", "tail")) == [3, 3, 3]
    assert sorted(by_bucket["unscored"]) == [100, 101]


def test_perplexity_buckets_head_is_lowest_ppl(spark):
    rows = [(i, f"alpha beta gamma token{i % 7} delta", "en", "s") for i in range(9)]
    out = perplexity_buckets(_docs(spark, rows))
    rows_out = out.filter(F.col("bucket") != "unscored").collect()
    head_max = max(r["perplexity"] for r in rows_out if r["bucket"] == "head")
    tail_min = min(r["perplexity"] for r in rows_out if r["bucket"] == "tail")
    assert head_max <= tail_min


def test_perplexity_buckets_approx_path_monotone(spark):
    # the 100TB (percentile-cutoff) plan: buckets must be monotone in
    # perplexity and roughly balanced; exact per-doc agreement with NTILE
    # is not guaranteed under ties (ties straddle NTILE bucket boundaries
    # but a value cutoff puts them all on one side)
    rows = [
        (i, "the quick brown fox " + " ".join(f"tok{i}_{j}" for j in range(i)), "en", "s")
        for i in range(30)
    ]  # progressively more singleton bigrams -> 30 distinct perplexities
    d = _docs(spark, rows)
    out = perplexity_buckets(d, exact=False).collect()
    ppls = {b: [r["perplexity"] for r in out if r["bucket"] == b] for b in ("head", "middle", "tail")}
    assert all(ppls[b] for b in ppls)
    assert max(ppls["head"]) <= min(ppls["middle"]) <= max(ppls["middle"]) <= min(ppls["tail"])


# --- corpus_report ---------------------------------------------------------


def test_corpus_report_counts_and_weights(spark):
    rows = [(i, "a b c", "en", "s1") for i in range(4)] + [(10, "x y", "de", "s2")]
    out = {(r["source"], r["lang"]): r for r in corpus_report(_docs(spark, rows)).collect()}
    assert out[("s1", "en")]["n_docs"] == 4
    assert out[("s1", "en")]["total_tokens"] == 12
    assert out[("s2", "de")]["total_tokens"] == 2
    assert out[("s1", "en")]["p50_chars"] == 5.0
    # alpha=0.5: weights 2/(2+1) and 1/(2+1)
    assert out[("s1", "en")]["mix_weight"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[("s2", "de")]["mix_weight"] == pytest.approx(1 / 3, abs=1e-6)
    total = sum(r["mix_weight"] for r in out.values())
    assert total == pytest.approx(1.0, abs=1e-5)


def test_corpus_report_null_text_counts_empty(spark):
    rows = [(1, None, "en", "s"), (2, "one two", "en", "s")]
    out = corpus_report(_docs(spark, rows)).collect()[0]
    assert out["n_docs"] == 2 and out["total_tokens"] == 2 and out["total_chars"] == 7


# --- stratified_sample -----------------------------------------------------


def test_stratified_sample_exact_quotas(spark):
    rows = [(i, "t", "en", f"s{i % 3}") for i in range(90)]  # 30 per stratum
    out = stratified_sample(_docs(spark, rows), "source", "doc_id", 0.2)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 6, "s1": 6, "s2": 6}


def test_stratified_sample_min_per_stratum_and_determinism(spark):
    rows = [(i, "t", "en", "big") for i in range(50)] + [(100, "t", "en", "tiny")]
    d = _docs(spark, rows)
    out1 = sorted(r["doc_id"] for r in stratified_sample(d, "source", "doc_id", 0.1).collect())
    out2 = sorted(
        r["doc_id"]
        for r in stratified_sample(d.repartition(7), "source", "doc_id", 0.1).collect()
    )
    assert out1 == out2  # partition-invariant
    assert 100 in out1  # tiny stratum keeps min 1 row
    assert len(out1) == 5 + 1


# --- embedding_contamination ------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_embedding_contamination_flags_planted_duplicate(spark):
    bench = _emb(spark, [(900, [1.0, 0.0, 0.0], 0), (901, [0.0, 1.0, 0.0], 0)]).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    corpus = _emb(
        spark,
        [
            (1, [2.0, 0.0, 0.0], 0),   # same direction as bench 900 -> cos 1.0
            (2, [0.0, 0.0, 5.0], 0),   # orthogonal to both -> cos 0.0
        ],
    ).select("vec_id", "embedding")
    out = {r["vec_id"]: r for r in embedding_contamination(
        corpus, bench, id_col="vec_id", bench_id_col="bench_id", threshold=0.95, n_buckets=4
    ).collect()}
    assert out[1]["bench_id"] == 900 and out[1]["max_cosine"] == 1.0 and out[1]["contaminated"]
    assert out[2]["max_cosine"] == 0.0 and not out[2]["contaminated"]


def test_embedding_contamination_tie_breaks_to_min_bench_id(spark):
    bench = _emb(spark, [(7, [1.0, 0.0], 0), (3, [1.0, 0.0], 0)]).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    corpus = _emb(spark, [(1, [3.0, 0.0], 0)]).select("vec_id", "embedding")
    out = embedding_contamination(
        corpus, bench, id_col="vec_id", bench_id_col="bench_id", n_buckets=2
    ).collect()
    assert out[0]["bench_id"] == 3


# --- vocab_coverage ---------------------------------------------------------


def test_vocab_coverage_hand_counts(spark):
    rows = [
        (1, "the the cat zzyzx", "en", "s"),
        (2, "the dog", "en", "s"),
        (3, "", "en", "s"),
    ]
    # top-2 vocab by freq: 'the' (3), then ties cat/dog/zzyzx (1 each) ->
    # lexicographic: 'cat'
    out = {r["doc_id"]: r for r in vocab_coverage(_docs(spark, rows), vocab_size=2).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1  # zzyzx OOV
    assert out[2]["n_tokens"] == 2 and out[2]["n_oov"] == 1  # dog OOV
    assert out[3]["n_tokens"] == 0 and out[3]["oov_rate"] is None
    assert out[1]["oov_rate"] == 0.25


# --- contrastive_pairs -------------------------------------------------------


def test_contrastive_pairs_picks_nearest_per_side(spark):
    corpus = _emb(
        spark,
        [
            (0, [1.0, 0.0], 1),      # query
            (1, [0.9, 0.1], 1),      # nearest same-label
            (2, [0.0, 1.0], 1),      # far same-label
            (3, [1.0, 0.05], 2),     # nearest diff-label
            (4, [-1.0, 0.0], 2),     # far diff-label
        ],
    )
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    out = {r["side"]: r for r in contrastive_pairs(q, corpus, id_col="vec_id", n_buckets=3).collect()}
    assert out["positive"]["vec_id"] == 1
    assert out["negative"]["vec_id"] == 3
    assert out["positive"]["cosine"] <= 1.0


def test_contrastive_pairs_excludes_self_and_handles_unique_label(spark):
    corpus = _emb(
        spark,
        [
            (0, [1.0, 0.0], 1),  # query; no other label-1 row exists
            (4, [0.5, 0.5], 2),
        ],
    )
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    rows = contrastive_pairs(q, corpus, id_col="vec_id", n_buckets=2).collect()
    assert {r["side"] for r in rows} == {"negative"}  # no positive candidate
    assert rows[0]["vec_id"] == 4


# --- dedup_size_histogram -----------------------------------------------------


def test_dedup_size_histogram_counts_singletons(spark):
    from entity_resolution_spark.operators.dedup import dedup_size_histogram

    text_a = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, text_a, "en", "s"),
        (2, text_a, "en", "s"),          # exact dup of 1 -> one size-2 cluster
        (3, "completely different content about distributed query engines and shuffles", "en", "s"),
    ]
    out = {r["cluster_size"]: r for r in dedup_size_histogram(_docs(spark, rows), min_jaccard=0.7).collect()}
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[1]["n_clusters"] == 1 and out[1]["n_docs"] == 1


# --- token_drift ---------------------------------------------------------------


def test_token_drift_flags_flooded_token(spark):
    from entity_resolution_spark.operators.stats import token_drift

    ref = _docs(spark, [(i, "the quick brown fox", "en", "s") for i in range(10)])
    new = _docs(
        spark,
        [(i, "the quick brown fox", "en", "s") for i in range(9)]
        + [(99, "spam spam spam spam spam spam", "en", "s")],
    )
    out = token_drift(ref, new, k=3).collect()
    assert out[0]["term"] == "spam"
    assert out[0]["c_ref"] == 0 and out[0]["c_new"] == 6
    assert out[0]["log_ratio"] > 0 and out[0]["drift"] > 0


def test_token_drift_identical_corpora_near_zero(spark):
    from entity_resolution_spark.operators.stats import token_drift

    d = _docs(spark, [(i, "alpha beta gamma", "en", "s") for i in range(5)])
    out = token_drift(d, d, k=10).collect()
    assert all(abs(r["drift"]) < 1e-9 for r in out)


# --- kmeans_assign ---------------------------------------------------------------


def test_kmeans_separates_obvious_clusters(spark):
    from entity_resolution_spark.operators.kmeans import kmeans_assign

    # even ids point along x, odd ids along y — the content-addressed init
    # (two smallest ids) seeds one cell in each group
    rows = [(2 * i, [1.0 + 0.01 * i, 0.0], 0) for i in range(5)]
    rows += [(2 * i + 1, [0.0, 1.0 + 0.01 * i], 0) for i in range(5)]
    out = {r["vec_id"]: r["cell"] for r in kmeans_assign(_emb(spark, rows), k=2, iters=3).collect()}
    group_a = {out[2 * i] for i in range(5)}
    group_b = {out[2 * i + 1] for i in range(5)}
    assert len(group_a) == 1 and len(group_b) == 1 and group_a != group_b


def test_kmeans_partition_invariant(spark):
    from entity_resolution_spark.operators.kmeans import kmeans_assign

    rows = [(i, [float((i * 7) % 13), float((i * 3) % 11), float(i % 5)], 0) for i in range(40)]
    d = _emb(spark, rows)
    a = sorted((r["vec_id"], r["cell"], r["cosine"]) for r in kmeans_assign(d, k=4, iters=2).collect())
    b = sorted(
        (r["vec_id"], r["cell"], r["cosine"])
        for r in kmeans_assign(d.repartition(7), k=4, iters=2).collect()
    )
    assert a == b


# --- cluster_balanced_sample -----------------------------------------------------


def test_cluster_balanced_sample_caps_and_orders(spark):
    from entity_resolution_spark.operators.kmeans import cluster_balanced_sample

    # two obvious groups (x-axis / y-axis); ids 0 and 1 seed one cell each
    rows = [(2 * i, [1.0 + 0.01 * i, 0.0], 0) for i in range(6)]
    rows += [(2 * i + 1, [0.0, 1.0 + 0.01 * i], 0) for i in range(6)]
    out = cluster_balanced_sample(_emb(spark, rows), per_cell=2, k=2, iters=2).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    assert len(by_cell) == 2
    for rs in by_cell.values():
        assert len(rs) == 2 and sorted(r["rank"] for r in rs) == [1, 2]
        # prototypical order: rank 1 has the highest cosine
        assert rs[0]["cosine"] >= rs[1]["cosine"] or rs[0]["rank"] > rs[1]["rank"]


def test_cluster_balanced_sample_hard_is_reversed(spark):
    from entity_resolution_spark.operators.kmeans import cluster_balanced_sample

    rows = [(i, [float((i * 7) % 13), float((i * 3) % 11), 1.0], 0) for i in range(20)]
    proto = cluster_balanced_sample(_emb(spark, rows), per_cell=1, k=2, iters=2).collect()
    hard = cluster_balanced_sample(
        _emb(spark, rows), per_cell=1, k=2, iters=2, keep="hard"
    ).collect()
    p = {r["cell"]: r["cosine"] for r in proto}
    h = {r["cell"]: r["cosine"] for r in hard}
    assert all(h[c] <= p[c] for c in p)


def test_cluster_balanced_sample_rejects_bad_keep(spark):
    from entity_resolution_spark.operators.kmeans import cluster_balanced_sample

    with pytest.raises(ValueError):
        cluster_balanced_sample(_emb(spark, [(1, [1.0], 0)]), per_cell=1, keep="nope")


# --- embedding_drift --------------------------------------------------------------


def test_embedding_drift_flags_new_mass(spark):
    from entity_resolution_spark.operators.kmeans import embedding_drift

    # A: balanced x/y groups; B: all mass on the y direction
    a = [(2 * i, [1.0 + 0.01 * i, 0.0], 0) for i in range(5)]
    a += [(2 * i + 1, [0.0, 1.0 + 0.01 * i], 0) for i in range(5)]
    b = [(100 + i, [0.0, 2.0 + 0.01 * i], 0) for i in range(6)]
    out = embedding_drift(_emb(spark, a), _emb(spark, b), k=2, iters=2).collect()
    by_cell = {r["cell"]: r for r in out}
    assert len(by_cell) == 2
    # shares sum to 1 on each side; one cell gained all of B's mass
    assert abs(sum(r["share_a"] for r in out) - 1.0) < 1e-6
    assert abs(sum(r["share_b"] for r in out) - 1.0) < 1e-6
    gained = max(out, key=lambda r: r["delta"])
    assert gained["share_b"] == 1.0 and gained["n_b"] == 6
    lost = min(out, key=lambda r: r["delta"])
    assert lost["n_b"] == 0 and lost["share_b"] == 0.0


def test_embedding_drift_identical_snapshots_zero_delta(spark):
    from entity_resolution_spark.operators.kmeans import embedding_drift

    rows = [(i, [float((i * 7) % 13), float((i * 3) % 11), 1.0], 0) for i in range(20)]
    d = _emb(spark, rows)
    out = embedding_drift(d, d, k=3, iters=2).collect()
    assert all(r["delta"] == 0.0 and r["n_a"] == r["n_b"] for r in out)


def test_kmeans_k_exceeds_n_and_zero_vectors(spark):
    from entity_resolution_spark.operators.kmeans import kmeans_assign

    rows = [(1, [1.0, 0.0], 0), (2, [0.0, 0.0], 0), (3, [1.0, 0.1], 0)]
    out = {r["vec_id"]: r for r in kmeans_assign(_emb(spark, rows), k=8, iters=2).collect()}
    # every vector labeled exactly once; zero vector scores -1 against every
    # cell and ties to the smallest; k>n shrinks to at most n cells
    assert len(out) == 3
    assert out[2]["cosine"] == -1.0 and out[2]["cell"] == 0
    assert all(0 <= r["cell"] < 3 for r in out.values())
    # non-zero vectors keep their own seed cell (each seeded one)
    assert out[1]["cosine"] == 1.0 and out[3]["cosine"] == 1.0


def test_kmeans_all_identical_vectors_single_cell(spark):
    from entity_resolution_spark.operators.kmeans import kmeans_assign

    rows = [(i, [1.0, 2.0, 3.0], 0) for i in range(6)]
    out = kmeans_assign(_emb(spark, rows), k=3, iters=2).collect()
    # identical vectors: every id picks the same (tie -> smallest) cell
    assert len({r["cell"] for r in out}) == 1
    assert all(r["cosine"] == 1.0 for r in out)


def test_zipf_fit_detects_zipfian_corpus(spark):
    """Frequencies ~ 1000/rank give ln(freq) = ln(1000) - ln(rank):
    slope ~= -1 with near-perfect r^2."""
    from entity_resolution_spark.operators.stats import zipf_fit

    words = []
    for i in range(1, 21):
        words += ["w" + chr(96 + i)] * round(1000 / i)  # wa, wb, ... wt
    d = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    r = zipf_fit(d).collect()[0]
    assert r["n_types"] == 20
    assert abs(r["zipf_slope"] + 1.0) < 0.02
    assert r["zipf_r2"] > 0.999


def test_zipf_fit_uniform_corpus_flat_slope(spark):
    """All types equally frequent: ln(freq) constant -> slope 0, r^2 0
    (den_y = 0 -> NULL r^2 by the <2-variance guard)."""
    from entity_resolution_spark.operators.stats import zipf_fit

    d = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 10)], "doc_id long, text string"
    )
    r = zipf_fit(d).collect()[0]
    assert r["n_types"] == 4 and r["n_tokens"] == 40
    assert abs(r["zipf_slope"]) < 1e-4  # micro-unit quantization noise
    # y-variance is ~0 (only independent-rounding residue survives the
    # micro quantization): r^2 is either NULLed by the guard or ~0
    assert r["zipf_r2"] is None or r["zipf_r2"] < 1e-3


def test_zipf_fit_partition_invariant(spark):
    from entity_resolution_spark.operators.stats import zipf_fit

    rows = [(i, "the quick brown fox " * (1 + i % 5)) for i in range(50)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    a = zipf_fit(d).collect()[0]
    b = zipf_fit(d.repartition(7)).collect()[0]
    assert tuple(a) == tuple(b)


def test_hll_accuracy_and_duplicate_insensitivity(spark):
    """5000 distinct values: p=12 HLL estimates within a few percent
    (theoretical sigma ~1.04/sqrt(4096) = 1.6%); feeding every value
    twice changes NO register."""
    from entity_resolution_spark.operators.stats import hll_count_distinct

    vals = [(f"value{i}",) for i in range(5000)]
    d = spark.createDataFrame(vals, "val string")
    r = hll_count_distinct(d, "val").collect()[0]
    assert abs(r["estimate"] - 5000) / 5000 < 0.05
    dup = spark.createDataFrame(vals + vals, "val string")
    r2 = hll_count_distinct(dup, "val").collect()[0]
    assert (r2["register_sum"], r2["nonzero_buckets"], r2["estimate"]) == (
        r["register_sum"],
        r["nonzero_buckets"],
        r["estimate"],
    )


def test_hll_small_range_linear_counting_and_nulls(spark):
    """Tiny cardinalities ride the linear-counting correction (estimate
    close to truth even at n << m); NULLs are ignored."""
    from entity_resolution_spark.operators.stats import hll_count_distinct

    d = spark.createDataFrame(
        [("a",), ("b",), ("c",), (None,), ("a",)], "val string"
    )
    r = hll_count_distinct(d, "val").collect()[0]
    assert r["nonzero_buckets"] == 3
    assert abs(r["estimate"] - 3) < 0.01


def test_hll_partition_invariant(spark):
    from entity_resolution_spark.operators.stats import hll_count_distinct

    d = spark.createDataFrame([(f"v{i}",) for i in range(2000)], "val string")
    a = tuple(hll_count_distinct(d, "val").collect()[0])
    b = tuple(hll_count_distinct(d.repartition(9), "val").collect()[0])
    assert a == b


def test_hll_p_bounds(spark):
    import pytest as _pytest

    from entity_resolution_spark.operators.stats import hll_count_distinct

    d = spark.createDataFrame([("a",)], "val string")
    with _pytest.raises(ValueError):
        hll_count_distinct(d, "val", p=4)


def test_bloom_no_false_negatives_and_low_fp(spark):
    from entity_resolution_spark.operators.bloom import bloom_build, bloom_probe

    keys = spark.createDataFrame([(f"key{i}",) for i in range(500)], "k string")
    bloom = bloom_build(keys, "k")  # m=65536, k=4 -> FP ~ 1e-6
    probe = spark.createDataFrame(
        [(f"key{i}",) for i in range(500)] + [(f"other{i}",) for i in range(2000)],
        "k string",
    )
    out = {r["k"]: r["member"] for r in bloom_probe(probe, bloom, "k").collect()}
    assert all(out[f"key{i}"] == 1 for i in range(500))  # no false negatives
    fps = sum(out[f"other{i}"] for i in range(2000))
    assert fps <= 2  # expected ~0.002 at this load


def test_bloom_small_filter_shows_false_positives_only(spark):
    """Undersized filter (m=256, k=2, n=100): real FP rate ~0.3 appears,
    but never a false negative."""
    from entity_resolution_spark.operators.bloom import bloom_build, bloom_probe

    keys = spark.createDataFrame([(f"key{i}",) for i in range(100)], "k string")
    bloom = bloom_build(keys, "k", m=256, k=2)
    probe = spark.createDataFrame(
        [(f"key{i}",) for i in range(100)] + [(f"no{i}",) for i in range(500)],
        "k string",
    )
    out = {r["k"]: r["member"] for r in bloom_probe(probe, bloom, "k", m=256, k=2).collect()}
    assert all(out[f"key{i}"] == 1 for i in range(100))
    fps = sum(out[f"no{i}"] for i in range(500))
    assert 0 < fps < 400  # FPs exist but most non-members still rejected


def test_bloom_null_keys_and_k_bounds(spark):
    import pytest as _pytest

    from entity_resolution_spark.operators.bloom import bloom_build, bloom_probe

    keys = spark.createDataFrame([("a",), (None,)], "k string")
    bloom = bloom_build(keys, "k")
    assert bloom.count() == 4  # only 'a' contributes positions
    with _pytest.raises(ValueError):
        bloom_build(keys, "k", k=5)
    with _pytest.raises(ValueError):
        bloom_probe(keys, bloom, "k", k=0)


def test_cm_sketch_never_underestimates_and_exact_when_sparse(spark):
    """31 types in a w=2048 sketch: no collisions expected -> estimates
    exactly equal true counts; a deliberately tiny sketch still never
    underestimates."""
    from entity_resolution_spark.operators.bloom import cm_estimate, cm_sketch_build

    vals = [(f"t{chr(97 + i % 26)}{i}",) for i in range(300) for _ in range(1 + i % 3)]
    d = spark.createDataFrame(vals, "val string")
    true = {r["val"]: r["n"] for r in d.groupBy("val").agg(F.count("*").alias("n")).collect()}
    vocab = d.distinct()

    exact = cm_estimate(vocab, cm_sketch_build(d, "val"), "val")
    got = {r["val"]: r["est_count"] for r in exact.collect()}
    # w=2048 >> 300 types: all-4-row collisions are ~4e-4/key — nearly all
    # estimates are exact, none underestimates
    assert all(got[k] >= v for k, v in true.items())
    assert sum(got[k] > v for k, v in true.items()) <= 3

    tiny = cm_estimate(
        vocab, cm_sketch_build(d, "val", w=16, d=2), "val", w=16, d=2
    )
    got_tiny = {r["val"]: r["est_count"] for r in tiny.collect()}
    assert all(got_tiny[k] >= v for k, v in true.items())
    assert any(got_tiny[k] > v for k, v in true.items())  # collisions visible


def test_cm_sketch_unseen_key_reads_zero_and_partition_invariant(spark):
    from entity_resolution_spark.operators.bloom import cm_estimate, cm_sketch_build

    d = spark.createDataFrame([("a",), ("a",), ("b",)], "val string")
    sketch = cm_sketch_build(d, "val")
    probe = spark.createDataFrame([("a",), ("zz_unseen",)], "val string")
    got = {r["val"]: r["est_count"] for r in cm_estimate(probe, sketch, "val").collect()}
    assert got["a"] == 2 and got["zz_unseen"] == 0
    big = spark.createDataFrame([(f"v{i % 50}",) for i in range(500)], "val string")
    s1 = sorted(map(tuple, cm_estimate(big.distinct(), cm_sketch_build(big, "val"), "val").collect()))
    s2 = sorted(map(tuple, cm_estimate(big.distinct(), cm_sketch_build(big.repartition(9), "val"), "val").collect()))
    assert s1 == s2


def test_iqr_outliers_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import iqr_outliers

    # group "a": values 1..9 plus 100 -> q25=3.25, q75=7.75, iqr=4.5
    rows = [Row(g="a", v=float(x)) for x in range(1, 10)] + [
        Row(g="a", v=100.0),
        Row(g="b", v=5.0),
        Row(g="b", v=None),
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r["g"], r["v"]): (r["is_outlier"], r["q25"], r["q75"])
        for r in iqr_outliers(df, "v", ["g"], k=1.5).collect()
    }
    # exact percentiles over 1..9,100: q25 = 3.25, q75 = 7.75 (type R-7)
    assert out[("a", 100.0)][0] is True
    assert out[("a", 5.0)] == (False, 3.25, 7.75)
    assert out[("b", 5.0)][0] is False
    assert out[("b", None)][0] is False  # NULL never flagged


def test_iqr_outliers_ungrouped(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import iqr_outliers

    df = spark.createDataFrame([Row(v=float(x)) for x in [1, 2, 3, 4, 1000]])
    flagged = [r["v"] for r in iqr_outliers(df, "v").collect() if r["is_outlier"]]
    assert flagged == [1000.0]


def test_key_skew_report_and_summary(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import (
        key_skew_report,
        key_skew_summary,
    )

    rows = (
        [Row(k="hot")] * 60 + [Row(k="warm")] * 30 + [Row(k="a")] * 5 + [Row(k="b")] * 5
    )
    df = spark.createDataFrame(rows).repartition(4)
    top = {
        r["k"]: (r["cnt"], r["share"], r["cum_share"], r["rank"])
        for r in key_skew_report(df, ["k"], top_k=3).collect()
    }
    assert top["hot"] == (60, 0.6, 0.6, 1)
    assert top["warm"] == (30, 0.3, 0.9, 2)
    assert top["a"] == (5, 0.05, 0.95, 3)  # tie with b broken by key ASC
    assert "b" not in top

    s = key_skew_summary(df, ["k"]).collect()[0]
    assert s["n_rows"] == 100 and s["n_keys"] == 4 and s["max_cnt"] == 60
    assert s["mean_cnt"] == 25.0 and s["p50_cnt"] == 17.5
    assert s["skew_ratio"] == 2.4
    assert s["recommended_salt"] == 4  # ceil(60 / 17.5)

    import pytest

    with pytest.raises(ValueError):
        key_skew_report(df, [])


def test_schema_drift_report_statuses_and_deltas(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.schema_drift import schema_drift_report

    old = spark.createDataFrame(
        [Row(a=1, b="x", gone=1.0), Row(a=2, b=None, gone=2.0)]
    )
    new = spark.createDataFrame(
        [
            Row(a=1, b="x", fresh=True),
            Row(a=1, b="y", fresh=None),
            Row(a=3, b="z", fresh=False),
        ]
    ).withColumn("a", __import__("pyspark.sql.functions", fromlist=["col"]).col("a").cast("int"))
    got = {r["column"]: r.asDict() for r in schema_drift_report(old, new).collect()}
    assert got["gone"]["status"] == "removed" and got["gone"]["null_rate_new"] is None
    assert got["fresh"]["status"] == "added" and got["fresh"]["null_rate_new"] == round(1 / 3, 6)
    assert got["a"]["status"] == "common" and got["a"]["type_changed"] is True
    assert got["a"]["distinct_old"] == 2 and got["a"]["distinct_new"] == 2
    assert got["b"]["null_rate_old"] == 0.5 and got["b"]["null_rate_new"] == 0.0
    assert got["b"]["null_rate_delta"] == -0.5


def test_ab_test_report_hand_z(spark):
    import math

    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import ab_test_report

    rows = [Row(v="A", x=float(x)) for x in (10, 12, 14, 16)] + [
        Row(v="B", x=float(x)) for x in (9, 10, 11)
    ] + [Row(v="B", x=None)]
    df = spark.createDataFrame(rows)
    r = ab_test_report(df, "v", "x").collect()[0]
    ma, mb = 13.0, 10.0
    sa = sum((x - ma) ** 2 for x in (10, 12, 14, 16)) / 3
    sb = sum((x - mb) ** 2 for x in (9, 10, 11)) / 2
    z = (ma - mb) / math.sqrt(sa / 4 + sb / 3)
    assert (r["variant_a"], r["variant_b"], r["n_a"], r["n_b"]) == ("A", "B", 4, 3)
    assert r["mean_a"] == 13.0 and r["mean_b"] == 10.0 and r["mean_diff"] == 3.0
    assert abs(r["z_score"] - round(z, 6)) < 2e-6
    assert r["significant"] == (abs(z) >= 1.96)


def test_ols_trend_exact_line_and_degenerate(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import ols_trend

    rows = [Row(g="lin", x=float(x), y=3.0 * x + 7.0) for x in range(5)] + [
        Row(g="flat", x=1.0, y=9.0),
        Row(g="flat", x=1.0, y=11.0),  # constant x -> NULL fit
        Row(g="lin", x=None, y=1.0),   # excluded
    ]
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in ols_trend(spark.createDataFrame(rows), "x", "y", ["g"]).collect()
    }
    assert got["lin"] == (5, 3.0, 7.0, 1.0)
    assert got["flat"] == (2, None, None, None)


def test_chi_square_independence_hand_table(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import chi_square_independence

    # 2x2 table: a/x 30, a/y 10, b/x 10, b/y 30 -> chi2 = 20, V = sqrt(20/80)
    rows = (
        [Row(a="a", b="x")] * 30
        + [Row(a="a", b="y")] * 10
        + [Row(a="b", b="x")] * 10
        + [Row(a="b", b="y")] * 30
    )
    r = chi_square_independence(spark.createDataFrame(rows), "a", "b").collect()[0]
    assert r["n"] == 80 and r["df_degrees"] == 1
    assert r["chi2"] == 20.0
    assert abs(r["cramers_v"] - (20.0 / 80.0) ** 0.5) < 2e-6


def test_weighted_median_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import weighted_median

    rows = [
        Row(g="a", v=1.0, w=1.0),
        Row(g="a", v=2.0, w=1.0),
        Row(g="a", v=3.0, w=10.0),  # heavy tail value dominates
        Row(g="b", v=5.0, w=2.0),
        Row(g="b", v=7.0, w=2.0),  # exact half at v=5 -> lower median
        Row(g="c", v=9.0, w=0.0),  # non-positive weight excluded
        Row(g="c", v=4.0, w=1.0),
        Row(g="c", v=None, w=3.0),
    ]
    got = {
        r["g"]: (r["total_weight"], r["weighted_median"])
        for r in weighted_median(
            spark.createDataFrame(rows), "v", "w", ["g"]
        ).collect()
    }
    assert got["a"] == (12.0, 3.0)
    assert got["b"] == (4.0, 5.0)  # cum(5)=2, 2*2>=4 -> lower median
    assert got["c"] == (1.0, 4.0)


class TestJoinSizeEstimate:
    def test_matches_actual_join_and_ranks_keys(self, spark):
        from entity_resolution_spark.operators.stats import join_size_estimate

        left = spark.createDataFrame(
            [(k, i) for k in ["a", "a", "a", "b", "c"] for i in range(2)],
            "k string, x long",
        )
        right = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 1), ("d", 9)], "k string, y long"
        )
        out = join_size_estimate(left, right, ["k"], top_k=2).collect()
        summary = [r for r in out if r["key"] is None][0]
        actual = left.join(right, "k").count()
        assert summary["output_rows"] == actual  # 6*2 + 2*1 = 14
        assert summary["n_keys"] == 2
        tops = [r for r in out if r["key"] is not None]
        assert [r["key"] for r in tops] == ["a", "b"]
        assert tops[0]["left_rows"] == 6 and tops[0]["right_rows"] == 2

    def test_disjoint_keys_zero(self, spark):
        from entity_resolution_spark.operators.stats import join_size_estimate

        a = spark.createDataFrame([("x", 1)], "k string, v long")
        b = spark.createDataFrame([("y", 1)], "k string, v long")
        out = join_size_estimate(a, b, ["k"]).collect()
        summary = [r for r in out if r["key"] is None][0]
        assert summary["n_keys"] == 0
        assert summary["output_rows"] is None or summary["output_rows"] == 0


def test_pareto_frontier_matches_bruteforce(spark):
    import random

    from entity_resolution_spark.operators.stats import pareto_frontier_2d

    rng = random.Random(7)
    pts = [(i, float(rng.randint(0, 20)), rng.randint(0, 20)) for i in range(200)]
    # planted exact ties on the frontier: identical points must BOTH survive
    pts += [(900, -1.0, 30), (901, -1.0, 30)]
    df = spark.createDataFrame(pts, "id long, x double, y long").repartition(5)
    got = {r["id"] for r in pareto_frontier_2d(df, "x", "y").collect()}
    want = {
        i
        for (i, x, y) in pts
        if not any(
            (qx <= x and qy <= y and (qx < x or qy < y)) for (_, qx, qy) in pts
        )
    }
    assert got == want
    assert {900, 901} <= got


def test_ks_statistic_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import ks_statistic

    # A = {1,2,3,4}, B = {3,4,5,6}: CDF gap peaks at value 2 -> |2/4 - 0| = 0.5
    rows = [Row(g="x", v=float(v), a=True) for v in [1, 2, 3, 4]]
    rows += [Row(g="x", v=float(v), a=False) for v in [3, 4, 5, 6]]
    # identical samples -> D = 0
    rows += [Row(g="y", v=float(v), a=True) for v in [1, 2]]
    rows += [Row(g="y", v=float(v), a=False) for v in [1, 2]]
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["g"]: r for r in ks_statistic(df, "v", "a", by=["g"]).collect()}
    assert out["x"]["ks_d"] == 0.5 and out["x"]["n_a"] == 4
    assert out["y"]["ks_d"] == 0.0


def test_benford_report_digits_exact(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import benford_report

    vals = [1.2, 15.0, 199.9, 2.0, 25.0, 900.0, 0.5]  # 0.5 excluded (< 1)
    df = spark.createDataFrame([Row(x=v) for v in vals]).repartition(2)
    out = {r["digit"]: r for r in benford_report(df, "x").collect()}
    assert out["1"]["n_obs"] == 3 and out["2"]["n_obs"] == 2
    assert out["9"]["n_obs"] == 1 and "0" not in out and "5" not in out
    assert out["1"]["benford_p"] == 0.30103
    assert abs(out["1"]["obs_p"] - 0.5) < 1e-9  # 3 of 6 qualifying rows


def test_rfm_segments_hand_tiles(spark):
    import datetime

    import pytest
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import rfm_segments

    d0 = datetime.datetime(2024, 6, 30)

    def o(k, days_ago, amt):
        return Row(k=k, ts=d0 - datetime.timedelta(days=days_ago), amt=amt)

    rows = [o(1, 0, 100.0), o(1, 10, 100.0)]   # recent, 2 orders, 200
    rows += [o(2, 5, 50.0)]                     # 1 order, 50
    rows += [o(3, 30, 400.0)]                   # old, 1 order, 400
    rows += [o(4, 60, 10.0)]                    # oldest, 1 order, 10
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["k"]: r for r in rfm_segments(df, "k", "ts", "amt").collect()}
    assert out[1]["recency_days"] == 0 and out[4]["recency_days"] == 60
    assert out[1]["frequency"] == 2 and out[1]["monetary"] == 200.0
    # 4 keys, 4 tiles -> each tile has exactly one key per dimension
    assert [out[k]["r_q"] for k in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert out[1]["f_q"] == 1  # only multi-order key
    assert [out[k]["m_q"] for k in (3, 1, 2, 4)] == [1, 2, 3, 4]
    with pytest.raises(ValueError):
        rfm_segments(df, "k", "ts", "amt", n_tiles=0)


def test_correlation_report_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import correlation_report

    # y = x^2 on positive x: perfectly monotone (spearman == 1) but not
    # linear (pearson < 1); z is anti-monotone with ties in the middle.
    rows = [
        Row(x=1.0, y=1.0, z=4.0),
        Row(x=2.0, y=4.0, z=3.0),
        Row(x=3.0, y=9.0, z=3.0),
        Row(x=4.0, y=16.0, z=1.0),
        Row(x=5.0, y=25.0, z=None),  # listwise-dropped
    ]
    df = spark.createDataFrame(rows).repartition(3)
    out = {(r["col_x"], r["col_y"]): r for r in correlation_report(df, ["x", "y", "z"]).collect()}
    assert len(out) == 3 and all(r["n_rows"] == 4 for r in out.values())
    xy = out[("x", "y")]
    assert xy["spearman"] == 1.0 and 0 < xy["pearson"] < 1
    # x vs z: ranks x=(1,2,3,4), z=(4, 2.5, 2.5, 1) -> strong negative
    xz = out[("x", "z")]
    assert xz["spearman"] < -0.9 and xz["pearson"] < -0.9
    import pytest

    with pytest.raises(ValueError):
        correlation_report(df, ["x"])


def test_correlation_constant_column_null(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import correlation_report

    df = spark.createDataFrame([Row(x=float(i), c=7.0) for i in range(5)])
    r = correlation_report(df, ["x", "c"]).collect()[0]
    assert r["pearson"] is None and r["spearman"] is None


def test_mann_whitney_u_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import mann_whitney_u

    # A = {1, 2, 3}, B = {4, 5, 6}: complete separation -> U_a = 0, U_b = 9.
    rows = [Row(g="a", v=float(v)) for v in [1, 2, 3]]
    rows += [Row(g="b", v=float(v)) for v in [4, 5, 6]]
    rows += [Row(g="other", v=100.0), Row(g="a", v=None)]  # excluded
    df = spark.createDataFrame(rows).repartition(3)
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["u_a"] == 0.0 and r["u_b"] == 9.0
    assert r["z"] < -1.9  # -(4.5)/sqrt(5.25) = -1.963961
    assert abs(r["z"] + 1.963961) < 1e-6


def test_mann_whitney_u_ties_exact(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import mann_whitney_u

    # A = {1, 2, 2}, B = {2, 3}: ranks 1, 3, 3, 3, 5 (three-way tie at 2).
    # R_a = 1 + 3 + 3 = 7 -> U_a = 7 - 6 = 1; U_b = 6 - 1 = 5.
    rows = [Row(g="a", v=v) for v in [1.0, 2.0, 2.0]]
    rows += [Row(g="b", v=v) for v in [2.0, 3.0]]
    df = spark.createDataFrame(rows).repartition(2)
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert r["u_a"] == 1.0 and r["u_b"] == 5.0
    # tie correction: sigma^2 = (6/12)*(6 - 24/20) = 2.4; z = (1-3)/sqrt(2.4)
    assert abs(r["z"] + 2 / 2.4**0.5) < 1e-6


def test_gini_report_extremes(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import gini_report

    rows = [Row(g="equal", v=5.0) for _ in range(4)]
    rows += [Row(g="onehot", v=0.0), Row(g="onehot", v=0.0),
             Row(g="onehot", v=0.0), Row(g="onehot", v=12.0)]
    rows += [Row(g="skip", v=-1.0), Row(g="skip", v=None), Row(g="skip", v=2.0)]
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["g"]: r for r in gini_report(df, ["g"], "v").collect()}
    assert out["equal"]["gini"] == 0.0 and out["equal"]["n_rows"] == 4
    # one row holds everything: gini = (n-1)/n = 0.75
    assert out["onehot"]["gini"] == 0.75
    assert out["skip"]["n_rows"] == 1  # negative + NULL excluded
    assert out["skip"]["gini"] == 0.0


def test_avg_rank_census_matches_naive(spark):
    import random

    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import _avg_rank_census

    rng = random.Random(7)
    vals = [rng.randint(0, 20) for _ in range(200)]
    from collections import Counter

    cnt = Counter(vals)
    census = spark.createDataFrame(
        [Row(v=float(k), n=c) for k, c in cnt.items()]
    ).repartition(5)
    got = {r["v"]: r["avg_rank"] for r in _avg_rank_census(census, "v", "n", num_ranges=4).collect()}
    # naive: average of the 1-based positions each tied run occupies
    ordered = sorted(vals)
    import statistics

    want = {}
    for k in cnt:
        pos = [i + 1 for i, v in enumerate(ordered) if v == k]
        want[float(k)] = statistics.mean(pos)
    assert got == want


def test_mutual_information_hand_values(spark):
    import math

    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import mutual_information

    # perfectly dependent: y == x -> MI == H(x) == H(y), NMI == 1
    dep = spark.createDataFrame(
        [Row(x=c, y=c) for c in ["a", "a", "b", "b"]]
    ).repartition(3)
    r = mutual_information(dep, "x", "y").collect()[0]
    assert r["n_rows"] == 4
    assert r["mi"] == r["h_x"] == r["h_y"] == round(math.log(2), 6)
    assert r["nmi"] == 1.0

    # independent 2x2 with equal counts -> MI == 0
    ind = spark.createDataFrame(
        [Row(x=x, y=y) for x in ["a", "b"] for y in ["c", "d"]]
    ).repartition(2)
    r = mutual_information(ind, "x", "y").collect()[0]
    assert r["mi"] == 0.0 and r["h_xy"] == round(math.log(4), 6)

    # constant x -> H(x) = 0 -> NMI undefined (NULL)
    const = spark.createDataFrame([Row(x="k", y=str(i)) for i in range(3)])
    r = mutual_information(const, "x", "y").collect()[0]
    assert r["h_x"] == 0.0 and r["nmi"] is None


def test_mutual_information_null_category(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import mutual_information

    # NULL in x is its own category, perfectly predicting y='z'
    df = spark.createDataFrame(
        [Row(x="a", y="c"), Row(x="a", y="c"), Row(x=None, y="z"), Row(x=None, y="z")]
    )
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["n_rows"] == 4 and r["nmi"] == 1.0


def test_association_rules_basket_cap(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.basket import (
        association_rules,
        oversized_baskets,
    )

    rows = [Row(b=1, i=i) for i in ["x", "y"]]          # small basket
    rows += [Row(b=2, i=i) for i in ["x", "y"]]         # small basket
    rows += [Row(b=3, i=i) for i in ["x", "y", "z", "w"]]  # oversized
    df = spark.createDataFrame(rows).repartition(3)
    uncapped = association_rules(df, "b", "i", min_support=1)
    capped = association_rules(df, "b", "i", min_support=1, max_basket_size=2)
    # cap removes basket 3: only the x<->y rules remain, support over 2 baskets
    out = {(r["item_a"], r["item_b"]): r for r in capped.collect()}
    assert set(out) == {("x", "y"), ("y", "x")}
    assert out[("x", "y")]["n_baskets"] == 2 and out[("x", "y")]["support"] == 1.0
    assert uncapped.where("item_a = 'z'").count() > 0
    dropped = oversized_baskets(df, "b", "i", max_basket_size=2).collect()
    assert [(r["basket"], r["n_items"]) for r in dropped] == [(3, 4)]


def test_kaplan_meier_hand_curve(spark):
    import datetime

    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import kaplan_meier

    d0 = datetime.datetime(2024, 1, 1)

    def e(u, day):
        return Row(u=u, ts=d0 + datetime.timedelta(days=day))

    # horizon = day 30. u1: dies at duration 10; u2: active to the end
    # (censored, duration 30); u3: one event at day 5 (duration 0, dies);
    # u4: last seen day 28 (< 7 days quiet -> censored, duration 28)
    rows = [e(1, 0), e(1, 10), e(2, 0), e(2, 30), e(3, 5), e(4, 0), e(4, 28)]
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["duration_days"]: r for r in kaplan_meier(df, "u", "ts", censor_days=7).collect()}
    assert set(out) == {0, 10, 28, 30}
    assert out[0]["n_at_risk"] == 4 and out[0]["n_events"] == 1
    assert out[0]["survival"] == 0.75
    assert out[10]["n_at_risk"] == 3 and out[10]["survival"] == 0.5
    assert out[28]["n_censored"] == 1 and out[28]["survival"] == 0.5
    assert out[30]["n_at_risk"] == 1 and out[30]["survival"] == 0.5
    import pytest

    with pytest.raises(ValueError):
        kaplan_meier(df, "u", "ts", censor_days=-1)


def test_diff_in_diff_hand_values(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from entity_resolution_spark.operators.stats import diff_in_diff

    rows = [Row(g="t", per="pre", v=1.0), Row(g="t", per="pre", v=1.0),
            Row(g="t", per="post", v=5.0),
            Row(g="c", per="pre", v=2.0),
            Row(g="c", per="post", v=3.0),
            Row(g="c", per="post", v=None)]  # NULL outcome excluded
    df = spark.createDataFrame(rows).repartition(2)
    r = diff_in_diff(
        df, treated=F.col("g") == "t", post=F.col("per") == "post", value="v"
    ).collect()[0]
    assert r["n_rows"] == 5
    assert (r["treat_pre"], r["treat_post"], r["ctrl_pre"], r["ctrl_post"]) == (1.0, 5.0, 2.0, 3.0)
    assert r["did"] == 3.0


def test_histogram_report_bins(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import histogram_report

    rows = [Row(g="a", v=v) for v in [0.5, 1.5, 1.9, -0.1, None]]
    df = spark.createDataFrame(rows).repartition(2)
    out = {r["bin_lo"]: r for r in histogram_report(df, "v", by=["g"]).collect()}
    # floor toward -inf: -0.1 lands in bin -1.0
    assert set(out) == {-1.0, 0.0, 1.0}
    assert out[1.0]["n_obs"] == 2 and out[1.0]["frac"] == 0.5
    assert out[-1.0]["n_obs"] == 1
    import pytest

    with pytest.raises(ValueError):
        histogram_report(df, "v", bin_width=0)


def test_hll_grouped_merge_equals_direct(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from entity_resolution_spark.operators.stats import (
        hll_estimate_by,
        hll_grouped_registers,
        hll_registers,
    )

    rows = [Row(g=f"g{i % 3}", v=f"item-{i}") for i in range(900)]
    df = spark.createDataFrame(rows).repartition(4)
    regs = hll_grouped_registers(df, ["g"], "v", p=10)
    merged = regs.groupBy("bucket").agg(F.max("M").alias("M"))
    direct = hll_registers(df, "v", p=10)
    # max-merge of per-group register files == the union's register file,
    # register-for-register
    m = {(r["bucket"], r["M"]) for r in merged.collect()}
    d = {(r["bucket"], r["M"]) for r in direct.collect()}
    assert m == d
    est = {r["g"]: r["estimate"] for r in hll_estimate_by(regs, ["g"], p=10).collect()}
    # disjoint thirds: each group estimates ~300
    for g in ("g0", "g1", "g2"):
        assert 240 <= est[g] <= 360
    import pytest

    with pytest.raises(ValueError):
        hll_grouped_registers(df, ["g"], "v", p=3)
    with pytest.raises(ValueError):
        hll_estimate_by(regs, ["g"], p=99)


def test_hll_overlap_report_known_sets(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import hll_overlap_report

    # A = 0..599, B = 300..899 (300 shared), C disjoint 10000..10299
    rows = [Row(g="A", v=f"u{i}") for i in range(600)]
    rows += [Row(g="B", v=f"u{i}") for i in range(300, 900)]
    rows += [Row(g="C", v=f"u{i}") for i in range(10000, 10300)]
    df = spark.createDataFrame(rows).repartition(4)
    out = {(r["group_a"], r["group_b"]): r for r in hll_overlap_report(df, "g", "v", p=12).collect()}
    ab = out[("A", "B")]
    # p=12 on n=900: ~1.6% typical error; assert within 10%
    assert abs(ab["est_union"] - 900) / 900 < 0.1
    assert abs(ab["est_overlap"] - 300) / 300 < 0.2
    ac = out[("A", "C")]
    assert ac["est_overlap"] < 60  # truly disjoint: estimate near 0
    assert ac["jaccard"] < 0.07


def test_hll_rolling_equals_direct_union(spark):
    import datetime

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from entity_resolution_spark.operators.stats import (
        hll_registers,
        hll_rolling_distinct,
    )

    d0 = datetime.datetime(2024, 3, 1)
    rows = []
    for day in range(10):
        for i in range(50):
            rows.append(Row(ts=d0 + datetime.timedelta(days=day), v=f"u{day * 30 + i}"))
    df = spark.createDataFrame(rows).repartition(3)
    out = {r["day"]: r for r in hll_rolling_distinct(df, "ts", "v", window_days=3, p=10).collect()}
    # day 5's rolling sketch must equal the direct sketch over days 3-5
    sub = df.where(
        (F.to_date("ts") >= F.lit("2024-03-04")) & (F.to_date("ts") <= F.lit("2024-03-06"))
    )
    direct = hll_registers(sub, "v", p=10)
    from entity_resolution_spark.operators.stats import hll_estimate

    want = hll_estimate(direct, p=10).collect()[0]
    got = out[datetime.date(2024, 3, 6)]
    assert got["nonzero_buckets"] == want["nonzero_buckets"]
    assert got["register_sum"] == want["register_sum"]
    assert got["estimate"] == want["estimate"]
    import pytest

    with pytest.raises(ValueError):
        hll_rolling_distinct(df, "ts", "v", window_days=0)


def test_weighted_quantiles_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import weighted_quantiles

    # weights 1,1,2,4 on values 1,2,3,4 (total 8): cum = 1,2,4,8
    # q=0.25 -> first cum >= 2 is value 2; q=0.5 -> cum >= 4 is value 3;
    # q=1.0 -> value 4. NULL/non-positive weights excluded.
    rows = [Row(g="a", v=1.0, w=1.0), Row(g="a", v=2.0, w=1.0),
            Row(g="a", v=3.0, w=2.0), Row(g="a", v=4.0, w=4.0),
            Row(g="a", v=9.0, w=None), Row(g="a", v=9.0, w=0.0)]
    df = spark.createDataFrame(rows).repartition(2)
    r = weighted_quantiles(df, "v", "w", [0.25, 0.5, 1.0], ["g"]).collect()[0]
    assert r["total_weight"] == 8.0
    assert r["q_0_25"] == 2.0 and r["q_0_5"] == 3.0 and r["q_1_0"] == 4.0
    import pytest

    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [0.0])
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [])


def test_robust_means_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import robust_means

    # 1..9 plus an outlier 1000: mean is dragged, robust means are not.
    vals = [float(i) for i in range(1, 10)] + [1000.0]
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals]).repartition(3)
    r = robust_means(df, "v", ["g"], trim=0.1).collect()[0]
    assert r["n_rows"] == 10 and r["mean"] == 104.5
    # exact percentiles: p10 = 1.9, p90 = 108.1 -> inside band = 2..9
    assert r["trimmed_mean"] == round(sum(range(2, 10)) / 8, 6)
    # winsorized: clamp 1 -> 1.9 and 1000 -> 108.1
    assert r["winsorized_mean"] == round((1.9 + sum(range(2, 10)) + 108.1) / 10, 6)
    import pytest

    with pytest.raises(ValueError):
        robust_means(df, "v", trim=0.5)


def test_categorical_association_extremes(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import categorical_association

    # y == x -> perfect association (V = 1); z constant -> V NULL
    rows = [Row(x=c, y=c, z="k") for c in ["a", "a", "b", "b", "c", "c"]]
    df = spark.createDataFrame(rows).repartition(3)
    out = {(r["col_x"], r["col_y"]): r for r in categorical_association(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")]["cramers_v"] == 1.0
    assert out[("x", "z")]["cramers_v"] is None and out[("y", "z")]["cramers_v"] is None

    # independent 2x2 with equal counts -> chi2 = 0
    ind = spark.createDataFrame(
        [Row(x=x, y=y) for x in ["a", "b"] for y in ["c", "d"]]
    )
    r = categorical_association(ind, ["x", "y"]).collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0
    import pytest

    with pytest.raises(ValueError):
        categorical_association(df, ["x"])


def test_bootstrap_ci_constant_and_determinism(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import bootstrap_ci

    # constant outcome: every replicate mean is the constant -> zero-width CI
    const = spark.createDataFrame(
        [Row(i=i, g="a", v=7.5) for i in range(40)]
    ).repartition(3)
    r = bootstrap_ci(const, "i", "v", ["g"], n_replicas=50).collect()[0]
    assert r["mean"] == 7.5 and r["se"] == 0.0
    assert r["ci_lo"] == 7.5 and r["ci_hi"] == 7.5

    # seeded: identical runs; different seed -> different replicate draws
    var = spark.createDataFrame(
        [Row(i=i, g="a", v=float(i % 13)) for i in range(120)]
    ).repartition(4)
    a = bootstrap_ci(var, "i", "v", ["g"], n_replicas=80, seed=1).collect()[0]
    b = bootstrap_ci(var, "i", "v", ["g"], n_replicas=80, seed=1).collect()[0]
    c = bootstrap_ci(var, "i", "v", ["g"], n_replicas=80, seed=2).collect()[0]
    assert (a["ci_lo"], a["ci_hi"], a["se"]) == (b["ci_lo"], b["ci_hi"], b["se"])
    assert (a["ci_lo"], a["ci_hi"]) != (c["ci_lo"], c["ci_hi"])
    assert a["ci_lo"] <= a["mean"] <= a["ci_hi"]
    import pytest

    with pytest.raises(ValueError):
        bootstrap_ci(var, "i", "v", n_replicas=1)
    with pytest.raises(ValueError):
        bootstrap_ci(var, "i", "v", level=1.5)


def test_effect_size_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import effect_size

    # A = {1,2,3}: mean 2, var 1; B = {4,5,6,7}: mean 5.5, var 5/3
    rows = [Row(g="a", v=float(v)) for v in (1, 2, 3)]
    rows += [Row(g="b", v=float(v)) for v in (4, 5, 6, 7)]
    rows += [Row(g="x", v=99.0), Row(g="a", v=None)]
    df = spark.createDataFrame(rows).repartition(3)
    r = effect_size(df, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 4)
    assert r["mean_a"] == 2.0 and r["mean_b"] == 5.5
    pooled = ((2 * 1.0 + 3 * (5 / 3)) / 5) ** 0.5
    assert r["pooled_sd"] == round(pooled, 6)
    d = (2.0 - 5.5) / pooled
    assert r["cohens_d"] == round(d, 6)
    assert r["hedges_g"] == round(d * (1 - 3 / (4 * 7 - 9)), 6)

    # zero-variance groups: d undefined
    z = spark.createDataFrame([Row(g="a", v=1.0), Row(g="a", v=1.0),
                               Row(g="b", v=1.0), Row(g="b", v=1.0)])
    assert effect_size(z, "v", "g", "a", "b").collect()[0]["cohens_d"] is None


def test_bootstrap_ci_mixed_sign_ids_match_numpy_replica(spark):
    """Negative ids previously got replica labels from `_k % b` (dividend-
    sign modulo -> labels in (-b, 0]), silently splitting every replica's
    sample. The exploded offset itself is now the replica key; verify the
    whole statistic against an exact numpy replication of the algorithm
    on a mixed-sign id set."""
    import numpy as np
    from pyspark.sql import Row

    from entity_resolution_spark.functions.text import _splitmix64
    from entity_resolution_spark.operators.stats import (
        _GOLDEN64,
        POISSON1_CDF,
        bootstrap_ci,
    )

    b, seed = 60, 42
    ids = np.array([i - 20 for i in range(50)], dtype=np.int64)  # mixed sign
    vals = np.array([float((i * 7) % 13) for i in range(50)])
    rows = [Row(i=int(i), g="a", v=float(v)) for i, v in zip(ids, vals)]
    out = bootstrap_ci(
        spark.createDataFrame(rows).repartition(4),
        "i", "v", ["g"], n_replicas=b, seed=seed,
    ).collect()[0]

    # exact numpy replication: same keys, same splitmix64, same CDF
    seed_mix = np.uint64((seed * _GOLDEN64) % (1 << 64))
    cdf = np.array(POISSON1_CDF, dtype=np.float64)
    k = ids[:, None] * b + np.arange(b, dtype=np.int64)[None, :]
    h = k.reshape(-1).view(np.uint64) ^ seed_mix
    u = (_splitmix64(h) >> np.uint64(11)).astype(np.float64) * 2.0**-53
    w = np.searchsorted(cdf, u, side="right").reshape(len(ids), b)
    wsum = w.sum(axis=0).astype(np.float64)
    means = np.round((w * vals[:, None]).sum(axis=0) / wsum, 6)
    exp_se = round(float(np.std(means, ddof=1)), 6)

    assert out["n_rows"] == 50
    assert out["mean"] == round(float(vals.mean()), 6)
    assert out["se"] == exp_se
    assert out["ci_lo"] <= out["mean"] <= out["ci_hi"]


def test_bootstrap_ci_null_ids_excluded(spark):
    """NULL / non-castable ids previously reached the weight kernel and
    crashed astype(int64); they are now excluded up front and the summary
    stats reflect the same eligible row set."""
    from pyspark.sql import Row

    from entity_resolution_spark.operators.stats import bootstrap_ci

    rows = [Row(i=str(i), g="a", v=float(i % 7)) for i in range(30)]
    rows += [Row(i=None, g="a", v=99.0), Row(i="oops", g="a", v=99.0)]
    out = bootstrap_ci(
        spark.createDataFrame(rows), "i", "v", ["g"], n_replicas=40
    ).collect()[0]
    assert out["n_rows"] == 30  # the NULL and non-castable ids dropped
    assert out["mean"] == round(sum(i % 7 for i in range(30)) / 30, 6)
