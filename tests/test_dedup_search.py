"""Dedup + similarity-search operator tests over driver testdata and
deterministic synthetic corpora."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.dedup import (
    embedding_cosine_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from entity_resolution_spark.operators.similarity_search import (
    assign_cells,
    brute_force_topk,
    ivf_topk,
    train_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    """Synthetic doc corpus with planted exact/near dups."""
    base = "the quick brown fox jumps over the lazy dog while the cat watches from the tall fence nearby"
    alt = "entirely different material about distributed query planning and shuffle partitioning strategies in engines"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " extra trailing words here"),  # near dup of 0
        (3, alt),
        (4, alt.replace("engines", "systems")),  # near dup of 3
        (5, "short unrelated text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(corpus):
    groups = exact_duplicates(corpus).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_copies == 2 and g.canonical_doc_id == 0 and g.doc_ids == [0, 1]


def test_minhash_lsh_pairs(corpus):
    pairs = {(r.left_id, r.right_id): r.est_jaccard for r in minhash_lsh_pairs(corpus, min_jaccard=0.5).collect()}
    assert pairs[(0, 1)] == 1.0  # exact dup: identical signature
    assert (0, 2) in pairs  # near dup caught by banding
    assert (0, 3) not in pairs and (0, 5) not in pairs


def test_simhash_pairs(corpus):
    pairs = {(r.left_id, r.right_id): r.hamming for r in simhash_pairs(corpus).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 3) not in pairs


def test_ngram_jaccard_pairs(corpus):
    pairs = {(r.left_id, r.right_id): r.jaccard for r in ngram_jaccard_pairs(corpus, min_jaccard=0.4).collect()}
    assert pairs.get((0, 1)) == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_ngram_stop_gram_pruning(spark):
    # a gram present in every doc is pruned when max_doc_freq < corpus size,
    # so two docs sharing ONLY stop-grams produce no pair
    docs = spark.createDataFrame(
        [(i, "common common common common filler " + ("alpha beta" if i == 0 else "gamma delta " + str(i)))
         for i in range(6)],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, min_jaccard=0.05, max_doc_freq=3).collect()
    assert all(r.jaccard < 1.0 for r in pairs)


def test_embedding_cosine_pairs(spark):
    rng = np.random.RandomState(0)
    v = rng.normal(size=8)
    rows = [
        (0, [float(x) for x in v], 0),
        (1, [float(x) for x in v * 2.0], 0),  # same direction -> cosine 1
        (2, [float(x) for x in v + rng.normal(scale=0.01, size=8)], 0),  # near
        (3, [float(x) for x in rng.normal(size=8)], 1),  # unrelated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r.left_id, r.right_id): r.cosine for r in embedding_cosine_pairs(emb, min_cosine=0.98).collect()}
    assert pairs.get((0, 1)) == pytest.approx(1.0, abs=1e-4)
    assert (0, 2) in pairs
    assert (0, 3) not in pairs


def test_empty_doc_flood_adds_no_minhash_pairs(spark, corpus):
    """5k empty/whitespace docs all share the sentinel signature: without
    the sentinel exclusion they'd form ONE quadratic band block (~12.5M
    pairs). They must contribute zero candidate pairs."""
    flood = spark.range(5000).select(
        (F.col("id") + 100).alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("")).otherwise(F.lit("  \n\t ")).alias("text"),
    )
    base_pairs = {(r.left_id, r.right_id) for r in minhash_lsh_pairs(corpus, min_jaccard=0.5).collect()}
    flooded_pairs = {
        (r.left_id, r.right_id)
        for r in minhash_lsh_pairs(corpus.unionByName(flood), min_jaccard=0.5).collect()
    }
    assert flooded_pairs == base_pairs


def test_empty_doc_flood_adds_no_simhash_pairs(spark, corpus):
    flood = spark.range(5000).select(
        (F.col("id") + 100).alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("")).otherwise(F.lit(" .,;! ")).alias("text"),
    )
    base_pairs = {(r.left_id, r.right_id) for r in simhash_pairs(corpus).collect()}
    flooded_pairs = {
        (r.left_id, r.right_id)
        for r in simhash_pairs(corpus.unionByName(flood)).collect()
    }
    assert flooded_pairs == base_pairs


def test_capped_block_pairs_tiling_is_lossless(spark):
    """The triangular tiling path (blocks > max_block_size) must emit every
    unordered pair exactly once, with payloads attached from the right rows."""
    from entity_resolution_spark.operators.dedup import _capped_block_pairs

    n = 90
    exploded = spark.range(n).select(
        F.lit("hot").alias("bk"), F.col("id"), (F.col("id") * 10).alias("pay")
    )
    pairs = _capped_block_pairs(exploded, ["pay"], max_block_size=20).collect()
    assert len(pairs) == n * (n - 1) // 2
    seen = {(r.left_id, r.right_id) for r in pairs}
    assert len(seen) == len(pairs)  # no duplicate emissions
    for r in pairs[:50]:
        assert r.l_pay == r.left_id * 10 and r.r_pay == r.right_id * 10


def test_capped_block_pairs_budget_thins_and_drops(spark):
    from entity_resolution_spark.operators.dedup import _capped_block_pairs

    n = 80
    exploded = spark.range(n).select(F.lit("hot").alias("bk"), F.col("id"))
    # budget of 500 << C(80,2)=3160: hash-thinning keeps roughly 1/K
    thinned = _capped_block_pairs(
        exploded, [], max_block_size=20, max_pairs_per_block=500
    ).count()
    assert 0 < thinned < n * (n - 1) // 2
    # stop-key removal: block above drop_limit vanishes entirely
    dropped = _capped_block_pairs(exploded, [], max_block_size=20, drop_limit=50).count()
    assert dropped == 0


def test_brute_force_topk_real_embeddings(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.select("embedding").first()[0]
    top = brute_force_topk(emb, list(q), k=5).collect()
    assert len(top) == 5
    assert top[0].cosine == pytest.approx(1.0, abs=1e-4)  # query vec is in the table
    scores = [r.cosine for r in top]
    assert scores == sorted(scores, reverse=True)


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = train_centroids(emb, n_cells=8, iters=5)
    cells = assign_cells(emb, cent).persist()
    q = emb.select("embedding").first()[0]
    exact = [r.vec_id for r in brute_force_topk(emb, list(q), k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(cells, cent, list(q), k=10, n_probe=4).collect()]
    # recall@10 with half the cells probed should be high on clustered data
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5
    assert approx[0] == exact[0]  # the exact hit lives in the probed cell


def test_centroid_determinism(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = train_centroids(emb, n_cells=4, iters=3)
    c2 = train_centroids(emb, n_cells=4, iters=3)
    assert np.allclose(c1, c2)


# --- fused curation pipeline ------------------------------------------------
def test_curate_corpus_all_statuses(spark):
    """All four decision branches on planted data: kept / low_quality /
    exact_dup (impossible on the synthetic testdata corpus — no duplicate
    texts) / near_dup, with the documented canonical_id semantics."""
    from entity_resolution_spark.operators.curation import curate_corpus

    good = (
        "distributed query planning with cost models and adaptive execution "
        "requires careful partitioning of the input relations and pruning of "
        "unneeded columns before any shuffle boundary is crossed in the plan"
    ) * 3
    rows = [
        (0, good),
        (1, good),  # exact dup of 0
        (2, good + " trailing words appended here"),  # near dup of 0
        (3, "!!!! ???? ....  "),  # low quality (no alpha)
        (4, "a completely different but equally well formed document about "
            "watermark semantics in streaming aggregation engines and the "
            "latency tradeoffs of state checkpointing strategies" * 2),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.status, r.canonical_id)
           for r in curate_corpus(docs, min_quality=0.5, min_jaccard=0.6).collect()}
    assert out[0] == ("kept", 0)
    assert out[1] == ("exact_dup", 0)
    assert out[2] == ("near_dup", 0)
    assert out[3] == ("low_quality", None)
    assert out[4] == ("kept", 4)


def test_curate_corpus_deterministic_across_partitioning(spark):
    from entity_resolution_spark.operators.curation import curate_corpus

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(str, curate_corpus(docs.repartition(1)).collect()))
    b = sorted(map(str, curate_corpus(docs.repartition(16)).collect()))
    assert a == b and len(a) > 0


def test_curate_corpus_null_text_is_low_quality(spark):
    """NULL text = no content: low_quality with NULL canonical, never
    merged with other NULL-text docs, never silently dropped by a
    null-key join."""
    from entity_resolution_spark.operators.curation import curate_corpus

    rows = [(0, "a well formed document about join reordering strategies "
                "and broadcast thresholds in distributed query optimizers"),
            (1, None), (2, None), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.status, r.canonical_id) for r in curate_corpus(docs).collect()}
    assert len(out) == 4  # nobody vanished
    assert out[0][0] == "kept"
    for i in (1, 2, 3):
        assert out[i] == ("low_quality", None)


def test_exact_duplicates_roster_bounded(spark):
    """Groups above max_roster keep exact counts/canonical but a NULL id
    roster — the collect_list buffer never sees a mega group's members."""
    from entity_resolution_spark.operators.dedup import exact_duplicates

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 40, F.lit("common boilerplate body"))
        .otherwise(F.lit("rare duplicate body"))
        .alias("text"),
    )
    out = {r.canonical_doc_id: r for r in exact_duplicates(docs, max_roster=10).collect()}
    assert out[0].n_copies == 40 and out[0].doc_ids is None
    assert out[40].n_copies == 10 and list(out[40].doc_ids) == list(range(40, 50))


def test_knn_join_matches_brute_force_per_query(spark):
    """knn_join == brute_force_topk for every query, across partitionings
    (the local-topk merge must be exact, not approximate)."""
    from entity_resolution_spark.operators.similarity_search import (
        brute_force_topk,
        knn_join,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = knn_join(q, emb.repartition(7), k=4, id_col="vec_id").collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
    for qrow in q.collect():
        want = [
            (i + 1, r.vec_id, r.cosine)
            for i, r in enumerate(
                brute_force_topk(emb, list(qrow.embedding), k=4).collect()
            )
        ]
        assert sorted(by_query[qrow.query_id]) == want, qrow.query_id


def test_knn_join_auto_dispatches_big_query_side(spark):
    """knn_join routes to the cell-cogrouped corpus-scale join when the
    query table exceeds big_query_threshold: identical exact output (full
    probe), and the dispatched plan broadcasts NOTHING — no caller can hit
    the |Q| x n_buckets replication / |Q| x k winner-broadcast wall by
    accident."""
    from entity_resolution_spark.operators.similarity_search import knn_join
    from entity_resolution_spark.session import ensure_py_files

    ensure_py_files(spark)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    small = knn_join(q, emb, k=4, id_col="vec_id")  # under threshold
    big = knn_join(q, emb, k=4, id_col="vec_id", big_query_threshold=0)
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect()))

    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan

    # threshold=None pins the replicated path (no count job, no dispatch)
    pinned = knn_join(q, emb, k=4, id_col="vec_id", big_query_threshold=None)
    assert sorted(map(tuple, pinned.collect())) == sorted(map(tuple, big.collect()))


def test_ivf_knn_join_full_probe_equals_brute(spark):
    """ivf_knn_join at n_probe == n_cells must return exactly the
    brute-force knn_join rows (same set, cosine, rank); at n_probe < cells
    it keeps high recall on clustered data."""
    from entity_resolution_spark.operators.similarity_search import (
        assign_cells,
        ivf_knn_join,
        knn_join,
        train_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_centroids(emb, n_cells=8)
    with_cells = assign_cells(emb, cents)
    q = emb.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in knn_join(q, emb, k=4, id_col="vec_id").collect()
    }
    full = {
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in ivf_knn_join(q, with_cells, cents, k=4, n_probe=8).collect()
    }
    assert full == exact
    probed = {
        (r.query_id, r.vec_id)
        for r in ivf_knn_join(q, with_cells, cents, k=4, n_probe=3).collect()
    }
    exact_ids = {(a, b) for a, b, _, _ in exact}
    recall = len(probed & exact_ids) / len(exact_ids)
    assert recall >= 0.5, recall


def test_semantic_dedup_groups_and_keeps(spark):
    from entity_resolution_spark.operators.dedup import semantic_dedup

    rng = np.random.RandomState(0)
    v = rng.normal(size=8)
    w = rng.normal(size=8)
    rows = [
        (10, [float(x) for x in v]),
        (11, [float(x) for x in v * 3.0]),                              # cosine 1 with 10
        (12, [float(x) for x in v + rng.normal(scale=0.01, size=8)]),   # near 10
        (20, [float(x) for x in w]),                                    # unrelated, alone
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semantic_dedup(emb, min_cosine=0.98, n_tables=8).collect()}
    assert len(out) == 4  # one row per input vector
    assert out[10].canonical_id == 10 and out[10].kept
    assert out[11].canonical_id == 10 and not out[11].kept
    assert out[12].canonical_id == 10 and not out[12].kept
    assert out[20].canonical_id == 20 and out[20].kept


def test_semantic_dedup_all_unique_keeps_everything(spark):
    from entity_resolution_spark.operators.dedup import semantic_dedup

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(emb, min_cosine=0.9999).collect()
    assert len(out) == 12
    assert all(r.kept and r.canonical_id == r.vec_id for r in out)


def test_quantized_topk_tracks_float_search(spark):
    from entity_resolution_spark.operators.similarity_search import quantized_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.select("embedding").first()[0]
    qtop = quantized_topk(emb, [float(x) for x in q], k=10).collect()
    ftop = brute_force_topk(emb, [float(x) for x in q], k=10).collect()
    # the query vector itself still ranks first, near cosine 1
    assert qtop[0].vec_id == ftop[0].vec_id
    assert qtop[0].cosine == pytest.approx(1.0, abs=1e-3)
    # int8 noise may permute the tail, but the sets overlap strongly
    overlap = {r.vec_id for r in qtop} & {r.vec_id for r in ftop}
    assert len(overlap) >= 7
    # per-id cosine agrees within quantization noise
    fcos = {r.vec_id: r.cosine for r in ftop}
    for r in qtop:
        if r.vec_id in fcos:
            assert abs(r.cosine - fcos[r.vec_id]) < 0.02


def test_remove_duplicate_spans(spark):
    from entity_resolution_spark.operators.dedup import remove_duplicate_spans

    header = (
        "LICENSE: this file is distributed under the apache license "
        "version 2.0 terms apply to all copies. "
    )
    rows = [
        (1, header + "unique body alpha with its own words and numbers 12345"),
        (2, header + "completely different tail content for document beta 99"),
        (3, "no shared content at all in this one, just original prose xyz"),
        (4, "sh"),  # shorter than k -> passthrough
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicate_spans(docs).collect()}

    # the shared header loses a span in BOTH carriers; unique docs untouched
    for i in (1, 2):
        assert out[i].n_spans == 1
        assert out[i].n_chars_removed >= 40
        # cut chars come out of the shared header region, the unique tail
        # survives verbatim
        assert rows[i - 1][1][len(header):] in out[i].clean_text
        # length bookkeeping: removed + kept == original
        assert len(out[i].clean_text) + out[i].n_chars_removed == len(rows[i - 1][1])
        # both docs cut the IDENTICAL header span -> identical removed width
    assert out[1].n_chars_removed == out[2].n_chars_removed
    for i in (3, 4):
        assert out[i].n_spans == 0 and out[i].n_chars_removed == 0
        assert out[i].clean_text == rows[i - 1][1]


def test_remove_duplicate_spans_merges_interrupted_runs(spark):
    """Two shared blocks separated by > gap unique chars in the SAME doc
    become two spans, not one merged over the unique middle."""
    from entity_resolution_spark.operators.dedup import remove_duplicate_spans

    block_a = "shared preamble block with stable tokens one two three four five six. "
    block_b = "another shared trailer block with stable tokens seven eight nine ten. "
    mid = "THE-UNIQUE-MIDDLE-SECTION-OF-DOCUMENT-ONE-9f8e7d6c5b4a3210-KEEP-ME "
    rows = [
        (1, block_a + mid + block_b),
        (2, block_a + "totally different middle for the second document " + block_b),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicate_spans(docs).collect()}
    assert out[1].n_spans == 2
    assert "KEEP-ME" in out[1].clean_text
    assert len(out[1].clean_text) + out[1].n_chars_removed == len(rows[0][1])


def test_append_ivf_index_delta_fold(spark, tmp_path):
    """Appending a delta to a standing IVF index: per-cell counts sum to
    the delta size, the read-back table is the exact union, appended
    vectors land in the same cells direct assignment would give, and the
    cell= partition layout (probe pruning) survives the append."""
    import os

    from entity_resolution_spark.operators.similarity_search import (
        append_ivf_index,
        assign_cells,
        read_ivf_index,
        train_centroids,
        write_ivf_index,
    )

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    standing = emb.filter(F.col("vec_id") < 100)
    delta = emb.filter(F.col("vec_id") >= 100)
    path = str(tmp_path / "ivf")

    cent = train_centroids(standing, n_cells=4, iters=4)
    write_ivf_index(assign_cells(standing, cent), path, cent)
    counts = append_ivf_index(delta, path)
    assert sum(r["n_added"] for r in counts.collect()) == 20

    cells, cent2 = read_ivf_index(spark, path)
    assert cells.count() == 120
    assert {r["vec_id"] for r in cells.select("vec_id").collect()} == set(range(120))
    # appended rows carry the same cell as direct assignment against the
    # standing centroids
    direct = {
        r["vec_id"]: r["cell"] for r in assign_cells(delta, cent2).collect()
    }
    stored = {
        r["vec_id"]: r["cell"]
        for r in cells.filter(F.col("vec_id") >= 100).collect()
    }
    assert stored == direct
    # partition layout intact: cell= directories, no refit of centroids
    assert any(d.startswith("cell=") for d in os.listdir(path))
    assert np.allclose(cent2, cent)


def test_train_centroids_large_sample_bounded_memory(spark):
    """VERDICT r3 #6: a user raising sample_size to 1e5 must not hit the
    (n, n_cells, dim) broadcast temp wall — the chunked assignment keeps
    the temp ~32 MB and stays bit-identical to the naive form."""
    import numpy as np

    from entity_resolution_spark.operators.similarity_search import (
        _assign_nearest,
        train_centroids,
    )

    # bit-identical vs the naive broadcast on a moderate slab
    rng = np.random.RandomState(7)
    X = rng.randn(5000, 16)
    cent = rng.randn(64, 16)
    naive = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    assert (_assign_nearest(X, cent) == naive).all()

    # 1e5-row sample at dim 16 completes (previously a quadratic-ish temp)
    emb = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[(F.col("id") * (i + 1) % 97).cast("double") for i in range(16)]
        ).alias("embedding"),
    )
    cents = train_centroids(emb, n_cells=32, sample_size=100_000, iters=2)
    assert cents.shape == (32, 16)


class TestSelfKnnJoin:
    def _corpus(self, spark, n=400):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    ((F.col("id") * (i + 3) % 23).cast("double") - 11.0)
                    for i in range(8)
                ]
            ).alias("embedding"),
        )

    def test_full_probe_equals_brute_force(self, spark):
        """n_probe == n_cells: the cell-cogrouped self-kNN must reproduce
        the brute-force all-pairs ranking exactly."""
        import numpy as np

        from entity_resolution_spark.operators.similarity_search import (
            assign_cells,
            self_knn_join,
            train_centroids,
        )
        from entity_resolution_spark.session import ensure_py_files

        ensure_py_files(spark)
        e = self._corpus(spark)
        cents = train_centroids(e, n_cells=6, iters=4)
        got = self_knn_join(
            assign_cells(e, cents), cents, k=4, n_probe=6
        ).collect()
        rows = e.collect()
        V = np.array([r["embedding"] for r in rows])
        ids = np.array([r["vec_id"] for r in rows])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
        S = Vn @ Vn.T
        exp = {}
        for qi, qid in enumerate(ids):
            col = S[qi].copy()
            col[ids == qid] = -np.inf
            order = np.lexsort((ids, -col))[:4]
            for rank, ci in enumerate(order, 1):
                exp[(int(qid), int(ids[ci]))] = (
                    round(float(S[qi, ci]), 6),
                    rank,
                )
        assert len(got) == len(exp)
        for r in got:
            cos, rank = exp[(r["query_id"], r["vec_id"])]
            assert (r["cosine"], r["rank"]) == (cos, rank)

    def test_no_broadcast_of_either_side(self, spark):
        """The corpus-scale shape: the physical plan must contain NO
        broadcast exchange — both the probe frame and the winner
        re-score joins stay shuffle-based."""
        from entity_resolution_spark.operators.similarity_search import (
            assign_cells,
            self_knn_join,
            train_centroids,
        )
        from entity_resolution_spark.session import ensure_py_files

        ensure_py_files(spark)
        e = self._corpus(spark, n=120)
        cents = train_centroids(e, n_cells=4, iters=3)
        plan = self_knn_join(
            assign_cells(e, cents), cents, k=3, n_probe=2
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        assert "BroadcastHashJoin" not in plan

    def test_reduced_probe_recall_and_self_exclusion(self, spark):
        from entity_resolution_spark.operators.similarity_search import (
            assign_cells,
            self_knn_join,
            train_centroids,
        )
        from entity_resolution_spark.session import ensure_py_files

        ensure_py_files(spark)
        e = self._corpus(spark, n=200)
        cents = train_centroids(e, n_cells=8, iters=4)
        out = self_knn_join(
            assign_cells(e, cents), cents, k=3, n_probe=2
        ).collect()
        assert all(r["query_id"] != r["vec_id"] for r in out)
        # every query keeps at most k hits with contiguous ranks from 1
        from collections import defaultdict

        per_q = defaultdict(list)
        for r in out:
            per_q[r["query_id"]].append(r["rank"])
        for ranks in per_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
