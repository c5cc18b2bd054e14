"""Driver-contract batch: round-3 corpus-composition + embedding-mining
operators. Every query carries a full DuckDB value-hash oracle.

Covers: CCNet per-language perplexity buckets (operators/lm.py), the
corpus composition / mixture-weight report (operators/stats.py), exact
proportional stratified sampling (operators/sampling.py), embedding-level
test-set decontamination (operators/decontam.py), vocabulary/OOV coverage
(operators/terms.py), and contrastive training-pair mining
(operators/contrastive.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..queries import _t, query

# Shared bigram-LM CTE chain (identical to bigram_lm_perplexity's oracle in
# quality_ops.py — the fitted model and per-doc perplexity definitions must
# stay in lockstep with operators/lm.py).
_PPL_CTES = """
    t AS (
      SELECT doc_id,
             string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS w
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             unnest(w[1:len(w) - 1]) AS w1,
             unnest(w[2:len(w)]) AS w2
      FROM t WHERE len(w) >= 2
    ),
    bi AS (SELECT w1, w2, count(*) AS c12 FROM p GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(c12) AS c1 FROM bi GROUP BY 1),
    v AS (SELECT count(DISTINCT u) AS v FROM (SELECT unnest(w) AS u FROM t)),
    sc AS (
      SELECT p.doc_id,
             log2((bi.c12 + 1.0) / (ctx.c1 + 1.0 * v.v)) AS lp
      FROM p JOIN bi USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v
    ),
    d AS (SELECT doc_id, count(*) AS n, -avg(lp) AS h FROM sc GROUP BY 1),
    pp AS (
      SELECT t.doc_id,
             CAST(coalesce(d.n, 0) AS INT) AS n_bigrams,
             round(pow(2.0, d.h), 4) AS perplexity
      FROM t LEFT JOIN d USING (doc_id)
    )
"""


@query(
    "ccnet_perplexity_buckets",
    f"""
    WITH {_PPL_CTES},
    j AS (
      SELECT docs.lang, pp.doc_id, pp.n_bigrams, pp.perplexity
      FROM documents docs JOIN pp USING (doc_id)
    ),
    s AS (
      SELECT *, ntile(3) OVER (PARTITION BY lang ORDER BY perplexity, doc_id) AS tt
      FROM j WHERE perplexity IS NOT NULL
    )
    SELECT doc_id, lang, n_bigrams, perplexity,
           CASE tt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM s
    UNION ALL
    SELECT doc_id, lang, n_bigrams, perplexity, 'unscored' AS bucket
    FROM j WHERE perplexity IS NULL
    """,
)
def ccnet_perplexity_buckets(spark, sf_dir):
    """Per-language head/middle/tail perplexity terciles (CCNet §4.3),
    exact NTILE plan (operators/lm.py:perplexity_buckets)."""
    from ..operators.lm import perplexity_buckets

    d = _t(spark, sf_dir, "documents")
    return perplexity_buckets(d, exact=True)


@query(
    "corpus_stats_report",
    """
    WITH g AS (
      SELECT source, lang, count(*) AS n_docs,
             CAST(sum(len(list_filter(
                 string_split_regex(trim(coalesce(text, '')), '\\s+'),
                 x -> x <> ''))) AS BIGINT) AS total_tokens,
             CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS total_chars,
             round(avg(length(coalesce(text, ''))), 2) AS avg_chars,
             quantile_cont(length(coalesce(text, '')), 0.5) AS p50_chars
      FROM documents GROUP BY 1, 2
    )
    SELECT source, lang, n_docs, total_tokens, total_chars, avg_chars,
           p50_chars,
           round(pow(n_docs, 0.5) / sum(pow(n_docs, 0.5)) OVER (), 6)
             AS mix_weight
    FROM g
    """,
)
def corpus_stats_report(spark, sf_dir):
    """Per-(source, lang) composition report + temperature-smoothed
    mixture weights (operators/stats.py:corpus_report, alpha=0.5)."""
    from ..operators.stats import corpus_report

    d = _t(spark, sf_dir, "documents")
    return corpus_report(d)


@query(
    "stratified_docs_sample",
    """
    WITH h AS (
      SELECT doc_id, source,
             sha256('strat:' || CAST(doc_id AS VARCHAR)) AS hh,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn
      FROM h
    )
    SELECT doc_id, source FROM r
    WHERE rn <= greatest(1, CAST(floor(n * 0.2) AS BIGINT))
    """,
)
def stratified_docs_sample(spark, sf_dir):
    """Exact 20% proportional stratified sample by source
    (operators/sampling.py:stratified_sample)."""
    from ..operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(d, "source", "doc_id", 0.2)


@query(
    "embedding_decontamination",
    """
    WITH b AS (
      SELECT vec_id AS bench_id, embedding FROM embeddings WHERE vec_id % 10 < 2
    ),
    c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 >= 2),
    s AS (
      SELECT c.vec_id, b.bench_id,
             list_cosine_similarity(c.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
      FROM c CROSS JOIN b
    ),
    w AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, bench_id) AS rn
      FROM s
    )
    SELECT vec_id, bench_id, round(cos + 1e-9, 6) AS max_cosine,
           round(cos + 1e-9, 6) >= 0.9 AS contaminated
    FROM w WHERE rn = 1
    """,
)
def embedding_decontamination(spark, sf_dir):
    """Embedding-level decontamination: max benchmark cosine per corpus
    vector (operators/decontam.py:embedding_contamination); rows with
    vec_id % 10 < 2 stand in as the benchmark/eval embedding set."""
    from ..operators.decontam import embedding_contamination
    from ..session import ensure_py_files

    ensure_py_files(spark)
    e = _t(spark, sf_dir, "embeddings")
    bench = e.filter(F.col("vec_id") % 10 < 2).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    corpus = e.filter(F.col("vec_id") % 10 >= 2).select("vec_id", "embedding")
    return embedding_contamination(
        corpus, bench, id_col="vec_id", bench_id_col="bench_id", threshold=0.9
    )


@query(
    "vocab_coverage_oov",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    cen AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
    voc AS (SELECT term FROM cen ORDER BY n DESC, term LIMIT 500),
    per_doc AS (
      SELECT tok.doc_id, count(*) AS n_tokens,
             sum(CASE WHEN voc.term IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM tok LEFT JOIN voc ON tok.term = voc.term
      GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
           round(n_oov / n_tokens, 6) AS oov_rate
    FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
    """,
)
def vocab_coverage_oov(spark, sf_dir):
    """Per-document OOV rate against the corpus's own top-500 token
    vocabulary (operators/terms.py:vocab_coverage)."""
    from ..operators.terms import vocab_coverage

    d = _t(spark, sf_dir, "documents")
    return vocab_coverage(d, vocab_size=500)


@query(
    "contrastive_pair_mining",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe, label AS ql
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    s AS (
      SELECT q.qid,
             CASE WHEN e.label = q.ql THEN 'positive' ELSE 'negative' END AS side,
             e.vec_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    ),
    w AS (
      SELECT *, row_number() OVER (PARTITION BY qid, side ORDER BY cos DESC, vec_id) AS rn
      FROM s
    )
    SELECT qid AS query_id, side, vec_id, round(cos + 1e-9, 6) AS cosine
    FROM w WHERE rn = 1
    """,
)
def contrastive_pair_mining(spark, sf_dir):
    """Hard positive/negative mining per query embedding (every 10th
    vector queries the full corpus; operators/contrastive.py)."""
    from ..operators.contrastive import contrastive_pairs
    from ..session import ensure_py_files

    ensure_py_files(spark)
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return contrastive_pairs(q, e, id_col="vec_id")


def _register_dedup_histogram():
    # deferred import: sql_kernels pulls config at module load; keep the
    # same registration pattern as quality_ops' banded oracles
    from .sql_kernels import minhash_edge_ctes

    @query(
        "dedup_cluster_size_histogram",
        f"""
    WITH RECURSIVE {minhash_edge_ctes(0.7)},
    __dir AS MATERIALIZED (
      SELECT left_id AS a, right_id AS b FROM __pairs
      UNION SELECT right_id, left_id FROM __pairs
    ),
    __reach(a, b) AS (
      SELECT a, b FROM __dir
      UNION
      SELECT r.a, d.b FROM __reach r JOIN __dir d ON r.b = d.a
    ),
    __canon AS (SELECT a AS doc_id, least(a, min(b)) AS cid FROM __reach GROUP BY a),
    __lab AS (
      SELECT d.doc_id, coalesce(c.cid, d.doc_id) AS cid
      FROM documents d LEFT JOIN __canon c USING (doc_id)
    ),
    __sizes AS (SELECT cid, count(*) AS cluster_size FROM __lab GROUP BY 1)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM __sizes GROUP BY cluster_size
    """,
    )
    def dedup_cluster_size_histogram(spark, sf_dir):
        """Near-dup component-size distribution incl. singletons
        (operators/dedup.py:dedup_size_histogram) — the corpus dedup
        report."""
        from ..operators.dedup import dedup_size_histogram
        from ..session import ensure_py_files

        ensure_py_files(spark)
        d = _t(spark, sf_dir, "documents")
        return dedup_size_histogram(d, min_jaccard=0.7)


_register_dedup_histogram()


@query(
    "token_drift_report",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    r AS (SELECT term, count(*) AS c_ref FROM tok WHERE doc_id % 2 = 0 GROUP BY 1),
    n AS (SELECT term, count(*) AS c_new FROM tok WHERE doc_id % 2 = 1 GROUP BY 1),
    j AS (
      SELECT coalesce(r.term, n.term) AS term,
             coalesce(c_ref, 0) AS c_ref, coalesce(c_new, 0) AS c_new
      FROM r FULL OUTER JOIN n ON r.term = n.term
    ),
    t AS (SELECT sum(c_ref) AS n_ref, sum(c_new) AS n_new, count(*) AS v FROM j),
    s AS (
      SELECT term, c_ref, c_new,
             round((c_ref + 1.0) / (n_ref + 1.0 * v), 8) AS p_ref,
             round((c_new + 1.0) / (n_new + 1.0 * v), 8) AS p_new,
             round(log2(((c_new + 1.0) / (n_new + 1.0 * v))
                        / ((c_ref + 1.0) / (n_ref + 1.0 * v))), 6) AS log_ratio,
             round(((c_new + 1.0) / (n_new + 1.0 * v))
                   * log2(((c_new + 1.0) / (n_new + 1.0 * v))
                          / ((c_ref + 1.0) / (n_ref + 1.0 * v))), 6) AS drift
      FROM j CROSS JOIN t
    )
    SELECT term, CAST(c_ref AS BIGINT) AS c_ref, CAST(c_new AS BIGINT) AS c_new,
           p_ref, p_new, log_ratio, drift
    FROM s ORDER BY abs(drift) DESC, term LIMIT 50
    """,
)
def token_drift_report(spark, sf_dir):
    """Top-50 drifted tokens between two corpus snapshots (even doc_ids =
    reference, odd = new crawl; operators/stats.py:token_drift)."""
    from ..operators.stats import token_drift

    d = _t(spark, sf_dir, "documents")
    return token_drift(
        d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)
    )


def _register_kmeans():
    from .sql_kernels import kmeans_assign_sql

    @query("kmeans_topic_assign", kmeans_assign_sql(k=8, iters=3))
    def kmeans_topic_assign(spark, sf_dir):
        """Fixed-point Lloyd k-means topic assignment over the embedding
        table (operators/kmeans.py) — 8 cells, 3 update rounds,
        content-addressed init; bit-deterministic for any partitioning."""
        from ..operators.kmeans import kmeans_assign
        from ..session import ensure_py_files

        ensure_py_files(spark)
        e = _t(spark, sf_dir, "embeddings")
        return kmeans_assign(e, k=8, iters=3)


_register_kmeans()


def _register_cluster_balanced():
    from .sql_kernels import cluster_balanced_sample_sql

    @query(
        "cluster_balanced_sample",
        cluster_balanced_sample_sql(per_cell=5, k=8, iters=3, keep="prototypical"),
    )
    def cluster_balanced_sample_q(spark, sf_dir):
        """Topic-balanced subsample: 5 exemplars per k-means cell
        (operators/kmeans.cluster_balanced_sample, keep='prototypical' —
        the Sorscher et al. 2022 cluster-pruning policies)."""
        from ..operators.kmeans import cluster_balanced_sample
        from ..session import ensure_py_files

        ensure_py_files(spark)
        e = _t(spark, sf_dir, "embeddings")
        return cluster_balanced_sample(e, per_cell=5, k=8, iters=3, keep="prototypical")


_register_cluster_balanced()


def _register_random_projection():
    from .sql_kernels import random_projection_sql

    @query("random_projection_reduce", random_projection_sql(out_dim=16, dim=64))
    def random_projection_reduce(spark, sf_dir):
        """JL random projection of the 64-d embedding table to 16-d
        (operators/vectors.random_projection), exploded to scalar rows."""
        from ..operators.vectors import random_projection

        e = _t(spark, sf_dir, "embeddings")
        return random_projection(e, out_dim=16, seed=42)


_register_random_projection()


def _register_embedding_drift():
    from .sql_kernels import embedding_drift_sql

    @query(
        "embedding_drift_report",
        embedding_drift_sql(k=8, iters=2, where_a="vec_id % 2 = 0", where_b="vec_id % 2 = 1"),
    )
    def embedding_drift_report(spark, sf_dir):
        """Embedding-distribution drift between two corpus snapshots
        (operators/kmeans.embedding_drift): fit k-means on the standing
        corpus (even vec_ids), label both snapshots with its centroids,
        report per-cell share shift."""
        from ..operators.kmeans import embedding_drift

        e = _t(spark, sf_dir, "embeddings")
        return embedding_drift(
            e.filter(F.col("vec_id") % 2 == 0),
            e.filter(F.col("vec_id") % 2 == 1),
            k=8,
            iters=2,
        )


_register_embedding_drift()


# --- Zipf law fit over the token census --------------------------------------
@query(
    "zipf_fit_report",
    """
    WITH wc AS (
      SELECT word, count(*) AS n FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents)
      GROUP BY 1),
    r AS (SELECT n, row_number() OVER (ORDER BY n DESC, word) AS rank FROM wc),
    q AS (SELECT n,
            CAST(round(ln(rank * 1.0) * 1e6) AS BIGINT) AS qx,
            CAST(round(ln(n * 1.0) * 1e6) AS BIGINT) AS qy,
            CAST(round(ln(rank * 1.0) * ln(n * 1.0) * 1e6) AS BIGINT) AS qxy,
            CAST(round(ln(rank * 1.0) * ln(rank * 1.0) * 1e6) AS BIGINT) AS qxx,
            CAST(round(ln(n * 1.0) * ln(n * 1.0) * 1e6) AS BIGINT) AS qyy
          FROM r),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_types, CAST(sum(n) AS BIGINT) AS n_tokens,
                 sum(qx) AS sx, sum(qy) AS sy, sum(qxy) AS sxy,
                 sum(qxx) AS sxx, sum(qyy) AS syy
          FROM q)
    SELECT n_types, n_tokens,
      round(CASE WHEN (n_types * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)) > 0
                 THEN (n_types * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
                      / (n_types * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)) END, 6) AS zipf_slope,
      round(CASE WHEN (n_types * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)) > 0
                  AND (n_types * (syy / 1e6) - (sy / 1e6) * (sy / 1e6)) > 0
                 THEN (n_types * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
                      * (n_types * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
                      / ((n_types * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6))
                         * (n_types * (syy / 1e6) - (sy / 1e6) * (sy / 1e6))) END, 6) AS zipf_r2
    FROM s
    """,
)
def zipf_fit_report(spark, sf_dir):
    """Zipf-law least-squares fit over the token-frequency census, with
    micro-unit-quantized normal equations (operators/stats.py:zipf_fit)."""
    from ..operators.stats import zipf_fit

    d = _t(spark, sf_dir, "documents")
    return zipf_fit(d)


# --- engine-portable HyperLogLog (bit-identical registers) -------------------
def _hll_sql(p: int = 12) -> str:
    m = 1 << p
    low = 60 - p
    mask = (1 << low) - 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    am2 = alpha * m * m
    return f"""
    WITH v AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS val
      FROM documents),
    k AS (SELECT ('0x' || substr(sha256(val), 1, 15))::UBIGINT::BIGINT AS h
          FROM v WHERE val IS NOT NULL),
    b AS (SELECT h >> {low} AS bucket, h & {mask} AS w FROM k),
    r AS (SELECT bucket,
                 least(CASE WHEN w = 0 THEN {low + 1}
                            ELSE {low + 1} - length(bin(w)) END, 40) AS rho
          FROM b),
    regs AS (SELECT bucket, max(rho) AS M FROM r GROUP BY 1),
    cm AS (SELECT M, count(*) AS c FROM regs GROUP BY 1),
    s AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS nonzero,
                 CAST(coalesce(sum(c * (1::BIGINT << (40 - M))), 0) AS BIGINT) AS t,
                 CAST(coalesce(sum(c * M), 0) AS BIGINT) AS register_sum
          FROM cm)
    SELECT CAST({p} AS INT) AS p, CAST({m} AS BIGINT) AS m,
           nonzero AS nonzero_buckets, register_sum,
           round(CASE WHEN {am2!r} / ((({m} - nonzero) * {1 << 40}::BIGINT + t)::DOUBLE
                                      / {float(1 << 40)!r}) <= {2.5 * m!r}
                       AND ({m} - nonzero) > 0
                      THEN {float(m)!r} * ln({float(m)!r} / ({m} - nonzero)::DOUBLE)
                      ELSE {am2!r} / ((({m} - nonzero) * {1 << 40}::BIGINT + t)::DOUBLE
                                      / {float(1 << 40)!r}) END, 6) AS estimate
    FROM s
    """


@query("hll_vocab_estimate", _hll_sql())
def hll_vocab_estimate(spark, sf_dir):
    """Engine-portable HyperLogLog over the corpus token stream: vocabulary
    cardinality estimate with bit-identical registers on any engine
    (operators/stats.py:hll_count_distinct)."""
    from ..operators.stats import hll_count_distinct

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias("val")
    )
    return hll_count_distinct(toks, "val")


# --- deterministic Bloom filter (membership prefilter) -----------------------
@query(
    "bloom_membership_probe",
    """
    WITH en AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents WHERE lang = 'en'),
    pos AS (
      SELECT DISTINCT unnest(
        [('0x' || substr(sha256(w), 1 + 15*i, 15))::UBIGINT::BIGINT % 65536
         FOR i IN [0, 1, 2, 3]]) AS pos
      FROM en),
    allw AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      FROM documents),
    probe AS (
      SELECT word, unnest(
        [('0x' || substr(sha256(word), 1 + 15*i, 15))::UBIGINT::BIGINT % 65536
         FOR i IN [0, 1, 2, 3]]) AS p
      FROM allw),
    hits AS (
      SELECT word,
             sum(CASE WHEN p IN (SELECT pos FROM pos) THEN 1 ELSE 0 END) AS h
      FROM probe GROUP BY 1)
    SELECT word, CAST(h = 4 AS INT) AS member FROM hits
    """,
)
def bloom_membership_probe(spark, sf_dir):
    """Deterministic Bloom filter: build over the English sub-corpus's
    vocabulary, probe the full vocabulary — engine-portable sha-slice bit
    positions, broadcast join probe (operators/bloom.py)."""
    from ..operators.bloom import bloom_build, bloom_probe

    d = _t(spark, sf_dir, "documents")
    words = F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
    en = d.filter(F.col("lang") == "en").select(words.alias("w")).distinct()
    allw = d.select(words.alias("word")).distinct()
    bloom = bloom_build(en, "w")
    return bloom_probe(allw, bloom, "word")


@query(
    "cm_token_frequencies",
    """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS val
      FROM documents),
    pc AS (
      SELECT unnest(
        [{'r': i,
          'c': ('0x' || substr(sha256(val), 1 + 15*i, 15))::UBIGINT::BIGINT % 2048}
         FOR i IN [0, 1, 2, 3]]) AS p
      FROM toks),
    sk AS (SELECT p.r AS row, p.c AS col, count(*) AS cnt FROM pc GROUP BY 1, 2),
    words AS (
      SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      FROM documents),
    wp AS (
      SELECT word, unnest(
        [{'r': i,
          'c': ('0x' || substr(sha256(word), 1 + 15*i, 15))::UBIGINT::BIGINT % 2048}
         FOR i IN [0, 1, 2, 3]]) AS p
      FROM words)
    SELECT word, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_count
    FROM wp LEFT JOIN sk ON wp.p.r = sk.row AND wp.p.c = sk.col
    GROUP BY word
    """,
)
def cm_token_frequencies(spark, sf_dir):
    """Count-min sketch of the token stream probed with the full
    vocabulary — engine-portable counters (operators/bloom.py:
    cm_sketch_build / cm_estimate)."""
    from ..operators.bloom import cm_estimate, cm_sketch_build

    d = _t(spark, sf_dir, "documents")
    words = F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
    toks = d.select(words.alias("val"))
    vocab = d.select(words.alias("word")).distinct()
    sketch = cm_sketch_build(toks, "val")
    return cm_estimate(vocab, sketch, "word")


@query(
    "scd2_user_event_history",
    """
    WITH c AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_type) AS prev
      FROM events),
    ch AS (SELECT user_id, ts, event_type FROM c
           WHERE prev IS DISTINCT FROM event_type)
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_type) AS valid_to,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_type) AS INT) AS version
    FROM ch
    """,
)
def scd2_user_event_history(spark, sf_dir):
    """SCD2 (Kimball type-2) episode history of each user's event_type
    (operators/scd.py): change detection + [valid_from, valid_to) bounds
    in two key-partitioned window passes — no joins, no driver loop."""
    from ..operators.scd import scd2_from_events

    e = _t(spark, sf_dir, "events")
    return scd2_from_events(e, ["user_id"], "ts", ["event_type"])


@query(
    "key_skew_events_user",
    """
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
    t AS (SELECT sum(cnt) AS tot FROM c),
    r AS (SELECT user_id, cnt,
                 row_number() OVER (ORDER BY cnt DESC, user_id) AS rank
          FROM c)
    SELECT user_id, cnt,
           round(cnt * 1.0 / tot, 6) AS share,
           round(sum(cnt * 1.0 / tot) OVER (ORDER BY rank
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS cum_share,
           CAST(rank AS INT) AS rank
    FROM r CROSS JOIN t WHERE rank <= 10
    """,
)
def key_skew_events_user(spark, sf_dir):
    """Top-10 heavy user_id keys of the events table with row shares
    (operators/stats.py key_skew_report) — the salting-decision input;
    windows run over the key census, never the rows."""
    from ..operators.stats import key_skew_report

    return key_skew_report(_t(spark, sf_dir, "events"), ["user_id"], top_k=10)


@query(
    "key_skew_summary_events",
    """
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1)
    SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
           count(*) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           round(avg(cnt), 6) AS mean_cnt,
           round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
           round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
           round(max(cnt) * 1.0 / avg(cnt), 6) AS skew_ratio,
           CAST(ceil(max(cnt) / greatest(quantile_cont(cnt, 0.5), 1.0)) AS BIGINT)
             AS recommended_salt
    FROM c
    """,
)
def key_skew_summary_events(spark, sf_dir):
    """Key-distribution shape of events.user_id: exact census percentiles,
    max/mean skew ratio, and the salt factor that would split the hottest
    key into median-sized slices."""
    from ..operators.stats import key_skew_summary

    return key_skew_summary(_t(spark, sf_dir, "events"), ["user_id"])


@query(
    "funnel_view_click_purchase",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
    s3 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
    rows_ AS (
      SELECT 1 AS stage_idx, 'view' AS stage,
             (SELECT count(*) FROM s1) AS users_reached
      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
    SELECT stage_idx, stage, CAST(users_reached AS BIGINT) AS users_reached,
           round(CASE WHEN lag(users_reached) OVER (ORDER BY stage_idx) IS NULL
                      THEN 1.0
                      WHEN lag(users_reached) OVER (ORDER BY stage_idx) > 0
                      THEN users_reached * 1.0
                           / lag(users_reached) OVER (ORDER BY stage_idx)
                      ELSE 0.0 END, 6) AS conversion_from_prev,
           round(CASE WHEN first_value(users_reached)
                             OVER (ORDER BY stage_idx) > 0
                      THEN users_reached * 1.0
                           / first_value(users_reached) OVER (ORDER BY stage_idx)
                      ELSE 0.0 END, 6) AS conversion_overall
    FROM rows_
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Three-stage ordered funnel (view -> click -> purchase) over the
    events table (operators/funnel.py): per-stage filtered min-aggregates
    chained on the user key; strictly-after ordering."""
    from ..operators.funnel import funnel_conversion

    return funnel_conversion(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@query(
    "schema_drift_events_halves",
    """
    WITH old_ AS (SELECT event_id, ts, user_id, event_type
                  FROM events WHERE event_id % 2 = 0),
    new_ AS (SELECT * FROM events WHERE event_id % 2 = 1),
    so AS (SELECT count(*) AS n,
                  sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS n_event_id,
                  count(DISTINCT event_id) AS d_event_id,
                  sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS n_ts,
                  count(DISTINCT ts) AS d_ts,
                  sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS n_user_id,
                  count(DISTINCT user_id) AS d_user_id,
                  sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS n_event_type,
                  count(DISTINCT event_type) AS d_event_type
           FROM old_),
    sn AS (SELECT count(*) AS n,
                  sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS n_event_id,
                  count(DISTINCT event_id) AS d_event_id,
                  sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS n_ts,
                  count(DISTINCT ts) AS d_ts,
                  sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS n_user_id,
                  count(DISTINCT user_id) AS d_user_id,
                  sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS n_event_type,
                  count(DISTINCT event_type) AS d_event_type,
                  sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_value,
                  count(DISTINCT value) AS d_value,
                  sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS n_props,
                  count(DISTINCT props) AS d_props
           FROM new_)
    SELECT * FROM (
      SELECT 'event_id' AS column, 'common' AS status,
             'bigint' AS type_old, 'bigint' AS type_new, false AS type_changed,
             round(so.n_event_id * 1.0 / so.n, 6) AS null_rate_old,
             round(sn.n_event_id * 1.0 / sn.n, 6) AS null_rate_new,
             round(round(sn.n_event_id * 1.0 / sn.n, 6)
                   - round(so.n_event_id * 1.0 / so.n, 6), 6) AS null_rate_delta,
             CAST(so.d_event_id AS BIGINT) AS distinct_old,
             CAST(sn.d_event_id AS BIGINT) AS distinct_new
      FROM so, sn
      UNION ALL
      SELECT 'event_type', 'common', 'string', 'string', false,
             round(so.n_event_type * 1.0 / so.n, 6),
             round(sn.n_event_type * 1.0 / sn.n, 6),
             round(round(sn.n_event_type * 1.0 / sn.n, 6)
                   - round(so.n_event_type * 1.0 / so.n, 6), 6),
             CAST(so.d_event_type AS BIGINT), CAST(sn.d_event_type AS BIGINT)
      FROM so, sn
      UNION ALL
      SELECT 'props', 'added', NULL, 'string', false,
             NULL, round(sn.n_props * 1.0 / sn.n, 6), NULL,
             NULL, CAST(sn.d_props AS BIGINT)
      FROM sn
      UNION ALL
      SELECT 'ts', 'common', 'timestamp_ntz', 'timestamp_ntz', false,
             round(so.n_ts * 1.0 / so.n, 6), round(sn.n_ts * 1.0 / sn.n, 6),
             round(round(sn.n_ts * 1.0 / sn.n, 6)
                   - round(so.n_ts * 1.0 / so.n, 6), 6),
             CAST(so.d_ts AS BIGINT), CAST(sn.d_ts AS BIGINT)
      FROM so, sn
      UNION ALL
      SELECT 'user_id', 'common', 'bigint', 'bigint', false,
             round(so.n_user_id * 1.0 / so.n, 6), round(sn.n_user_id * 1.0 / sn.n, 6),
             round(round(sn.n_user_id * 1.0 / sn.n, 6)
                   - round(so.n_user_id * 1.0 / so.n, 6), 6),
             CAST(so.d_user_id AS BIGINT), CAST(sn.d_user_id AS BIGINT)
      FROM so, sn
      UNION ALL
      SELECT 'value', 'added', NULL, 'double', false,
             NULL, round(sn.n_value * 1.0 / sn.n, 6), NULL,
             NULL, CAST(sn.d_value AS BIGINT)
      FROM sn
    )
    """,
)
def schema_drift_events_halves(spark, sf_dir):
    """Schema + column-stat drift report (operators/schema_drift.py)
    between two snapshots of the events table: even ids projected to four
    columns vs odd ids with the full schema — 'value' and 'props' surface
    as added columns, common columns carry null-rate and cardinality
    deltas."""
    from ..operators.schema_drift import schema_drift_report

    e = _t(spark, sf_dir, "events")
    old = e.where(F.col("event_id") % 2 == 0).select(
        "event_id", "ts", "user_id", "event_type"
    )
    new = e.where(F.col("event_id") % 2 == 1)
    return schema_drift_report(old, new)


@query(
    "cohort_retention_weekly",
    """
    WITH first_ AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
                    FROM events GROUP BY 1),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS b FROM events),
    cells AS (
      SELECT cohort,
             CAST(date_diff('day', CAST(cohort AS DATE), CAST(b AS DATE)) // 7
                  AS BIGINT) AS "offset",
             count(*) AS active_users
      FROM act JOIN first_ USING (user_id) GROUP BY 1, 2),
    sizes AS (SELECT cohort, count(*) AS cohort_size FROM first_ GROUP BY 1)
    SELECT cohort, "offset",
           CAST(active_users AS BIGINT) AS active_users,
           CAST(cohort_size AS BIGINT) AS cohort_size,
           round(active_users * 1.0 / cohort_size, 6) AS retention
    FROM cells JOIN sizes USING (cohort)
    """,
)
def cohort_retention_weekly(spark, sf_dir):
    """Weekly cohort retention matrix over the events table
    (operators/funnel.py cohort_retention): first-seen cohorts x calendar
    week offsets — two aggregates + user-key joins, matrix-sized output."""
    from ..operators.funnel import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"), bucket="week")


# --- weekly seasonality profile ----------------------------------------------
# Two-aggregate decomposition; isodow-1 == Spark weekday() (0=Mon..6=Sun).
# Means/indices carry the 1e-9 tie-break epsilon before round(6) (the
# recursive-smoother convention) because 2-decimal values DO produce
# exact .5-boundary means.
@query(
    "weekly_profile_events",
    """
    WITH base AS (
      SELECT event_type, isodow(ts) - 1 AS weekday, CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL),
    dow AS (
      SELECT event_type, weekday, CAST(count(*) AS BIGINT) AS n_events,
             sum(v) AS s
      FROM base GROUP BY 1, 2),
    o AS (
      SELECT event_type, count(*) AS tn, sum(v) AS ts_
      FROM base GROUP BY 1)
    SELECT dow.event_type, CAST(weekday AS INT) AS weekday, n_events,
           round(s / n_events + 0.000000001, 6) AS mean_value,
           CASE WHEN ts_ / tn != 0
                THEN round((s / n_events) / (ts_ / tn) + 0.000000001, 6)
           END AS seasonal_index
    FROM dow JOIN o USING (event_type)
    """,
)
def weekly_profile_events(spark, sf_dir):
    """Weekly profile (operators/timeseries.weekly_profile) by event type."""
    from ..operators.timeseries import weekly_profile

    return weekly_profile(
        _t(spark, sf_dir, "events"), "ts", "value", by=["event_type"]
    )


# --- Holt double-exponential smoothing per user ------------------------------
# Level+trend recursion replicated by a recursive CTE carrying both
# accumulators; same IEEE-literal injection discipline as the EWMA oracle.
# Coefficients here (and in the EWMA query) are EXACT binary fractions
# (7/16, 9/16, 1/4, 3/4): decimal-friendly choices like 0.5/0.3 over the
# 2-decimal event values keep the recursion on exact decimal numbers that
# land on .5 rounding boundaries, where Spark's BigDecimal HALF_UP and
# DuckDB's scaled-multiply round() genuinely disagree (observed 2
# boundary rows per 10k before the switch).
@query(
    "holt_trend_user_value",
    """
    WITH RECURSIVE base AS (
      SELECT user_id AS k, CAST(value AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events WHERE value IS NOT NULL),
    seed AS (
      SELECT b1.k, 1 AS rn, b1.v AS l,
             CASE WHEN b1.n > 1
                  THEN (SELECT b2.v FROM base b2
                        WHERE b2.k = b1.k AND b2.rn = 2) - b1.v
                  ELSE 0.0 END AS b
      FROM base b1 WHERE b1.rn = 1),
    r AS (
      SELECT * FROM seed
      UNION ALL
      SELECT nb.k, nb.rn,
             0.4375 * nb.v + 0.5625 * (r.l + r.b) AS l,
             0.25 * ((0.4375 * nb.v + 0.5625 * (r.l + r.b)) - r.l)
               + 0.75 * r.b AS b
      FROM r JOIN base nb ON nb.k = r.k AND nb.rn = r.rn + 1)
    SELECT k AS user_id, CAST(rn AS INT) AS rn,
           round(l + 0.000000001, 6) AS level,
           round(b + 0.000000001, 6) AS trend
    FROM r
    """,
)
def holt_trend_user_value(spark, sf_dir):
    """Arrow-cogrouped Holt smoothing (operators/timeseries.holt_linear)."""
    from ..operators.timeseries import holt_linear
    from ..session import ensure_py_files

    ensure_py_files(spark)
    ev = _t(spark, sf_dir, "events")
    return holt_linear(
        ev, "user_id", "ts", "value",
        alpha=0.4375, gamma=0.25, tiebreak="event_id",
    )


# --- running EWMA per user ---------------------------------------------------
# The sequential e_t = a*x_t + (1-a)*e_(t-1) recurrence, replicated by a
# recursive CTE stepping the SAME double expression in the SAME order —
# alpha and beta are injected as Python reprs so both engines use the
# identical IEEE literals (1 - 0.3 == 0.7 exactly in binary64; pinned
# here rather than assumed).
@query(
    "ewma_user_value",
    """
    WITH RECURSIVE base AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT user_id, rn, CAST(value AS DOUBLE) AS e
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.rn,
             0.4375 * CAST(b.value AS DOUBLE) + 0.5625 * r.e
      FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
    SELECT user_id, CAST(rn AS INT) AS rn,
           round(e + 0.000000001, 6) AS ewma FROM r
    """,
)
def ewma_user_value(spark, sf_dir):
    """Arrow-cogrouped running EWMA (operators/timeseries.ewma_running)."""
    from ..operators.timeseries import ewma_running
    from ..session import ensure_py_files

    ensure_py_files(spark)
    ev = _t(spark, sf_dir, "events")
    return ewma_running(
        ev, "user_id", "ts", "value", alpha=0.4375, tiebreak="event_id"
    )


@query(
    "resample_user_events_daily",
    """
    WITH agg AS (
      SELECT user_id AS key, date_trunc('day', ts) AS bucket,
             count(*) AS n_events, round(sum(value), 6) AS sum_value
      FROM events GROUP BY 1, 2),
    spans AS (SELECT key, min(bucket) AS lo, max(bucket) AS hi
              FROM agg GROUP BY 1),
    grid AS (SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
             FROM spans),
    filled AS (SELECT g.key, g.bucket, agg.n_events, agg.sum_value
               FROM grid g LEFT JOIN agg ON agg.key = g.key
                                        AND agg.bucket = g.bucket)
    SELECT key AS user_id, bucket,
           CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
           sum_value,
           last(round(sum_value / n_events, 6) IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS avg_filled
    FROM filled
    """,
)
def resample_user_events_daily(spark, sf_dir):
    """Per-user daily resampling with gap buckets and LOCF-filled daily
    averages (operators/timeseries.py): the grid explodes SPANS, never
    events, and the fill is one key-partitioned window."""
    from ..operators.timeseries import resample_events

    return resample_events(_t(spark, sf_dir, "events"), unit="day")


@query(
    "markov_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS to_state,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_type) AS from_state
      FROM events),
    pairs AS (SELECT from_state, to_state, count(*) AS n FROM seq
              WHERE from_state IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT from_state, sum(n) AS t FROM pairs GROUP BY 1)
    SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / t, 6) AS prob
    FROM pairs JOIN tot USING (from_state)
    """,
)
def markov_event_transitions(spark, sf_dir):
    """Order-1 Markov transition matrix of per-user event sequences
    (operators/funnel.py markov_transitions): one lag window + one
    census; rows normalize per from-state."""
    from ..operators.funnel import markov_transitions

    return markov_transitions(_t(spark, sf_dir, "events"))


@query(
    "ab_test_events_value",
    """
    WITH s AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
             count(*) AS n, avg(value) AS m, var_samp(value) AS s2
      FROM events WHERE value IS NOT NULL GROUP BY 1)
    SELECT a.v AS variant_a, b.v AS variant_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.m, 6) AS mean_a, round(b.m, 6) AS mean_b,
           round(a.m - b.m, 6) AS mean_diff,
           round((a.m - b.m) / sqrt(a.s2 / a.n + b.s2 / b.n), 6) AS z_score,
           abs((a.m - b.m) / sqrt(a.s2 / a.n + b.s2 / b.n)) >= 1.96
             AS significant
    FROM s a JOIN s b ON a.v < b.v
    """,
)
def ab_test_events_value(spark, sf_dir):
    """Two-sample Welch z-test (operators/stats.py ab_test_report) on the
    event value metric with users split into A/B by id parity — one
    variant-keyed aggregate, the comparison over the variants frame."""
    from ..operators.stats import ab_test_report

    e = _t(spark, sf_dir, "events").withColumn(
        "variant",
        F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")),
    )
    return ab_test_report(e, "variant", "value")


@query(
    "association_rules_lineitem",
    """
    WITH inc AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    nb AS (SELECT count(DISTINCT b) AS n FROM inc),
    ic AS (SELECT i, count(*) AS c FROM inc GROUP BY 1),
    pc AS (SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_baskets
           FROM inc a JOIN inc c ON a.b = c.b AND a.i <> c.i
           GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT item_a, item_b, CAST(n_baskets AS BIGINT) AS n_baskets,
           round(n_baskets * 1.0 / nb.n, 6) AS support,
           round(n_baskets * 1.0 / ca.c, 6) AS confidence,
           round(n_baskets * 1.0 * nb.n / (ca.c * 1.0 * cb.c), 6) AS lift
    FROM pc
    JOIN ic ca ON ca.i = pc.item_a
    JOIN ic cb ON cb.i = pc.item_b
    CROSS JOIN nb
    """,
)
def association_rules_lineitem(spark, sf_dir):
    """Directed association rules over order baskets of parts
    (operators/basket.py): support/confidence/lift at min co-basket 3 —
    pairs exist only within baskets, never corpus-wide."""
    from ..operators.basket import association_rules

    return association_rules(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey", min_support=3
    )


@query(
    "activity_streaks_users",
    """
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    g AS (SELECT user_id, d,
                 d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                          AS INT) AS grp
          FROM days)
    SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
           CAST(count(*) AS BIGINT) AS n_days
    FROM g GROUP BY user_id, grp
    """,
)
def activity_streaks_users(spark, sf_dir):
    """Consecutive-active-day streaks per user (gaps-and-islands,
    operators/timeseries.py activity_streaks): distinct days, one
    key-window, one aggregate."""
    from ..operators.timeseries import activity_streaks

    return activity_streaks(_t(spark, sf_dir, "events"))


@query(
    "ols_trend_value_by_type",
    """
    WITH b AS (SELECT event_type, floor(epoch(ts)) AS x, value AS y FROM events
               WHERE ts IS NOT NULL AND value IS NOT NULL),
    a AS (SELECT event_type, count(*) AS n, covar_samp(x, y) AS cxy,
                 var_samp(x) AS vx, var_samp(y) AS vy,
                 avg(x) AS mx, avg(y) AS my
          FROM b GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(CASE WHEN vx > 0 THEN cxy / vx END, 6) AS slope,
           round(my - (CASE WHEN vx > 0 THEN cxy / vx END) * mx, 6) AS intercept,
           round(CASE WHEN vx > 0 AND vy > 0
                      THEN cxy * cxy / (vx * vy) END, 6) AS r2
    FROM a
    """,
)
def ols_trend_value_by_type(spark, sf_dir):
    """Closed-form per-event-type OLS trend of value over epoch seconds
    (operators/stats.py ols_trend) — one moment aggregate per group."""
    from ..operators.stats import ols_trend

    e = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .withColumn("x", F.unix_timestamp("ts").cast("double"))
    )
    return ols_trend(e, "x", "value", ["event_type"])


@query(
    "chi2_lang_source_documents",
    """
    WITH cont AS (SELECT lang AS a, source AS b, count(*) AS n
                  FROM documents GROUP BY 1, 2),
    r AS (SELECT a, sum(n) AS ra FROM cont GROUP BY 1),
    c AS (SELECT b, sum(n) AS cb FROM cont GROUP BY 1),
    t AS (SELECT sum(n) AS nn FROM cont),
    chi AS (SELECT sum(pow(cont.n - ra * cb * 1.0 / nn, 2)
                       / (ra * cb * 1.0 / nn)) AS chi2
            FROM cont JOIN r USING (a) JOIN c USING (b) CROSS JOIN t),
    shape AS (SELECT (SELECT count(*) FROM r) AS nr,
                     (SELECT count(*) FROM c) AS nc)
    SELECT CAST(nn AS BIGINT) AS n,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS df_degrees,
           round(chi2, 6) AS chi2,
           round(CASE WHEN least(nr, nc) > 1
                      THEN sqrt(chi2 / (nn * (least(nr, nc) - 1)))
                      ELSE 0.0 END, 6) AS cramers_v
    FROM t, chi, shape
    """,
)
def chi2_lang_source_documents(spark, sf_dir):
    """Pearson chi-square independence of (lang, source) with Cramer's V
    (operators/stats.py chi_square_independence) — contingency-census
    arithmetic only."""
    from ..operators.stats import chi_square_independence

    return chi_square_independence(_t(spark, sf_dir, "documents"), "lang", "source")


@query(
    "weighted_median_lineitem",
    """
    WITH c AS (SELECT l_returnflag, l_extendedprice AS v,
                      sum(l_quantity) AS w
               FROM lineitem
               WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
               GROUP BY 1, 2),
    r AS (SELECT l_returnflag, v,
                 sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
                 sum(w) OVER (PARTITION BY l_returnflag) AS tot
          FROM c)
    SELECT l_returnflag, round(tot, 6) AS total_weight,
           round(min(v), 6) AS weighted_median
    FROM r WHERE cum * 2 >= tot
    GROUP BY l_returnflag, tot
    """,
)
def weighted_median_lineitem(spark, sf_dir):
    """Quantity-weighted lower median of extended price per return flag
    (operators/stats.py weighted_median) — one cumulative window over the
    per-group value census."""
    from ..operators.stats import weighted_median

    return weighted_median(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        ["l_returnflag"],
    )


# --- 2D Pareto frontier (skyline) over the part catalog ----------------------
# The oracle is the O(n^2) NOT-EXISTS dominance definition; the engine
# computes the same set with one hash aggregate + a domain-sized window +
# a broadcast semi-join (operators/stats.pareto_frontier_2d).
@query(
    "pareto_frontier_parts",
    """
    SELECT p_partkey, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
    """,
)
def pareto_frontier_parts(spark, sf_dir):
    from ..operators.stats import pareto_frontier_2d

    part = _t(spark, sf_dir, "part")
    return pareto_frontier_2d(part, "p_retailprice", "p_size").select(
        "p_partkey", "p_retailprice", "p_size"
    )


# --- decorrelated correlated subquery: orders above their customer's mean ---
# The classic correlated-scalar-subquery shape (per-row comparison against
# the row's own group aggregate), expressed as ONE partitioned window pass
# instead of a per-row subquery — no self-join, no shuffle beyond the
# partition-by exchange.
@query(
    "above_avg_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, round(a, 6) AS cust_avg
    FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                 avg(o_totalprice) OVER (PARTITION BY o_custkey) AS a
          FROM orders)
    WHERE o_totalprice > a
    """,
)
def above_avg_orders(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("a", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > F.col("a"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.round("a", 6).alias("cust_avg"),
        )
    )


# --- NTILE segmentation: customer balance deciles ----------------------------
# Global NTILE needs a total order (single-partition window) — so the
# engine runs it over the (c_acctbal, c_custkey) projection only and
# reduces to the 10-row decile summary before anything leaves the window
# stage; the full-width table never sorts.
@query(
    "ntile_customer_deciles",
    """
    SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal
    FROM (SELECT c_acctbal,
                 ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
          FROM customer)
    GROUP BY decile
    """,
)
def ntile_customer_deciles(spark, sf_dir):
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


# --- exact two-sample KS drift between event-id halves -----------------------
# Distribution-drift screen: per event_type, the exact KS statistic between
# the value distributions of even- and odd-id events (a deterministic A/B
# split standing in for "yesterday vs today"). Census first, ONE
# partitioned window over distinct values — never a global sort.
@query(
    "ks_drift_events_value",
    """
    WITH counts AS (
      SELECT event_type, value,
             sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END) AS nb
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, value),
    cum AS (
      SELECT event_type,
             sum(na) OVER (PARTITION BY event_type ORDER BY value)
               * 1.0 / sum(na) OVER (PARTITION BY event_type)
             - sum(nb) OVER (PARTITION BY event_type ORDER BY value)
               * 1.0 / sum(nb) OVER (PARTITION BY event_type) AS gap,
             sum(na) OVER (PARTITION BY event_type) AS ta,
             sum(nb) OVER (PARTITION BY event_type) AS tb
      FROM counts)
    SELECT event_type, CAST(max(ta) AS BIGINT) AS n_a,
           CAST(max(tb) AS BIGINT) AS n_b,
           round(max(abs(gap)), 6) AS ks_d
    FROM cum GROUP BY event_type
    """,
)
def ks_drift_events_value(spark, sf_dir):
    from ..operators.stats import ks_statistic

    e = _t(spark, sf_dir, "events").withColumn(
        "in_a", F.pmod(F.col("event_id"), F.lit(2)) == 0
    )
    return ks_statistic(e, "value", "in_a", by=["event_type"])


# --- Benford first-digit conformance over order totals -----------------------
# The digit comes from the integer part's decimal string (exact — no float
# log in the extraction); expected proportions are log10(1 + 1/d).
@query(
    "benford_orders_totalprice",
    """
    WITH d AS (
      SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
               AS digit,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM orders WHERE o_totalprice >= 1 GROUP BY 1)
    SELECT digit, n_obs,
           round(n_obs * 1.0 / sum(n_obs) OVER (), 6) AS obs_p,
           round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p
    FROM d
    """,
)
def benford_orders_totalprice(spark, sf_dir):
    from ..operators.stats import benford_report

    return benford_report(_t(spark, sf_dir, "orders"), "o_totalprice")


# --- exponential time-decayed user value (feature-store aggregate) -----------
# Closed-form decay (no sequential EWMA recurrence): one scan + one hash
# aggregate, horizon = the table's max timestamp broadcast as a 1-row frame.
# ln(2) is inlined as the identical double on both sides.
@query(
    "decayed_user_value",
    """
    WITH h AS (SELECT max(ts) AS mx FROM events)
    SELECT user_id,
           round(sum(value * exp(-0.6931471805599453
                 * ((epoch(h.mx) - epoch(ts)) / 86400.0) / 30.0)), 6)
             AS decayed_sum,
           round(sum(exp(-0.6931471805599453
                 * ((epoch(h.mx) - epoch(ts)) / 86400.0) / 30.0)), 6)
             AS decayed_weight,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events, h GROUP BY user_id
    """,
)
def decayed_user_value(spark, sf_dir):
    from ..operators.timeseries import decayed_value

    return decayed_value(
        _t(spark, sf_dir, "events"), "user_id", "ts", "value", half_life_days=30.0
    )


# --- period-over-period growth report ----------------------------------------
# Week-over-week event volume per type: collapse to the (type, week)
# census FIRST, then lag over report-sized rows. Monday-start weeks in
# both engines (ISO date_trunc).
@query(
    "wow_event_growth",
    """
    WITH cur AS (
      SELECT event_type, date_trunc('week', ts) AS period,
             CAST(count(*) AS BIGINT) AS n_rows,
             round(sum(value), 6) AS value_sum
      FROM events GROUP BY 1, 2)
    SELECT event_type, period, n_rows, value_sum,
           lag(n_rows) OVER w AS prev_n_rows,
           CASE WHEN lag(n_rows) OVER w IS NOT NULL
                 AND lag(n_rows) OVER w <> 0
                THEN round(n_rows * 1.0 / lag(n_rows) OVER w, 6) END AS growth
    FROM cur
    WINDOW w AS (PARTITION BY event_type ORDER BY period)
    """,
)
def wow_event_growth(spark, sf_dir):
    from ..operators.timeseries import period_over_period

    return period_over_period(
        _t(spark, sf_dir, "events"), "ts", by=["event_type"], value="value", unit="week"
    )


# --- RFM segmentation over the order history ---------------------------------
# Census-first: the three NTILE windows run over per-customer rows only,
# never the raw fact table; monetary is rounded to cents before ranking so
# tile assignment is stable across summation orders.
@query(
    "rfm_customer_segments",
    """
    WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
    agg AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                            CAST((SELECT maxd FROM mx) AS DATE)) AS BIGINT)
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY recency_days ASC, o_custkey)
                AS BIGINT) AS r_q,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey)
                AS BIGINT) AS f_q,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
                AS BIGINT) AS m_q
    FROM agg
    """,
)
def rfm_customer_segments(spark, sf_dir):
    from ..operators.stats import rfm_segments

    return rfm_segments(
        _t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", "o_totalprice"
    )


# --- all-pairs Pearson + Spearman correlation --------------------------------
# Both engines use the SAME closed-form moment identity (not their builtin
# corr(), whose accumulation algorithms differ) and the same fractional-rank
# definition, so round(6) agreement is structural. Listwise null deletion
# keeps every pair over one row set.
@query(
    "correlation_lineitem",
    """
    WITH base AS (
      SELECT l_quantity AS x1, l_extendedprice AS x2, l_discount AS x3
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL),
    r AS (
      SELECT x1, x2, x3,
             rank() OVER (ORDER BY x1)
               + (count(*) OVER (PARTITION BY x1) - 1) / 2.0 AS r1,
             rank() OVER (ORDER BY x2)
               + (count(*) OVER (PARTITION BY x2) - 1) / 2.0 AS r2,
             rank() OVER (ORDER BY x3)
               + (count(*) OVER (PARTITION BY x3) - 1) / 2.0 AS r3
      FROM base),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS n_rows,
             sum(x1) AS s1, sum(x1*x1) AS ss1,
             sum(x2) AS s2, sum(x2*x2) AS ss2,
             sum(x3) AS s3, sum(x3*x3) AS ss3,
             sum(r1) AS t1, sum(r1*r1) AS tt1,
             sum(r2) AS t2, sum(r2*r2) AS tt2,
             sum(r3) AS t3, sum(r3*r3) AS tt3,
             sum(x1*x2) AS p12, sum(x1*x3) AS p13, sum(x2*x3) AS p23,
             sum(r1*r2) AS q12, sum(r1*r3) AS q13, sum(r2*r3) AS q23
      FROM r)
    SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
           CAST(n_rows AS BIGINT) AS n_rows,
           CASE WHEN sqrt((n*ss1 - s1*s1)*(n*ss2 - s2*s2)) > 0 THEN
             round((n*p12 - s1*s2)/sqrt((n*ss1 - s1*s1)*(n*ss2 - s2*s2)), 6)
           END AS pearson,
           CASE WHEN sqrt((n*tt1 - t1*t1)*(n*tt2 - t2*t2)) > 0 THEN
             round((n*q12 - t1*t2)/sqrt((n*tt1 - t1*t1)*(n*tt2 - t2*t2)), 6)
           END AS spearman
    FROM m
    UNION ALL
    SELECT 'l_quantity', 'l_discount', CAST(n_rows AS BIGINT),
           CASE WHEN sqrt((n*ss1 - s1*s1)*(n*ss3 - s3*s3)) > 0 THEN
             round((n*p13 - s1*s3)/sqrt((n*ss1 - s1*s1)*(n*ss3 - s3*s3)), 6)
           END,
           CASE WHEN sqrt((n*tt1 - t1*t1)*(n*tt3 - t3*t3)) > 0 THEN
             round((n*q13 - t1*t3)/sqrt((n*tt1 - t1*t1)*(n*tt3 - t3*t3)), 6)
           END
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount', CAST(n_rows AS BIGINT),
           CASE WHEN sqrt((n*ss2 - s2*s2)*(n*ss3 - s3*s3)) > 0 THEN
             round((n*p23 - s2*s3)/sqrt((n*ss2 - s2*s2)*(n*ss3 - s3*s3)), 6)
           END,
           CASE WHEN sqrt((n*tt2 - t2*t2)*(n*tt3 - t3*t3)) > 0 THEN
             round((n*q23 - t2*t3)/sqrt((n*tt2 - t2*t2)*(n*tt3 - t3*t3)), 6)
           END
    FROM m
    """,
)
def correlation_lineitem(spark, sf_dir):
    from ..operators.stats import correlation_report

    return correlation_report(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


# --- Mann-Whitney U rank-sum test --------------------------------------------
# Exact rank sums from the per-value census (ties contribute via t^3 - t);
# the tie term is computed in DOUBLE on both engines so the z agrees after
# round(6) regardless of summation order.
@query(
    "mw_u_purchase_vs_click",
    """
    WITH c AS (
      SELECT value,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb,
             CAST(count(*) AS BIGINT) AS ct
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
      GROUP BY value),
    r AS (
      SELECT *,
             sum(ct) OVER (ORDER BY value) - ct + (ct + 1) / 2.0 AS avg_rank
      FROM c),
    m AS (
      SELECT CAST(sum(ca) AS DOUBLE) AS na, CAST(sum(cb) AS DOUBLE) AS nb,
             sum(ca * avg_rank) AS ra,
             sum((ct * 1.0) * ct * ct - ct) AS ties
      FROM r)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(ra - na * (na + 1) / 2, 2) AS u_a,
           round(na * nb - (ra - na * (na + 1) / 2), 2) AS u_b,
           CASE WHEN na * nb / 12 * ((na + nb + 1)
                  - ties / ((na + nb) * (na + nb - 1))) > 0 THEN
             round((ra - na * (na + 1) / 2 - na * nb / 2)
                   / sqrt(na * nb / 12 * ((na + nb + 1)
                          - ties / ((na + nb) * (na + nb - 1)))), 6)
           END AS z
    FROM m
    """,
)
def mw_u_purchase_vs_click(spark, sf_dir):
    from ..operators.stats import mann_whitney_u

    return mann_whitney_u(
        _t(spark, sf_dir, "events"), "value", "event_type", "purchase", "click"
    )


# --- Gini concentration per group --------------------------------------------
# Census-first rank-weighted sum: a run of c ties at value v after cum rows
# contributes v*(c*cum + c*(c+1)/2) — exact on both engines.
@query(
    "gini_event_value",
    """
    WITH census AS (
      SELECT event_type, value, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL AND value >= 0
      GROUP BY 1, 2),
    cum AS (
      SELECT event_type, value, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY value) - c AS cb
      FROM census),
    g AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS n_rows,
             sum(value * c) AS t,
             sum(value * (c * cb + c * (c + 1) / 2.0)) AS sw
      FROM cum GROUP BY 1)
    SELECT event_type, n_rows,
           round(t, 6) AS total_value,
           CASE WHEN t > 0 THEN
             round(2.0 * sw / (n_rows * t) - (n_rows + 1.0) / n_rows, 6)
           END AS gini
    FROM g
    """,
)
def gini_event_value(spark, sf_dir):
    from ..operators.stats import gini_report

    return gini_report(_t(spark, sf_dir, "events"), ["event_type"], "value")


# --- mutual information between two categorical columns ----------------------
# Everything computed from contingency-census rows (marginals via the
# sum_xy (c/n)ln(cx/n) == sum_x (cx/n)ln(cx/n) identity) — no NULL-keyed
# joins; ratios divide before multiplying so nothing overflows at scale.
@query(
    "mutual_information_docs",
    """
    WITH census AS (
      SELECT lang AS x, source AS y, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    t AS (
      SELECT c,
             sum(c) OVER (PARTITION BY x) AS cx,
             sum(c) OVER (PARTITION BY y) AS cy,
             (SELECT sum(c) FROM census) AS n
      FROM census),
    m AS (
      SELECT max(n) AS n_rows,
             -sum((c * 1.0 / n) * ln(cx * 1.0 / n)) AS hx,
             -sum((c * 1.0 / n) * ln(cy * 1.0 / n)) AS hy,
             -sum((c * 1.0 / n) * ln(c * 1.0 / n)) AS hxy,
             sum((c * 1.0 / n) * ln((c * 1.0 / n)
                 / ((cx * 1.0 / n) * (cy * 1.0 / n)))) AS mi
      FROM t)
    SELECT CAST(n_rows AS BIGINT) AS n_rows,
           round(hx, 6) AS h_x, round(hy, 6) AS h_y, round(hxy, 6) AS h_xy,
           round(mi, 6) AS mi,
           CASE WHEN hx > 0 AND hy > 0
                THEN round(mi / sqrt(hx * hy), 6) END AS nmi
    FROM m
    """,
)
def mutual_information_docs(spark, sf_dir):
    from ..operators.stats import mutual_information

    return mutual_information(_t(spark, sf_dir, "documents"), "lang", "source")


# --- association rules under a basket-size cap -------------------------------
# The C(items,2)-per-basket guard exercised end-to-end: orders with more
# than 5 distinct parts are excluded from the universe BEFORE pairing, and
# support/lift renormalize over the kept baskets.
@query(
    "association_rules_capped",
    """
    WITH inc0 AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    sizes AS (SELECT b, count(*) AS bs FROM inc0 GROUP BY 1),
    inc AS (SELECT inc0.* FROM inc0 JOIN sizes USING (b) WHERE bs <= 5),
    nb AS (SELECT count(DISTINCT b) AS n FROM inc),
    ic AS (SELECT i, count(*) AS ci FROM inc GROUP BY 1),
    pc AS (SELECT a.i AS item_a, b2.i AS item_b, CAST(count(*) AS BIGINT)
             AS n_baskets
           FROM inc a JOIN inc b2 ON a.b = b2.b AND a.i <> b2.i
           GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT item_a, item_b, n_baskets,
           round(n_baskets * 1.0 / nb.n, 6) AS support,
           round(n_baskets * 1.0 / ca.ci, 6) AS confidence,
           round(n_baskets * 1.0 * nb.n / (ca.ci * cb.ci), 6) AS lift
    FROM pc CROSS JOIN nb
    JOIN ic ca ON ca.i = pc.item_a
    JOIN ic cb ON cb.i = pc.item_b
    """,
)
def association_rules_capped(spark, sf_dir):
    from ..operators.basket import association_rules

    return association_rules(
        _t(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_support=2,
        max_basket_size=5,
    )


# --- cohort lifetime value ---------------------------------------------------
# Value companion to the retention matrix; period values rounded to 6
# BEFORE the cumulative sum so the running total is summation-order stable
# across engines.
@query(
    "cohort_ltv_weekly",
    """
    WITH first_ AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
                    FROM events GROUP BY 1),
    ev AS (SELECT user_id, date_trunc('week', ts) AS b, value AS v
           FROM events WHERE value IS NOT NULL),
    cells AS (
      SELECT cohort,
             CAST(date_diff('day', CAST(cohort AS DATE), CAST(b AS DATE)) // 7
                  AS BIGINT) AS "offset",
             round(sum(v), 6) AS period_value
      FROM ev JOIN first_ USING (user_id) GROUP BY 1, 2),
    sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
              FROM first_ GROUP BY 1),
    cum AS (
      SELECT cohort, "offset", period_value,
             round(sum(period_value)
                   OVER (PARTITION BY cohort ORDER BY "offset"), 6)
               AS cum_value
      FROM cells)
    SELECT cohort, "offset", period_value, cum_value, cohort_size,
           round(cum_value / cohort_size, 6) AS ltv_per_user
    FROM cum JOIN sizes USING (cohort)
    """,
)
def cohort_ltv_weekly(spark, sf_dir):
    from ..operators.funnel import cohort_ltv

    return cohort_ltv(_t(spark, sf_dir, "events"), bucket="week")


# --- physical sortedness audit -----------------------------------------------
# "If rows land in event_id (arrival) order per user, how sorted are they
# by timestamp?" — the zone-map-pruning question answered by one window
# pass; adjacency is deterministic (pos ties broken by the order column).
@query(
    "sortedness_events_ts",
    """
    WITH s AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY event_id, ts)
               AS prev_ts
      FROM events WHERE ts IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(prev_ts) AS BIGINT) AS n_pairs,
           CAST(COALESCE(sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_inversions,
           round(1.0 - COALESCE(sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END),
                                0)
                 * 1.0 / greatest(count(prev_ts), 1), 6) AS sortedness
    FROM s
    """,
)
def sortedness_events_ts(spark, sf_dir):
    from ..operators.layout import sortedness_report

    return sortedness_report(
        _t(spark, sf_dir, "events"), "user_id", "event_id", "ts"
    )


# --- Kaplan-Meier user-lifetime survival -------------------------------------
# Everything runs on the duration census; the running product is
# exp(cum-sum(ln)) so both engines window-sum identical doubles. Deaths
# precede censoring at equal durations (both count in their own risk set).
@query(
    "kaplan_meier_user_lifetimes",
    """
    WITH lives AS (
      SELECT ((event_id % 4096) * 2654435761) % 4096 AS life_id,
             CAST(min(ts) AS DATE) AS f, CAST(max(ts) AS DATE) AS l
      FROM events GROUP BY 1),
    hz AS (SELECT CAST(max(ts) AS DATE) AS h FROM events),
    marked AS (
      SELECT date_diff('day', f, l) AS d,
             date_diff('day', l, h) >= 7 AS obs
      FROM lives CROSS JOIN hz),
    census AS (
      SELECT CAST(d AS BIGINT) AS duration_days,
             CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT)
               AS n_censored
      FROM marked GROUP BY 1),
    cum AS (
      SELECT *,
             sum(n_events + n_censored) OVER () AS total,
             sum(n_events + n_censored) OVER (ORDER BY duration_days)
               - (n_events + n_censored) AS before_
      FROM census),
    s AS (
      SELECT duration_days, n_events, n_censored,
             total - before_ AS n_at_risk,
             CASE WHEN n_events > 0
                  THEN ln(1.0 - n_events / (total - before_))
                  ELSE 0.0 END AS step
      FROM cum)
    SELECT duration_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           n_events, n_censored,
           round(exp(sum(step) OVER (ORDER BY duration_days)), 6) AS survival
    FROM s
    """,
)
def kaplan_meier_user_lifetimes(spark, sf_dir):
    # lives keyed by a multiplicative-hash id (~2.4 events/key at the
    # gate's sf, times scattered) so the curve carries real deaths AND
    # censoring; per-user lives on this synthetic corpus all span the
    # window (degenerate S == 1). event_id is reduced mod 4096 BEFORE
    # the multiply: the raw 64-bit product overflows at larger scale
    # factors, where DuckDB/ANSI-Spark error while non-ANSI Spark wraps
    # to a negative dividend whose % diverges — the reduced form is
    # congruent (mod 4096 divides the multiplicand grid) and stays
    # within int64 on every engine at any scale.
    from ..operators.stats import kaplan_meier

    ev = _t(spark, sf_dir, "events").withColumn(
        "life_id",
        ((F.col("event_id") % 4096) * F.lit(2654435761)) % 4096,
    )
    return kaplan_meier(ev, "life_id", "ts", censor_days=7)


# --- difference-in-differences on event value --------------------------------
# Synthetic two-group/two-period design: odd user_ids "treated", post =
# second half of the observation window. Cell means rounded before the
# estimate so DiD is summation-order stable.
@query(
    "did_event_value",
    """
    WITH base AS (
      SELECT user_id % 2 = 1 AS t, ts >= TIMESTAMP '2024-01-16' AS p, value AS v
      FROM events WHERE value IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             round(avg(CASE WHEN t AND NOT p THEN v END), 6) AS treat_pre,
             round(avg(CASE WHEN t AND p THEN v END), 6) AS treat_post,
             round(avg(CASE WHEN NOT t AND NOT p THEN v END), 6) AS ctrl_pre,
             round(avg(CASE WHEN NOT t AND p THEN v END), 6) AS ctrl_post
      FROM base)
    SELECT n_rows, treat_pre, treat_post, ctrl_pre, ctrl_post,
           round((treat_post - treat_pre) - (ctrl_post - ctrl_pre), 6) AS did
    FROM m
    """,
)
def did_event_value(spark, sf_dir):
    from ..operators.stats import diff_in_diff

    ev = _t(spark, sf_dir, "events")
    return diff_in_diff(
        ev,
        treated=F.col("user_id") % 2 == 1,
        post=F.col("ts") >= F.lit("2024-01-16").cast("timestamp"),
        value="value",
    )


# --- fixed-width histogram ---------------------------------------------------
# Deterministic bin edges: floor(v/w)*w, no data-dependent boundaries.
@query(
    "histogram_order_totalprice",
    """
    WITH census AS (
      SELECT o_orderpriority,
             round(floor(o_totalprice / 25000.0) * 25000.0, 6) AS bin_lo,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY 1, 2)
    SELECT o_orderpriority, bin_lo, n_obs,
           round(n_obs * 1.0 / sum(n_obs)
                 OVER (PARTITION BY o_orderpriority), 6) AS frac
    FROM census
    """,
)
def histogram_order_totalprice(spark, sf_dir):
    from ..operators.stats import histogram_report

    return histogram_report(
        _t(spark, sf_dir, "orders"), "o_totalprice",
        by=["o_orderpriority"], bin_width=25000.0,
    )


def _hll_merge_sql(p: int = 12) -> str:
    m = 1 << p
    low = 60 - p
    mask = (1 << low) - 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    am2 = alpha * m * m
    est = (
        f"""round(CASE WHEN {am2!r} / ((({m} - nonzero) * {1 << 40}::BIGINT + t)::DOUBLE
                                      / {float(1 << 40)!r}) <= {2.5 * m!r}
                       AND ({m} - nonzero) > 0
                      THEN {float(m)!r} * ln({float(m)!r} / ({m} - nonzero)::DOUBLE)
                      ELSE {am2!r} / ((({m} - nonzero) * {1 << 40}::BIGINT + t)::DOUBLE
                                      / {float(1 << 40)!r}) END, 6)"""
    )
    return f"""
    WITH v AS (
      SELECT o_orderpriority AS source, CAST(o_orderkey AS VARCHAR) AS val
      FROM orders),
    k AS (SELECT source, ('0x' || substr(sha256(val), 1, 15))::UBIGINT::BIGINT AS h
          FROM v WHERE val IS NOT NULL),
    b AS (SELECT source, h >> {low} AS bucket, h & {mask} AS w FROM k),
    r AS (SELECT source, bucket,
                 least(CASE WHEN w = 0 THEN {low + 1}
                            ELSE {low + 1} - length(bin(w)) END, 40) AS rho
          FROM b),
    regs AS (SELECT source, bucket, max(rho) AS M FROM r GROUP BY 1, 2),
    merged AS (SELECT '__merged__' AS source, bucket, max(M) AS M
               FROM regs GROUP BY 2),
    allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
    cm AS (SELECT source, M, count(*) AS c FROM allregs GROUP BY 1, 2),
    s AS (SELECT source,
                 CAST(coalesce(sum(c), 0) AS BIGINT) AS nonzero,
                 CAST(coalesce(sum(c * (1::BIGINT << (40 - M))), 0) AS BIGINT) AS t,
                 CAST(coalesce(sum(c * M), 0) AS BIGINT) AS register_sum
          FROM cm GROUP BY 1)
    SELECT source, nonzero AS nonzero_buckets, register_sum,
           {est} AS estimate
    FROM s
    """


# --- HLL sketch merge rollup -------------------------------------------------
# The 100 TB distinct-count pattern made a value-checked gate: per-group
# register files max-merge into the union's registers, and the merged
# estimate is verified value-for-value alongside every per-group row.
# Order keys are DISJOINT across priorities, so the merged estimate is a
# genuine union (~5x any part), not a shared-set degenerate case.
@query("hll_merge_sources", _hll_merge_sql())
def hll_merge_sources(spark, sf_dir):
    from ..operators.stats import hll_estimate_by, hll_grouped_registers

    d = _t(spark, sf_dir, "orders")
    toks = d.select(
        F.col("o_orderpriority").alias("source"),
        F.col("o_orderkey").cast("string").alias("val"),
    )
    regs = hll_grouped_registers(toks, ["source"], "val", p=12)
    merged = regs.groupBy("bucket").agg(F.max("M").alias("M")).select(
        F.lit("__merged__").alias("source"), "bucket", "M"
    )
    return hll_estimate_by(regs.unionByName(merged), ["source"], p=12)


def _hll_est_cols(p: int = 12) -> str:
    """DuckDB select-list fragment computing (nonzero, register_sum,
    estimate) from grouped (c, M) census columns — same exact-integer
    arithmetic as operators/stats.py hll_estimate_by."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    am2 = alpha * m * m
    return f"""
      CAST(coalesce(sum(c), 0) AS BIGINT) AS nonzero_buckets,
      CAST(coalesce(sum(c * M), 0) AS BIGINT) AS register_sum,
      round(CASE WHEN {am2!r} / ((({m} - coalesce(sum(c), 0)) * {1 << 40}::BIGINT
                 + coalesce(sum(c * (1::BIGINT << (40 - M))), 0))::DOUBLE
                 / {float(1 << 40)!r}) <= {2.5 * m!r}
                 AND ({m} - coalesce(sum(c), 0)) > 0
            THEN {float(m)!r} * ln({float(m)!r}
                 / ({m} - coalesce(sum(c), 0))::DOUBLE)
            ELSE {am2!r} / ((({m} - coalesce(sum(c), 0)) * {1 << 40}::BIGINT
                 + coalesce(sum(c * (1::BIGINT << (40 - M))), 0))::DOUBLE
                 / {float(1 << 40)!r}) END, 6) AS estimate"""


def _hll_reg_ctes(src_select: str, p: int = 12) -> str:
    """Grouped register-file CTE chain: ``src_select`` must yield (g, val)."""
    low = 60 - p
    mask = (1 << low) - 1
    return f"""
    v AS ({src_select}),
    k AS (SELECT g, ('0x' || substr(sha256(val), 1, 15))::UBIGINT::BIGINT AS h
          FROM v WHERE val IS NOT NULL),
    b AS (SELECT g, h >> {low} AS bucket, h & {mask} AS w FROM k),
    r AS (SELECT g, bucket,
                 least(CASE WHEN w = 0 THEN {low + 1}
                            ELSE {low + 1} - length(bin(w)) END, 40) AS rho
          FROM b),
    regs AS (SELECT g, bucket, max(rho) AS M FROM r GROUP BY 1, 2)"""


# --- HLL pairwise audience overlap -------------------------------------------
# Inclusion-exclusion on register files: one data scan, every pairwise
# union is sketch arithmetic. Singles and unions are rounded BEFORE the
# overlap subtraction on both engines.
@query(
    "hll_overlap_user_sets",
    f"""
    WITH {_hll_reg_ctes("SELECT event_type AS g, CAST(user_id AS VARCHAR) AS val FROM events")},
    singles AS (
      SELECT g, {_hll_est_cols()}
      FROM (SELECT g, M, count(*) AS c FROM regs GROUP BY 1, 2)
      GROUP BY g),
    groups AS (SELECT DISTINCT g FROM regs),
    pf AS (SELECT a.g AS ga, b.g AS gb FROM groups a JOIN groups b
           ON a.g < b.g),
    stack AS (
      SELECT pf.ga, pf.gb, regs.bucket, regs.M FROM regs
      JOIN pf ON regs.g = pf.ga
      UNION ALL
      SELECT pf.ga, pf.gb, regs.bucket, regs.M FROM regs
      JOIN pf ON regs.g = pf.gb),
    u AS (SELECT ga, gb, bucket, max(M) AS M FROM stack GROUP BY 1, 2, 3),
    uest AS (
      SELECT ga, gb, {_hll_est_cols()}
      FROM (SELECT ga, gb, M, count(*) AS c FROM u GROUP BY 1, 2, 3)
      GROUP BY ga, gb)
    SELECT uest.ga AS group_a, uest.gb AS group_b,
           sa.estimate AS est_a, sb.estimate AS est_b,
           uest.estimate AS est_union,
           greatest(round(sa.estimate + sb.estimate - uest.estimate, 6), 0.0)
             AS est_overlap,
           CASE WHEN uest.estimate > 0 THEN
             round(greatest(round(sa.estimate + sb.estimate
                                  - uest.estimate, 6), 0.0)
                   / uest.estimate, 6) END AS jaccard
    FROM uest JOIN singles sa ON sa.g = uest.ga
              JOIN singles sb ON sb.g = uest.gb
    """,
)
def hll_overlap_user_sets(spark, sf_dir):
    from ..operators.stats import hll_overlap_report

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    return hll_overlap_report(ev, "event_type", "uid", p=12)


# --- trailing 7-day rolling distinct users -----------------------------------
# One raw scan builds daily registers; every trailing window is register
# arithmetic (explode <= 7 target days per register row, per-bucket max).
@query(
    "hll_rolling_users_7d",
    f"""
    WITH {_hll_reg_ctes("SELECT CAST(ts AS DATE) AS g, CAST(user_id AS VARCHAR) AS val FROM events")},
    offs AS (SELECT unnest(range(0, 7)) AS o),
    targets AS (SELECT g + CAST(o AS INTEGER) AS day, bucket, M
                FROM regs CROSS JOIN offs),
    present AS (SELECT DISTINCT g AS day FROM regs),
    rolled AS (SELECT t.day, bucket, max(M) AS M
               FROM targets t JOIN present USING (day) GROUP BY 1, 2)
    SELECT day, {_hll_est_cols()}
    FROM (SELECT day, M, count(*) AS c FROM rolled GROUP BY 1, 2)
    GROUP BY day
    """,
)
def hll_rolling_users_7d(spark, sf_dir):
    from ..operators.stats import hll_rolling_distinct

    ev = _t(spark, sf_dir, "events").select(
        "ts", F.col("user_id").cast("string").alias("uid")
    )
    return hll_rolling_distinct(ev, "ts", "uid", window_days=7, p=12)


# --- multi-point weighted quantiles ------------------------------------------
# Quantity-weighted price bands: integer-valued weights keep every
# cumulative sum exact in double, so the q*total boundary is engine-safe.
@query(
    "weighted_quantiles_lineitem",
    """
    WITH base AS (
      SELECT l_returnflag, l_extendedprice AS v, l_quantity AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        AND l_quantity > 0),
    census AS (
      SELECT l_returnflag, v, sum(w) AS w FROM base GROUP BY 1, 2),
    ranked AS (
      SELECT l_returnflag, v,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM census)
    SELECT l_returnflag,
           round(max(tot), 6) AS total_weight,
           round(min(CASE WHEN cum >= 0.25 * tot THEN v END), 6) AS q_0_25,
           round(min(CASE WHEN cum >= 0.5 * tot THEN v END), 6) AS q_0_5,
           round(min(CASE WHEN cum >= 0.9 * tot THEN v END), 6) AS q_0_9
    FROM ranked GROUP BY 1
    """,
)
def weighted_quantiles_lineitem(spark, sf_dir):
    from ..operators.stats import weighted_quantiles

    return weighted_quantiles(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        [0.25, 0.5, 0.9],
        group_cols=["l_returnflag"],
    )


# --- trimmed / winsorized means ----------------------------------------------
# Exact-percentile band per group; identical interpolated percentiles on
# both engines (the exact_quantiles convention).
@query(
    "robust_means_orders",
    """
    WITH base AS (
      SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
      WHERE o_totalprice IS NOT NULL),
    cuts AS (
      SELECT g, quantile_cont(v, 0.1) AS lo, quantile_cont(v, 0.9) AS hi
      FROM base GROUP BY g)
    SELECT base.g AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(avg(v), 6) AS mean,
           round(avg(CASE WHEN v >= lo AND v <= hi THEN v END), 6)
             AS trimmed_mean,
           round(avg(least(greatest(v, lo), hi)), 6) AS winsorized_mean
    FROM base JOIN cuts USING (g) GROUP BY base.g
    """,
)
def robust_means_orders(spark, sf_dir):
    from ..operators.stats import robust_means

    return robust_means(
        _t(spark, sf_dir, "orders"), "o_totalprice",
        by=["o_orderpriority"], trim=0.1,
    )


def _assoc_pair_sql(x: str, y: str) -> str:
    """One Cramér's-V pair over the prepared `b` relation (columns rf, ls,
    qb) — census windows + divide-first expected counts, mirroring
    operators/stats.py categorical_association."""
    return f"""
    SELECT '{x}' AS col_x, '{y}' AS col_y,
           CAST(max(n) AS BIGINT) AS n_rows,
           round(sum(c * 1.0 * c / (cx * 1.0 / n * cy)) - max(n), 6) AS chi2,
           CASE WHEN least(max(dx), max(dy)) - 1 > 0 THEN
             round(sqrt((sum(c * 1.0 * c / (cx * 1.0 / n * cy)) - max(n))
                        / (max(n) * (least(max(dx), max(dy)) - 1.0))), 6)
           END AS cramers_v
    FROM (
      SELECT c,
             sum(c) OVER (PARTITION BY xv) AS cx,
             sum(c) OVER (PARTITION BY yv) AS cy,
             (SELECT sum(c2.c) FROM (
                SELECT count(*) AS c FROM b GROUP BY {x}, {y}) c2) AS n,
             (SELECT count(DISTINCT {x}) + max(CASE WHEN {x} IS NULL
                 THEN 1 ELSE 0 END) FROM b) AS dx,
             (SELECT count(DISTINCT {y}) + max(CASE WHEN {y} IS NULL
                 THEN 1 ELSE 0 END) FROM b) AS dy
      FROM (SELECT {x} AS xv, {y} AS yv, count(*) AS c
            FROM b GROUP BY 1, 2))
    """


# --- all-pairs categorical association (Cramér's V) --------------------------
@query(
    "categorical_assoc_lineitem",
    "WITH b AS (SELECT l_returnflag AS rf, l_linestatus AS ls,"
    " CAST(CAST(floor(l_quantity / 10) AS BIGINT) AS VARCHAR) AS qb"
    " FROM lineitem)"
    + _assoc_pair_sql("rf", "ls")
    + " UNION ALL "
    + _assoc_pair_sql("rf", "qb")
    + " UNION ALL "
    + _assoc_pair_sql("ls", "qb"),
)
def categorical_assoc_lineitem(spark, sf_dir):
    from ..operators.stats import categorical_association

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.floor(F.col("l_quantity") / 10).cast("long").cast("string").alias("qb"),
    )
    return categorical_association(li, ["rf", "ls", "qb"])


def _bootstrap_sql(b: int = 200, seed: int = 42) -> str:
    from ..operators.stats import _GOLDEN64, POISSON1_CDF
    from . import sql_kernels as _sql

    seed_mix = (seed * _GOLDEN64) % (1 << 64)
    case = " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(POISSON1_CDF)
    )
    inv53 = repr(2.0 ** -53)
    return f"""
    WITH base AS (
      SELECT event_type AS g, value AS v,
             CAST(event_id AS BIGINT) * {b} AS k0
      FROM events WHERE value IS NOT NULL),
    ex AS (SELECT g, v, o, k0 + o AS k
           FROM base CROSS JOIN (SELECT unnest(range(0, {b})) AS o) t),
    __m0 AS (SELECT g, v, o, k,
                    xor(CAST(k AS UBIGINT), {seed_mix}::UBIGINT) AS h
             FROM ex),
    {_sql._splitmix64_ctes("__m0", "g, v, o, k")},
    u_ AS (SELECT g, v, o, (h >> 11)::DOUBLE * {inv53} AS u FROM __mixed),
    w_ AS (SELECT g, v, o AS r,
                  CASE {case} ELSE 10 END AS w
           FROM u_),
    reps AS (SELECT g, r,
                    CASE WHEN sum(w) > 0
                         THEN round(sum(w * v) / sum(w), 6) END AS m
             FROM w_ GROUP BY 1, 2),
    st AS (SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n_rows,
                  round(avg(value), 6) AS mean
           FROM events WHERE value IS NOT NULL GROUP BY 1),
    ci AS (SELECT g, round(stddev_samp(m), 6) AS se,
                  round(quantile_cont(m, 0.025), 6) AS ci_lo,
                  round(quantile_cont(m, 0.975), 6) AS ci_hi
           FROM reps GROUP BY 1)
    SELECT st.g AS event_type, n_rows, mean, se, ci_lo, ci_hi
    FROM st JOIN ci USING (g)
    """


# --- seeded Poisson-bootstrap confidence intervals ---------------------------
# Weights come from the shared splitmix64 kernel and the SAME Poisson-CDF
# literals on both engines, so every replicate is bit-reproducible.
@query("bootstrap_ci_event_value", _bootstrap_sql())
def bootstrap_ci_event_value(spark, sf_dir):
    from ..operators.stats import bootstrap_ci

    return bootstrap_ci(
        _t(spark, sf_dir, "events"), "event_id", "value",
        by=["event_type"], n_replicas=200, seed=42,
    )


# --- standardized effect size ------------------------------------------------
# Same moment identities on both engines; round(6) absorbs summation
# order.
@query(
    "effect_size_purchase_vs_view",
    """
    WITH base AS (
      SELECT event_type = 'purchase' AS ga, value AS v FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')),
    m AS (
      SELECT CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             sum(CASE WHEN ga THEN v END) AS sa,
             sum(CASE WHEN ga THEN v * v END) AS ssa,
             CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             sum(CASE WHEN NOT ga THEN v END) AS sb,
             sum(CASE WHEN NOT ga THEN v * v END) AS ssb
      FROM base),
    c AS (
      SELECT n_a, n_b,
             sa / n_a AS mean_a, sb / n_b AS mean_b,
             (ssa - sa * sa / n_a) / (n_a - 1) AS va,
             (ssb - sb * sb / n_b) / (n_b - 1) AS vb
      FROM m),
    p AS (
      SELECT *, sqrt(((n_a - 1) * va + (n_b - 1) * vb) / (n_a + n_b - 2))
                  AS pooled
      FROM c)
    SELECT n_a, n_b, round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round(pooled, 6) AS pooled_sd,
           CASE WHEN pooled > 0
                THEN round((mean_a - mean_b) / pooled, 6) END AS cohens_d,
           CASE WHEN pooled > 0
                THEN round((mean_a - mean_b) / pooled
                           * (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9)), 6) END
             AS hedges_g
    FROM p
    """,
)
def effect_size_purchase_vs_view(spark, sf_dir):
    from ..operators.stats import effect_size

    return effect_size(
        _t(spark, sf_dir, "events"), "value", "event_type", "purchase", "view"
    )
