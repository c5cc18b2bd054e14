"""Driver-contract batch 3: dedup, similarity search, and pipeline entries.

SQL-expressible ops get DuckDB oracles; MinHash/SimHash/clustering are
genuinely non-SQL-expressible (seeded hash families, iterative fixpoints) —
registered without oracles so the driver records the rows-only check.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from ..queries import _t, query


# --- exact n-gram Jaccard pairs, DuckDB-checkable --------------------------
# (shared by the cc_clusters_ngram oracle below)
_NGRAM_PAIR_CTES = """
    t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
               FROM documents),
    g AS (SELECT doc_id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks)-2, 1)+1)]) AS grams
          FROM t),
    e AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM g),
    p AS (SELECT a.doc_id AS l, b.doc_id AS r, a.n_grams AS ln, b.n_grams AS rn,
                 count(*) AS c
          FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
"""


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {_NGRAM_PAIR_CTES}
    SELECT l AS left_id, r AS right_id, round(c * 1.0 / (ln + rn - c), 6) AS jaccard
    FROM p WHERE c * 1.0 / (ln + rn - c) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    from ..operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    # max_doc_freq large enough that stop-gram pruning is inert at oracle
    # scale (the oracle has no pruning)
    return ngram_jaccard_pairs(docs, n=3, min_jaccard=0.5, max_doc_freq=1_000_000_000)


# --- brute-force cosine top-k, DuckDB-checkable ----------------------------
@query(
    "sim_search_topk",
    """
    WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], (SELECT e::DOUBLE[] FROM q)) + 1e-9, 6)
             AS cosine
    FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_search_topk(spark, sf_dir):
    from ..operators.similarity_search import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return brute_force_topk(emb, list(q), k=10)


# --- IVF ANN with every cell probed == exact top-k -------------------------
# The IVF machinery (driver k-means, Arrow cell assignment, probe-cell
# pruning) is fully exercised, and with n_probe = n_cells its result is
# EXACTLY brute force — which gives the operator a DuckDB oracle instead
# of a rows-only check (partial-probe recall is covered in pytest).
@query(
    "sim_search_ivf_full_probe",
    """
    WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], (SELECT e::DOUBLE[] FROM q)) + 1e-9, 6)
             AS cosine
    FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_search_ivf_full_probe(spark, sf_dir):
    from ..operators.similarity_search import assign_cells, ivf_topk, train_centroids
    from ..session import ensure_py_files

    ensure_py_files(spark)
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    cent = train_centroids(emb, n_cells=8, iters=5)
    cells = assign_cells(emb, cent)
    return ivf_topk(cells, cent, list(q), k=10, n_probe=len(cent))


# --- IVF index delta maintenance: append without refit ----------------------
# Builds the index on 90% of the table, folds the remaining vectors in via
# append_ivf_index (delta-only Arrow pass + file-wise append under the
# standing cell= partitions), then full-probes the READ-BACK index — which
# must equal exact brute force over the WHOLE table. Any lost/misfiled
# delta vector breaks the oracle.
@query(
    "ivf_append_full_probe",
    """
    WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], (SELECT e::DOUBLE[] FROM q)) + 1e-9, 6)
             AS cosine
    FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def ivf_append_full_probe(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from ..operators.similarity_search import (
        append_ivf_index,
        assign_cells,
        ivf_topk,
        read_ivf_index,
        train_centroids,
        write_ivf_index,
    )
    from ..session import ensure_py_files

    ensure_py_files(spark)
    emb = _t(spark, sf_dir, "embeddings")
    standing = emb.filter(F.col("vec_id") >= 50)
    delta = emb.filter(F.col("vec_id") < 50)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    base = tempfile.mkdtemp(prefix="ers_ivf_append_")
    path = os.path.join(base, "index")
    try:
        cent = train_centroids(standing, n_cells=8, iters=5)
        write_ivf_index(assign_cells(standing, cent), path, cent)
        append_ivf_index(delta, path)
        cells, cent2 = read_ivf_index(spark, path)
        out = ivf_topk(cells, cent2, list(q), k=10, n_probe=len(cent2))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- J: semi / anti joins (engine's resume path uses left_anti) ------------
@query(
    "j_semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "j_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
    """,
)
def j_anti_join(spark, sf_dir):
    # customers with no events — verified NON-empty at sf0.01 (1350 of 1500
    # customer keys never appear in events.user_id), so the driver check
    # isn't vacuous (round-1 verdict: nation-vs-supplier was 0 rows)
    c = _t(spark, sf_dir, "customer")
    e = _t(spark, sf_dir, "events")
    return c.join(e, c.c_custkey == e.user_id, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- seeded-kernel operators, oracle-checked via exact SQL replicas --------
# Round 1 gave these rows-only checks ("seeded hash families aren't
# SQL-expressible") — they are: contract/sql_kernels.py replicates every
# kernel bit-for-bit in DuckDB (UHUGEINT wraparound arithmetic, list
# comprehensions), so the driver now hash-compares real values.
from . import sql_kernels as _sql


@query("minhash_signatures", _sql.minhash_signatures_sql())
def minhash_signatures(spark, sf_dir):
    """The seeded one-permutation MinHash signature itself, slot-exploded —
    oracle-checks the core kernel (shingle rolling hash, splitmix64, bin
    mins, circular densification, 63-bit mask) value-for-value."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    from ..config import MinHashConfig
    from ..functions.text import norm_content_col
    from ..session import ensure_py_files

    ensure_py_files(spark)
    cfg = MinHashConfig()

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        from ..functions.minhash import batch_signatures

        return batch_signatures(texts, cfg)

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(sig_udf(norm_content_col(F.col("text")))).alias("slot", "value")
    ).select("doc_id", F.col("slot").cast("long").alias("slot"), "value")


@query("dedup_minhash_lsh", _sql.minhash_lsh_pairs_sql(min_jaccard=0.6))
def dedup_minhash_lsh(spark, sf_dir):
    from ..operators.dedup import minhash_lsh_pairs
    from ..session import ensure_py_files

    ensure_py_files(spark)
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), min_jaccard=0.6)


@query("simhash_values", _sql.simhash_values_sql())
def simhash_values(spark, sf_dir):
    """The 64-bit SimHash value per document — oracle-checks the token
    hashing (24-byte LE packing + multiply-xor + splitmix64) and the
    strict-majority bit vote exactly."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    from ..session import ensure_py_files

    ensure_py_files(spark)

    @pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        from ..functions.text import batch_simhash64

        return batch_simhash64(texts)

    return _t(spark, sf_dir, "documents").select(
        "doc_id", simhash_udf(F.col("text")).alias("simhash")
    )


@query("dedup_simhash", _sql.simhash_pairs_sql(max_hamming=3))
def dedup_simhash(spark, sf_dir):
    from ..operators.dedup import simhash_pairs
    from ..session import ensure_py_files

    ensure_py_files(spark)
    return simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


@query(
    "dedup_embedding_cosine",
    _sql.embedding_lsh_pairs_sql(min_cosine=0.4, n_planes=4, n_tables=8),
)
def dedup_embedding_cosine(spark, sf_dir):
    from ..operators.dedup import embedding_cosine_pairs
    from ..session import ensure_py_files

    ensure_py_files(spark)
    # the synthetic embeddings carry no planted near-dups (max pairwise
    # cosine ~0.51 at sf0.01) — use a recall-tilted LSH (short sketches,
    # more tables) and a threshold the corpus can actually reach so the
    # driver's rows-only check observes real output instead of 0 == 0
    return embedding_cosine_pairs(
        _t(spark, sf_dir, "embeddings"), min_cosine=0.4, n_planes=4, n_tables=8
    )


# --- semantic dedup (SemDeDup): per-vector keep/drop, oracle-checked -------
# Same recall-tilted LSH + reachable threshold as dedup_embedding_cosine
# (the synthetic corpus has no planted near-dups); the oracle closes the
# edge set with WITH RECURSIVE and labels every vector.
@query(
    "semantic_dedup_embeddings",
    _sql.semantic_dedup_sql(min_cosine=0.4, n_planes=4, n_tables=8),
)
def semantic_dedup_embeddings(spark, sf_dir):
    from ..operators.dedup import semantic_dedup
    from ..session import ensure_py_files

    ensure_py_files(spark)
    out = semantic_dedup(
        _t(spark, sf_dir, "embeddings"), min_cosine=0.4, n_planes=4, n_tables=8
    )
    return out.select("vec_id", "canonical_id", F.col("kept").cast("int").alias("kept"))


# --- int8-quantized exact cosine top-k --------------------------------------
# Search runs entirely over the quantized codes (the 4x at-rest format);
# the query is vec 0's embedding, quantized by the same per-vector rule, so
# the oracle rebuilds both sides from the raw table.
@query(
    "sim_search_quantized_topk",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 CASE WHEN list_max([abs(x) FOR x IN v]) > 0
                      THEN list_max([abs(x) FOR x IN v]) / 127.0
                      ELSE 0.0 END AS scale
          FROM e),
    c AS (SELECT vec_id,
                 [CASE WHEN scale > 0 THEN round(v[i] / scale, 0) ELSE 0.0 END
                  FOR i IN range(1, len(v) + 1)] AS codes
          FROM s),
    q AS (SELECT codes FROM c WHERE vec_id = 0)
    SELECT vec_id,
           round(list_cosine_similarity(codes, (SELECT codes FROM q)) + 1e-9, 6) AS cosine
    FROM c ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_search_quantized_topk(spark, sf_dir):
    from ..operators.similarity_search import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return quantized_topk(emb, [float(x) for x in qvec], k=10)


# --- fused corpus-curation pipeline, oracle-checked end-to-end -------------
@query("corpus_curation", _sql.curation_status_sql(min_quality=0.6, min_jaccard=0.6))
def corpus_curation(spark, sf_dir):
    """The canonical LLM training-data prep flow as ONE operator: quality
    gate -> exact sha collapse -> MinHash-LSH near-dup -> connected
    components -> per-document (status, canonical_id) decision. Every
    stage oracle-checked in a single SQL program."""
    from ..operators.curation import curate_corpus
    from ..session import ensure_py_files

    ensure_py_files(spark)
    return curate_corpus(
        _t(spark, sf_dir, "documents"), min_quality=0.6, min_jaccard=0.6
    )


# --- connected components, oracle-checked via recursive CTE ----------------
# The iterative large-star/small-star fixpoint (operators/clustering.py) is
# the engine's core graph operator; over a SQL-expressible edge set its
# RESULT is SQL-expressible even though the algorithm isn't: transitive
# closure by WITH RECURSIVE, component label = min reachable doc_id.
_NGRAM_CC_SQL = f"""
    WITH RECURSIVE
    {_NGRAM_PAIR_CTES},
    edges AS (
      SELECT l AS a, r AS b FROM p WHERE c * 1.0 / (ln + rn - c) >= 0.5
    ),
    dir AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    reach(a, b) AS (
      SELECT a, b FROM dir
      UNION
      SELECT r.a, d.b FROM reach r JOIN dir d ON r.b = d.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id
    FROM reach GROUP BY a
    """


@query("cc_clusters_ngram", _NGRAM_CC_SQL)
def cc_clusters_ngram(spark, sf_dir):
    """connected_components over the exact n-gram Jaccard edge set —
    every node in an edge labeled with its component-min doc_id."""
    from ..operators.clustering import connected_components

    from ..operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.5, max_doc_freq=1_000_000_000)
    comp = connected_components(
        edges.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    )
    return comp.select(F.col("file_id").alias("doc_id"), "cluster_id")


# --- DBSCAN over the LSH eps-graph ------------------------------------------
# Density clustering: core/border/noise roles + per-cluster labels; the
# oracle rebuilds the hyperplane LSH, the degree census, a recursive-CTE
# CC over the core subgraph, and the min-id border attach.
@query(
    "dbscan_embeddings",
    _sql.dbscan_sql(min_cosine=0.3, min_pts=3, n_planes=4, n_tables=8),
)
def dbscan_embeddings(spark, sf_dir):
    from ..operators.dbscan import dbscan_clusters
    from ..session import ensure_py_files

    ensure_py_files(spark)
    return dbscan_clusters(
        _t(spark, sf_dir, "embeddings"),
        min_cosine=0.3,
        min_pts=3,
        n_planes=4,
        n_tables=8,
    )


# --- parallel Pivot correlation clustering over the same edge set ----------
# Contrast row for cc_clusters_ngram: CC merges across weak chains; Pivot
# (locally-minimal rounds, KDD'14) only forms pivot-stars. The oracle
# unrolls the bounded round loop and replicates pi(v) = xxhash64(seed, v)
# bit-for-bit (sql_kernels._xxh64_pi_ctes), so the driver checks the whole
# algorithm including its randomness.
_PIVOT_SQL = f"""
    WITH {_NGRAM_PAIR_CTES},
    edges0 AS (
      SELECT l AS a, r AS b FROM p WHERE c * 1.0 / (ln + rn - c) >= 0.5
    ),
    {_sql.pivot_clusters_ctes("edges0", rounds=4, seed=7)}
    SELECT id AS doc_id, cluster_id FROM __pivot_out
    """


@query("corrclust_pivot_ngram", _PIVOT_SQL)
def corrclust_pivot_ngram(spark, sf_dir):
    """pivot_clusters over the exact n-gram Jaccard edge set — every node
    labeled with its pivot's doc_id (stars, not transitive closures)."""
    from ..operators.corrclust import pivot_clusters
    from ..operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.5, max_doc_freq=1_000_000_000)
    out = pivot_clusters(edges, src_col="left_id", dst_col="right_id", seed=7, rounds=4)
    return out.select(F.col("id").alias("doc_id"), "cluster_id")


# DEFAULT-config flagship, oracle-checked value-for-value: the content
# edit-ratio term (w_content=0.4) is replicated in SQL by an anti-diagonal
# LCS DP inside a recursive CTE + round_even (sql_kernels.
# pipeline_default_clusters_sql) — the light query pins the w_content=0
# chain, this row pins the full default blend end to end.
@query("pipeline_clusters", _sql.pipeline_default_clusters_sql(threshold=80.0))
def pipeline_clusters(spark, sf_dir):
    """Full blocking->scoring->clustering pipeline on the documents corpus
    under the DEFAULT config (the flagship as a contract row); per-doc
    cluster labels so every membership decision is value-checked."""
    import __spark_entry__ as entry_mod
    from ..config import PipelineConfig
    from ..plans.pipeline import resolve
    from ..session import ensure_py_files

    ensure_py_files(spark)
    files = entry_mod._docs_as_repo_files(spark, sf_dir)
    res = resolve(files, PipelineConfig())
    return res.clusters.select(F.col("file_id").alias("doc_id"), "cluster_id")


# North-rule resumability as a CONTRACT row: run the flagship through a
# StageStore, kill it after scoring (remove the clusters stage dir), run
# again — the resumed run must reproduce the first run's labels exactly,
# and both must equal the ground-truth SQL program. The inner join makes
# any id drift show up as a row-count mismatch.
@query(
    "pipeline_resume_equivalence",
    f"""
    SELECT doc_id, cluster_id, cluster_id AS cluster_id_resumed
    FROM ({_sql.pipeline_default_clusters_sql(threshold=80.0)})
    """,
)
def pipeline_resume_equivalence(spark, sf_dir):
    import os
    import shutil
    import tempfile

    import __spark_entry__ as entry_mod
    from ..config import PipelineConfig
    from ..plans.pipeline import resolve
    from ..session import ensure_py_files
    from ..sources.io import StageStore

    ensure_py_files(spark)
    base = tempfile.mkdtemp(prefix="ers_resume_")
    try:
        files = entry_mod._docs_as_repo_files(spark, sf_dir)
        cfg = PipelineConfig()
        store = StageStore(os.path.join(base, "run"))
        res1 = resolve(files, cfg, store=store)
        first = res1.clusters.select(
            F.col("file_id").alias("doc_id"), "cluster_id"
        ).localCheckpoint(eager=True)
        # crash simulation: the clusters stage never completed; the rerun
        # must resume from the persisted features/pairs/scored stages and
        # recompute only clustering onward
        shutil.rmtree(store.path("clusters"))
        assert not store.is_complete("clusters")
        res2 = resolve(files, cfg, store=store)
        resumed = res2.clusters.select(
            F.col("file_id").alias("doc_id"),
            F.col("cluster_id").alias("cluster_id_resumed"),
        ).localCheckpoint(eager=True)
        return first.join(resumed, "doc_id")
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query("doc_fingerprints", _sql.fingerprints_sql())
def doc_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al.) per document, exploded to
    scalar rows (doc_id, pos, fingerprint) — array cells broke the driver
    canonicalizer in round 1, and the rolling-hash kernel now has an exact
    SQL replica (contract/sql_kernels.py) so the row is oracle-checked."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    from ..session import ensure_py_files

    ensure_py_files(spark)

    @pandas_udf(T.ArrayType(T.LongType()))
    def fp_udf(texts: pd.Series) -> pd.Series:
        from ..functions.text import batch_fingerprint

        return batch_fingerprint(texts).apply(lambda xs: [int(x) for x in xs])

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(fp_udf(F.col("text"))).alias("pos", "fingerprint")
    )


# --- as-of (nearest-prior) join — custom operator Spark lacks natively -----
@query(
    "asof_join_events_orders",
    """
    WITH b AS (SELECT o_custkey AS k, o_orderdate AS bts, max(o_totalprice) AS last_price
               FROM orders GROUP BY 1, 2)
    SELECT e.event_id, round(b.last_price, 2) AS last_price_asof
    FROM events e ASOF LEFT JOIN b ON e.user_id = b.k AND e.ts >= b.bts
    """,
)
def asof_join_events_orders(spark, sf_dir):
    from ..operators.asof import asof_join

    events = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders")
    # dedupe build to unique (key, ts) so the as-of pick is well-defined on
    # both engines
    build = orders.groupBy(
        F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("bts")
    ).agg(F.max("o_totalprice").alias("last_price"))
    out = asof_join(
        events.select(F.col("user_id").alias("k"), "ts", "event_id"),
        build,
        on="k",
        probe_ts="ts",
        build_ts="bts",
    )
    return out.select(
        "event_id", F.round("last_price_asof", 2).alias("last_price_asof")
    )


# --- binned range join (point-in-interval), theta->equi rewrite ------------
# Intervals are DERIVED FROM the events epoch (per-user first-week windows)
# so the join is non-empty at every sf — round-1 verdict: joining against
# orders.o_orderdate (a 1992-2001 epoch) was vacuously 0 rows.
@query(
    "range_join_events_in_order_window",
    """
    WITH w AS (SELECT user_id AS k, min(ts) AS w_start,
                      min(ts) + INTERVAL '7 days' AS w_end
               FROM events GROUP BY user_id)
    SELECT e.event_id, w.k
    FROM events e JOIN w
      ON e.user_id = w.k AND e.ts >= w.w_start AND e.ts <= w.w_end
    """,
)
def range_join_events_in_order_window(spark, sf_dir):
    from ..operators.ranges import binned_range_join

    events = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "ts", "event_id"
    )
    windows = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(
            F.min("ts").alias("w_start"),
            (F.min("ts") + F.expr("INTERVAL 7 DAYS")).alias("w_end"),
        )
    )
    out = binned_range_join(
        events, windows, on="k", point_ts="ts", start_col="w_start", end_col="w_end"
    )
    return out.select("event_id", "k")


# --- the FLAGSHIP pipeline, oracle-checked ---------------------------------
# resolve() under the jaccard+JW scoring config (w_content=0): the whole
# blocking -> candidates -> scoring -> connected-components chain verified
# value-for-value against one SQL program (sql_kernels.py — exact seeded
# MinHash bands, pfx keys, token-set Jaccard, DuckDB's JW, recursive-CTE
# closure). The content-ratio term (the one non-SQL-expressible kernel) is
# pinned separately: DP-oracle + published-value tests and the default-
# config pipeline_clusters rows-only check.
@query("pipeline_clusters_light", _sql.pipeline_light_clusters_sql(threshold=45))
def pipeline_clusters_light(spark, sf_dir):
    import __spark_entry__ as entry_mod

    from ..config import PipelineConfig
    from ..plans.pipeline import resolve
    from ..session import ensure_py_files

    ensure_py_files(spark)
    files = entry_mod._docs_as_repo_files(spark, sf_dir)
    res = resolve(files, PipelineConfig(w_content=0.0, similarity_threshold=45))
    return res.clusters.select(F.col("file_id").alias("doc_id"), "cluster_id")


@query(
    "dup_span_stats",
    f"""
    WITH fps AS ({_sql.fingerprints_sql()}),
    tot AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY 1),
    dupf AS (SELECT fingerprint FROM fps GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
    dup AS (SELECT f.doc_id, count(*) AS n_dup FROM fps f JOIN dupf USING (fingerprint) GROUP BY 1)
    SELECT t.doc_id, CAST(t.n_fp AS BIGINT) AS n_fp,
           CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_fp,
           round(CAST(coalesce(d.n_dup, 0) AS DOUBLE) / t.n_fp, 6) AS dup_frac
    FROM tot t LEFT JOIN dup d USING (doc_id)
    """,
)
def dup_span_stats(spark, sf_dir):
    """Cross-document duplicated-span fractions from winnowing fingerprints
    (approximate exact-substring dedup, Lee et al. 2022) — oracle reuses the
    bit-exact rolling-hash SQL replica."""
    from ..operators.dedup import duplicate_span_stats

    d = _t(spark, sf_dir, "documents")
    return duplicate_span_stats(d)


@query("dedup_remove_spans", _sql.remove_spans_sql())
def dedup_remove_spans(spark, sf_dir):
    """Exact-substring dedup as a TRANSFORM (Lee et al. 2022): corpus-
    duplicated winnowing spans are cut from every document's text. The
    oracle replicates the positional kernel, the df census, the island
    merge, and the string surgery term-for-term (sql_kernels.remove_spans_sql)."""
    from ..operators.dedup import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents")
    return remove_duplicate_spans(d)


# The incremental plan's oracle is the BATCH SQL program over the full
# corpus: resolve() on 3/4 of the docs, resolve_incremental() folds in the
# remaining 1/4, and the result must equal batch clusters on the union
# (the closure property tests/test_incremental_resolve.py pins on synthetic
# corpora, here checked value-for-value by DuckDB at the driver).
@query("incremental_clusters_light", _sql.pipeline_light_clusters_sql(threshold=45))
def incremental_clusters_light(spark, sf_dir):
    import __spark_entry__ as entry_mod

    from ..config import PipelineConfig
    from ..plans.incremental import resolve_incremental
    from ..plans.pipeline import resolve
    from ..session import ensure_py_files

    ensure_py_files(spark)
    files = entry_mod._docs_as_repo_files(spark, sf_dir)
    cfg = PipelineConfig(w_content=0.0, similarity_threshold=45)
    old = files.filter(F.pmod(F.col("file_id"), F.lit(4)) != 0)
    new = files.filter(F.pmod(F.col("file_id"), F.lit(4)) == 0)
    prior = resolve(old, cfg)
    inc = resolve_incremental(prior.features, prior.clusters, new, cfg)
    return inc.clusters.select(F.col("file_id").alias("doc_id"), "cluster_id")


# Re-threshold oracle: resolve() at threshold 45, then regenerate the
# clusters at 35 through rethreshold_clusters — lineage-reuse, no corpus
# re-scoring (DOWN is the interesting direction: it exercises the
# suspect-pair path). Must equal the batch SQL program AT the new
# threshold.
@query(
    "rethreshold_clusters_light",
    _sql.pipeline_light_clusters_sql(threshold=35),
)
def rethreshold_clusters_light(spark, sf_dir):
    import __spark_entry__ as entry_mod

    from ..config import PipelineConfig
    from ..plans.pipeline import resolve
    from ..plans.rethreshold import rethreshold_clusters
    from ..session import ensure_py_files

    ensure_py_files(spark)
    files = entry_mod._docs_as_repo_files(spark, sf_dir)
    cfg = PipelineConfig(w_content=0.0, similarity_threshold=45)
    prior = resolve(files, cfg)
    out = rethreshold_clusters(prior.features, prior.scored, 35, cfg)
    return out.clusters.select(F.col("file_id").alias("doc_id"), "cluster_id")


# Clerical-review override oracle: resolve() the corpus, then apply a
# deterministic decision batch — non_match on the (a, a+1) pairs at
# a % 31 == 0 (removes those evidence edges where they exist; a no-op
# where they don't) and match on the (a, a+2) pairs at a % 37 == 0
# (merges clusters, including previously-unrelated ones). The repaired
# clusters must equal the batch SQL program with the SAME edge overrides
# applied globally — pinning the documented edge-level override
# semantics (not a cannot-link constraint solver).
_MUST_SQL = (
    "SELECT a.doc_id AS a, b.doc_id AS b FROM __docs a "
    "JOIN __docs b ON b.doc_id = a.doc_id + 2 WHERE a.doc_id % 37 = 0"
)
_CANNOT_SQL = (
    "SELECT a.doc_id AS a, b.doc_id AS b FROM __docs a "
    "JOIN __docs b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 31 = 0"
)


@query(
    "review_override_clusters",
    _sql.pipeline_light_clusters_sql(
        threshold=45, must_sql=_MUST_SQL, cannot_sql=_CANNOT_SQL
    ),
)
def review_override_clusters(spark, sf_dir):
    import __spark_entry__ as entry_mod

    from ..config import PipelineConfig
    from ..plans.pipeline import resolve
    from ..plans.reviews import apply_review_decisions
    from ..session import ensure_py_files

    ensure_py_files(spark)
    files = entry_mod._docs_as_repo_files(spark, sf_dir)
    cfg = PipelineConfig(w_content=0.0, similarity_threshold=45)
    prior = resolve(files, cfg)
    ids = files.select(F.col("file_id"))
    cannot = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("b.file_id") == F.col("a.file_id") + 1)
        .filter(F.pmod(F.col("a.file_id"), F.lit(31)) == 0)
        .select(
            F.col("a.file_id").alias("left_id"),
            F.col("b.file_id").alias("right_id"),
            F.lit("non_match").alias("decision"),
        )
    )
    must = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("b.file_id") == F.col("a.file_id") + 2)
        .filter(F.pmod(F.col("a.file_id"), F.lit(37)) == 0)
        .select(
            F.col("a.file_id").alias("left_id"),
            F.col("b.file_id").alias("right_id"),
            F.lit("match").alias("decision"),
        )
    )
    out = apply_review_decisions(
        prior.features, prior.clusters, prior.scored, cannot.unionByName(must), cfg
    )
    return out.clusters.select(F.col("file_id").alias("doc_id"), "cluster_id")


# Retraction (right-to-be-forgotten) oracle: resolve() the full corpus,
# delete every doc_id % 7 == 3 through retract_and_repair, and the repaired
# clusters must equal the BATCH SQL program over the SURVIVORS — the
# equivalence the plan guarantees below the skew caps. The deletion set
# intentionally hits sha-group representatives (promotion refold path) and
# whole clusters.
@query(
    "retract_repair_clusters",
    _sql.pipeline_light_clusters_sql(threshold=45, where="doc_id % 7 <> 3"),
)
def retract_repair_clusters(spark, sf_dir):
    import __spark_entry__ as entry_mod

    from ..config import PipelineConfig
    from ..plans.pipeline import resolve
    from ..plans.retraction import retract_and_repair
    from ..session import ensure_py_files

    ensure_py_files(spark)
    files = entry_mod._docs_as_repo_files(spark, sf_dir)
    cfg = PipelineConfig(w_content=0.0, similarity_threshold=45)
    prior = resolve(files, cfg)
    deleted = files.filter(F.pmod(F.col("file_id"), F.lit(7)) == 3).select("file_id")
    rep = retract_and_repair(
        prior.features, prior.clusters, prior.scored, deleted, cfg,
        prior_blocks=prior.blocks,
    )
    return rep.clusters.select(F.col("file_id").alias("doc_id"), "cluster_id")


@query(
    "label_centroids",
    """
    SELECT label, CAST(pos - 1 AS INT) AS pos, round(avg(val), 6) AS val
    FROM (SELECT label,
                 unnest(CAST(embedding AS DOUBLE[])) AS val,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY 1, 2
    """,
)
def label_centroids(spark, sf_dir):
    """Per-label embedding centroids as scalar (label, pos, val) rows —
    element-wise mean via posexplode/groupBy (operators/vectors.py)."""
    from ..operators.vectors import group_centroids_long

    e = _t(spark, sf_dir, "embeddings")
    return group_centroids_long(e, "label")


# Symmetric int8 scalar quantization (operators/vectors.py): the at-rest
# storage format for 100 TB embedding tables (4x over float32; dequant =
# codes * scale). Exploded to scalar rows; both sides compute in double so
# codes agree bit-for-bit (round is half-away-from-zero on both engines).
@query(
    "quantize_embeddings_int8",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 CASE WHEN list_max([abs(x) FOR x IN v]) > 0
                      THEN list_max([abs(x) FOR x IN v]) / 127.0
                      ELSE 0.0 END AS scale
          FROM e)
    SELECT vec_id,
           CAST(i - 1 AS BIGINT) AS pos,
           CAST(CASE WHEN scale > 0 THEN round(v[i] / scale, 0) ELSE 0 END AS INT) AS code,
           round(scale, 6) AS scale
    FROM s, unnest(range(1, len(v) + 1)) AS u(i)
    """,
)
def quantize_embeddings_int8(spark, sf_dir):
    from ..operators.vectors import quantize_embeddings

    e = _t(spark, sf_dir, "embeddings")
    q = quantize_embeddings(e)
    return q.select(
        "vec_id",
        F.posexplode("codes").alias("pos", "code"),
        F.round("scale", 6).alias("scale"),
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), "code", "scale")


# Test-set decontamination (operators/decontam.py): docs with doc_id % 97
# == 0 stand in as the benchmark/eval set; every other doc reports what
# fraction of its distinct word n-grams appear in the benchmark. n=3 here
# (the synthetic docs are a few dozen tokens; real pipelines use 8-13 —
# the plan is identical, only the gram width changes).
_DECON_N = 3


@query(
    "ngram_decontamination",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= {_DECON_N}
                  THEN list_distinct([array_to_string(t[i:i+{_DECON_N - 1}], ' ')
                                      FOR i IN range(1, len(t)-{_DECON_N}+2)])
                  ELSE CAST([] AS VARCHAR[]) END AS g
      FROM toks),
    bench AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 97 = 0),
    train AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0 AND len(g) > 0),
    hits AS (
      SELECT tt.doc_id, count(*) AS hit_grams
      FROM (SELECT doc_id, unnest(g) AS gram FROM train) tt
      JOIN bench USING (gram)
      GROUP BY tt.doc_id)
    SELECT train.doc_id,
           CAST(len(g) AS BIGINT) AS total_grams,
           CAST(COALESCE(hit_grams, 0) AS BIGINT) AS hit_grams,
           round(COALESCE(hit_grams, 0)::DOUBLE / len(g), 6) AS contamination
    FROM train LEFT JOIN hits USING (doc_id)
    """,
)
def ngram_decontamination(spark, sf_dir):
    """Benchmark-overlap fractions for the training split of documents."""
    from ..operators.decontam import ngram_contamination

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 0)
    train = d.filter(F.pmod(F.col("doc_id"), F.lit(97)) != 0)
    return ngram_contamination(train, bench, n=_DECON_N)


# Table-vs-table kNN join (operators/similarity_search.knn_join): every
# 101st embedding row is a query; top-5 corpus neighbors each. Ranking is
# by unrounded cosine (ulp-level engine agreement; exact-duplicate vectors
# tie and break by doc_id identically on both sides), reported cosine is
# round-6 — the JVM zip_with fold and DuckDB list_cosine_similarity agree
# there (both full-double).
_KNN_ORACLE = """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 101 = 0),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    s AS (
      SELECT query_id, c.vec_id,
             list_cosine_similarity(qv, cv) AS raw
      FROM q CROSS JOIN c),
    r AS (
      SELECT query_id, vec_id, raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY raw DESC, vec_id) AS rank
      FROM s)
    SELECT query_id, vec_id, round(raw + 1e-9, 6) AS cosine, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
    """


@query("knn_join_topk", _KNN_ORACLE)
def knn_join_topk(spark, sf_dir):
    """Broadcast-probe kNN join: query matrix vs the embeddings corpus."""
    from ..operators.similarity_search import knn_join
    from ..session import ensure_py_files

    ensure_py_files(spark)
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.pmod(F.col("vec_id"), F.lit(101)) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_join(q, e, k=5, id_col="vec_id", qvec_col="embedding")


# Same join over STRING ids: the output id columns must follow the input
# schemas (a hardcoded LongType would fail at Arrow conversion), and
# cosine-tie ranking breaks by the string id on both sides.
_KNN_STR_ORACLE = """
    WITH q AS (
      SELECT CAST(vec_id AS VARCHAR) AS query_id,
             CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 101 = 0),
    c AS (SELECT CAST(vec_id AS VARCHAR) AS sid,
                 CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    s AS (
      SELECT query_id, c.sid,
             list_cosine_similarity(qv, cv) AS raw
      FROM q CROSS JOIN c),
    r AS (
      SELECT query_id, sid, raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY raw DESC, sid) AS rank
      FROM s)
    SELECT query_id, sid AS vec_id, round(raw + 1e-9, 6) AS cosine,
           CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
    """


@query("knn_join_topk_string_ids", _KNN_STR_ORACLE)
def knn_join_topk_string_ids(spark, sf_dir):
    """knn_join with string id columns — pins the derived output schema."""
    from ..operators.similarity_search import knn_join
    from ..session import ensure_py_files

    ensure_py_files(spark)
    e = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("vec_id"), "embedding",
        F.col("vec_id").alias("__num")
    )
    q = e.filter(F.pmod(F.col("__num"), F.lit(101)) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_join(
        q, e.select("vec_id", "embedding"), k=5, id_col="vec_id", qvec_col="embedding"
    )


# Same oracle at full probe: the IVF join's cell machinery must return
# EXACTLY the exact-kNN rows when every cell is probed (n_probe == cells).
# Corpus-scale SELF-kNN (every row a query, self-hits excluded) through
# the cell-cogrouped big-query join at FULL probe: must equal brute force
# over all ordered pairs. No broadcast of either side anywhere in the plan
# (gated by tests/test_dedup_search.py); the oracle is the all-pairs
# definition.
_SELF_KNN_ORACLE = """
    WITH c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (
      SELECT a.vec_id AS query_id, b.vec_id,
             list_cosine_similarity(a.v, b.v) AS raw
      FROM c a CROSS JOIN c b WHERE a.vec_id <> b.vec_id),
    r AS (
      SELECT query_id, vec_id, raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY raw DESC, vec_id) AS rank
      FROM s)
    SELECT query_id, vec_id, round(raw + 1e-9, 6) AS cosine, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 3
    """


@query("self_knn_embeddings", _SELF_KNN_ORACLE)
def self_knn_embeddings(spark, sf_dir):
    """Cell-cogrouped self-kNN over the whole embedding table."""
    from ..operators.similarity_search import (
        assign_cells,
        self_knn_join,
        train_centroids,
    )
    from ..session import ensure_py_files

    ensure_py_files(spark)
    e = _t(spark, sf_dir, "embeddings")
    cents = train_centroids(e, n_cells=8)
    with_cells = assign_cells(e, cents)
    return self_knn_join(with_cells, cents, k=3, n_probe=8, id_col="vec_id")


@query("ivf_knn_join_full_probe", _KNN_ORACLE)
def ivf_knn_join_full_probe(spark, sf_dir):
    from ..operators.similarity_search import (
        assign_cells,
        ivf_knn_join,
        train_centroids,
    )
    from ..session import ensure_py_files

    ensure_py_files(spark)
    e = _t(spark, sf_dir, "embeddings")
    cents = train_centroids(e, n_cells=8)
    with_cells = assign_cells(e, cents)
    q = e.filter(F.pmod(F.col("vec_id"), F.lit(101)) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_knn_join(q, with_cells, cents, k=5, n_probe=8, id_col="vec_id")


# Pairwise cluster-agreement metrics (operators/quality.py): the engine's
# light-pipeline clustering scored against the n-gram-CC clustering as
# reference — the north-rule pairwise-F1 metric as a distributed operator.
# The oracle nests BOTH full SQL clustering programs as subqueries and
# recomputes the contingency C(n,2) arithmetic.
@query(
    "cluster_agreement_metrics",
    f"""
    WITH j AS (
      SELECT p.doc_id, p.cluster_id AS pc, t.cluster_id AS tc
      FROM ({_sql.pipeline_light_clusters_sql(threshold=45)}) p
      JOIN ({_NGRAM_CC_SQL}) t USING (doc_id)),
    cont AS (SELECT pc, tc, count(*) AS n FROM j GROUP BY 1, 2),
    tp AS (SELECT CAST(COALESCE(sum(n * (n - 1) // 2), 0) AS BIGINT) AS v FROM cont),
    pp AS (SELECT CAST(COALESCE(sum(n * (n - 1) // 2), 0) AS BIGINT) AS v
           FROM (SELECT pc, sum(n) AS n FROM cont GROUP BY 1)),
    tt AS (SELECT CAST(COALESCE(sum(n * (n - 1) // 2), 0) AS BIGINT) AS v
           FROM (SELECT tc, sum(n) AS n FROM cont GROUP BY 1))
    SELECT tp.v AS tp_pairs, pp.v AS pred_pairs, tt.v AS truth_pairs,
           round(CASE WHEN pp.v > 0 THEN tp.v * 1.0 / pp.v ELSE 0 END, 6) AS pair_precision,
           round(CASE WHEN tt.v > 0 THEN tp.v * 1.0 / tt.v ELSE 0 END, 6) AS pair_recall,
           round(CASE WHEN pp.v > 0 AND tt.v > 0 AND tp.v > 0
                      THEN 2 * (tp.v * 1.0 / pp.v) * (tp.v * 1.0 / tt.v)
                           / ((tp.v * 1.0 / pp.v) + (tp.v * 1.0 / tt.v))
                      ELSE 0 END, 6) AS pair_f1
    FROM tp, pp, tt
    """,
)
def cluster_agreement_metrics(spark, sf_dir):
    import __spark_entry__ as entry_mod

    from ..config import PipelineConfig
    from ..operators.quality import pairwise_cluster_metrics
    from ..plans.pipeline import resolve
    from ..session import ensure_py_files

    ensure_py_files(spark)
    files = entry_mod._docs_as_repo_files(spark, sf_dir)
    pred = resolve(
        files, PipelineConfig(w_content=0.0, similarity_threshold=45)
    ).clusters
    truth = cc_clusters_ngram(spark, sf_dir).withColumnRenamed("doc_id", "file_id")
    return pairwise_cluster_metrics(pred, truth)


# --- one-round star clustering (chaining-resistant rosters) -----------------
# Same exact n-gram Jaccard edge set as cc_clusters_ngram, but labeled with
# one-hop neighborhood minima instead of the transitive fixpoint: noisy
# similarity chains stay as overlapping stars instead of merging into one
# giant cluster. One shuffle, no iteration — the cheap first-cut roster.
@query(
    "star_clusters_ngram",
    f"""
    WITH {_NGRAM_PAIR_CTES},
    ed AS (
        SELECT l AS s, r AS d FROM p WHERE c * 1.0 / (ln + rn - c) >= 0.5
        UNION ALL
        SELECT r AS s, l AS d FROM p WHERE c * 1.0 / (ln + rn - c) >= 0.5
    )
    SELECT s AS doc_id, least(s, min(d)) AS star_id FROM ed GROUP BY s
    """,
)
def star_clusters_ngram(spark, sf_dir):
    from ..operators.clustering import star_labels
    from ..operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.5, max_doc_freq=1_000_000_000
    )
    return star_labels(
        edges.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    ).select(F.col("file_id").alias("doc_id"), "star_id")
