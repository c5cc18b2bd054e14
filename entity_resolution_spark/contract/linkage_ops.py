"""Driver-contract row for Fellegi-Sunter EM linkage (operators/linkage.py).

Candidate pairs = every shared-trigram pair over `documents` (the
dedup_ngram_jaccard inverted-index CTEs, threshold dropped); comparison
vector = (lang equality, source equality, n_chars//100 band equality,
jaccard >= 0.3); 8 EM iterations.  The DuckDB oracle replicates the WHOLE
model — candidate generation, gamma vectors, the pattern census, every EM
iteration as a pair of unrolled CTEs (E-step weights over the census,
M-step scalars rounded half-away-from-zero at 10 decimals and clamped
exactly like fs_em), and the final per-pair match weight / posterior — so
the driver hashes the predictions of a genuinely EM-trained model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..queries import _t, query
from .dedup_ops import _NGRAM_PAIR_CTES

_GAMMAS = ["g_lang", "g_source", "g_len", "g_jac"]
_ITERS = 8
_ROUND = 10
_LAM0, _M0, _U0 = 0.1, 0.9, 0.1


def _fs_em_sql(mode: str = "score") -> str:
    """mode: 'score' (per-pair weights), 'tf' (term-frequency adjusted),
    'cluster' (posterior>=0.9 edges -> recursive closure -> golden records)."""
    k = len(_GAMMAS)

    def case(g: str, p: str) -> str:
        return f"(CASE WHEN {g} = 1 THEN e.{p} ELSE 1.0 - e.{p} END)"

    def mstep(expr_num: str, expr_den: str) -> str:
        return (
            f"least(greatest(round({expr_num} / greatest({expr_den}, 1e-300),"
            f" {_ROUND}), 1e-6), 0.999999)"
        )

    parts = [
        f"""
    pairs AS (SELECT l AS left_id, r AS right_id,
                     round(c * 1.0 / (ln + rn - c), 6) AS jaccard FROM p),
    v AS (SELECT pairs.left_id, pairs.right_id, pairs.jaccard,
            CAST(dl.lang IS NOT DISTINCT FROM dr.lang AS INT) AS g_lang,
            CAST(dl.source IS NOT DISTINCT FROM dr.source AS INT) AS g_source,
            CAST(dl.n_chars // 100 IS NOT DISTINCT FROM dr.n_chars // 100
                 AS INT) AS g_len,
            CAST(pairs.jaccard >= 0.3 AS INT) AS g_jac,
            CASE WHEN dl.lang IS NOT DISTINCT FROM dr.lang THEN dl.lang END
              AS v_g_lang,
            CASE WHEN dl.source IS NOT DISTINCT FROM dr.source THEN dl.source END
              AS v_g_source
          FROM pairs
          JOIN documents dl ON dl.doc_id = pairs.left_id
          JOIN documents dr ON dr.doc_id = pairs.right_id),
    cen AS (SELECT {', '.join(_GAMMAS)}, count(*) AS c FROM v
            GROUP BY {', '.join(_GAMMAS)}),
    e0 AS (SELECT {_LAM0} AS lam,
           {', '.join(f'{_M0} AS m{i + 1}' for i in range(k))},
           {', '.join(f'{_U0} AS u{i + 1}' for i in range(k))})"""
    ]
    for it in range(1, _ITERS + 1):
        wm = " * ".join(case(g, f"m{i + 1}") for i, g in enumerate(_GAMMAS))
        wu = " * ".join(case(g, f"u{i + 1}") for i, g in enumerate(_GAMMAS))
        m_cols = ", ".join(
            mstep(f"sum(w * c * {g})", "sum(w * c)") + f" AS m{i + 1}"
            for i, g in enumerate(_GAMMAS)
        )
        u_cols = ", ".join(
            mstep(f"sum((1.0 - w) * c * {g})", "sum((1.0 - w) * c)") + f" AS u{i + 1}"
            for i, g in enumerate(_GAMMAS)
        )
        parts.append(
            f"""
    w{it} AS (SELECT q.*, wm / (wm + wu) AS w FROM (
        SELECT cen.*, e.lam * {wm} AS wm, (1.0 - e.lam) * {wu} AS wu
        FROM cen CROSS JOIN e{it - 1} e) q),
    e{it} AS (SELECT round(sum(w * c) / sum(c), {_ROUND}) AS lam,
              {m_cols}, {u_cols}
              FROM w{it})"""
        )
    num = " * ".join(case(g, f"m{i + 1}") for i, g in enumerate(_GAMMAS))
    den = " * ".join(case(g, f"u{i + 1}") for i, g in enumerate(_GAMMAS))
    if mode == "score":
        parts.append(
            f"""
    scored AS (SELECT v.*, e.lam AS lam, {num} AS num, {den} AS den
               FROM v CROSS JOIN e{_ITERS} e)
    SELECT left_id, right_id, jaccard, {', '.join(_GAMMAS)},
           round(log2(num / den), 6) AS match_weight,
           round((lam * num) / (lam * num + (1.0 - lam) * den), 6) AS posterior
    FROM scored"""
        )
        return f"WITH {_NGRAM_PAIR_CTES}," + ",".join(parts)
    if mode == "cluster":
        parts.append(
            f"""
    scored AS (SELECT v.*, e.lam AS lam, {num} AS num, {den} AS den
               FROM v CROSS JOIN e{_ITERS} e),
    fedges AS (SELECT left_id AS a, right_id AS b FROM scored
               WHERE round((lam * num) /
                           (lam * num + (1.0 - lam) * den), 6) >= 0.9),
    dir AS (SELECT a, b FROM fedges UNION SELECT b, a FROM fedges),
    reach(a, b) AS (
      SELECT a, b FROM dir
      UNION
      SELECT r.a, d.b FROM reach r JOIN dir d ON r.b = d.a
    ),
    asg AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            FROM reach GROUP BY a),
    j AS (SELECT asg.cluster_id, d.lang, d.source, d.text, d.n_chars
          FROM asg JOIN documents d USING (doc_id)),
    lang_m AS (SELECT cluster_id, lang FROM (
        SELECT cluster_id, lang,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY c DESC, lang ASC) AS rk
        FROM (SELECT cluster_id, lang, count(*) AS c FROM j
              WHERE lang IS NOT NULL GROUP BY 1, 2)) WHERE rk = 1),
    src_m AS (SELECT cluster_id, source FROM (
        SELECT cluster_id, source,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY c DESC, source ASC) AS rk
        FROM (SELECT cluster_id, source, count(*) AS c FROM j
              WHERE source IS NOT NULL GROUP BY 1, 2)) WHERE rk = 1),
    txt_l AS (SELECT cluster_id, text FROM (
        SELECT cluster_id, text,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY length(text) DESC, text ASC) AS rk
        FROM j WHERE text IS NOT NULL) WHERE rk = 1),
    nmax AS (SELECT cluster_id, max(n_chars) AS n_chars FROM j GROUP BY 1),
    cl AS (SELECT DISTINCT cluster_id FROM j)
    SELECT cl.cluster_id, lang_m.lang, src_m.source, txt_l.text, nmax.n_chars
    FROM cl LEFT JOIN lang_m USING (cluster_id)
            LEFT JOIN src_m USING (cluster_id)
            LEFT JOIN txt_l USING (cluster_id)
            LEFT JOIN nmax USING (cluster_id)"""
        )
        return f"WITH RECURSIVE {_NGRAM_PAIR_CTES}," + ",".join(parts)
    # TF-adjusted tail: value-share tables over the RECORDS, the u_i of the
    # adjusted fields taken from the final EM iteration, deltas and sum
    # rounded at 6 exactly like operators/linkage.fs_score_tf.
    parts.append(
        f"""
    scored AS (SELECT v.*, e.lam AS lam, e.u1 AS u_lang, e.u2 AS u_source,
                      {num} AS num, {den} AS den
               FROM v CROSS JOIN e{_ITERS} e),
    lang_tf AS (SELECT lang AS val,
                       round(count(*) * 1.0 /
                             (SELECT count(*) FROM documents
                              WHERE lang IS NOT NULL), 10) AS share
                FROM documents WHERE lang IS NOT NULL GROUP BY 1),
    src_tf AS (SELECT source AS val,
                      round(count(*) * 1.0 /
                            (SELECT count(*) FROM documents
                             WHERE source IS NOT NULL), 10) AS share
               FROM documents WHERE source IS NOT NULL GROUP BY 1)
    SELECT s.left_id, s.right_id, {', '.join('s.' + g for g in _GAMMAS)},
           round(log2(s.num / s.den), 6) AS match_weight,
           round((s.lam * s.num) /
                 (s.lam * s.num + (1.0 - s.lam) * s.den), 6) AS posterior,
           round(round(log2(s.num / s.den), 6)
             + (CASE WHEN s.g_lang = 1 AND lt.share IS NOT NULL
                     THEN round(log2(s.u_lang / lt.share), 6) ELSE 0.0 END
                + CASE WHEN s.g_source = 1 AND st.share IS NOT NULL
                       THEN round(log2(s.u_source / st.share), 6) ELSE 0.0 END),
             6) AS tf_match_weight
    FROM scored s
    LEFT JOIN lang_tf lt ON lt.val = s.v_g_lang
    LEFT JOIN src_tf st ON st.val = s.v_g_source"""
    )
    return f"WITH {_NGRAM_PAIR_CTES}," + ",".join(parts)


@query("fs_em_linkage", _fs_em_sql())
def fs_em_linkage(spark, sf_dir):
    """EM-trained Fellegi-Sunter scores for every shared-trigram pair."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.linkage import comparison_vectors, fs_score, fs_train

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.0, max_doc_freq=1_000_000_000)
    vec = comparison_vectors(
        pairs,
        docs,
        {
            "g_lang": "lang",
            "g_source": "source",
            "g_len": ("n_chars", lambda l, r: F.floor(l / 100).eqNullSafe(F.floor(r / 100))),
        },
    ).withColumn("g_jac", (F.col("jaccard") >= 0.3).cast("int"))
    model = fs_train(vec, _GAMMAS, iters=_ITERS, round_at=_ROUND, lam0=_LAM0, m0=_M0, u0=_U0)
    return fs_score(vec, model).select(
        "left_id", "right_id", "jaccard", *_GAMMAS, "match_weight", "posterior"
    )


_SNM_WINDOW = 10


@query(
    "snm_candidate_pairs",
    f"""
    WITH r AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY substr(lower(trim(coalesce(text, ''))), 1, 40),
                        doc_id) - 1 AS pos
      FROM documents
    )
    SELECT a.doc_id AS left_id, b.doc_id AS right_id,
           b.pos - a.pos AS rank_distance
    FROM r a JOIN r b ON b.pos > a.pos AND b.pos - a.pos < {_SNM_WINDOW}
    """,
)
def snm_candidate_pairs(spark, sf_dir):
    """Sorted-neighborhood blocking over a normalized text-prefix key."""
    from ..operators.blocking import sorted_neighborhood_pairs

    docs = _t(spark, sf_dir, "documents").withColumn(
        "sort_key",
        F.substring(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), 1, 40),
    )
    return sorted_neighborhood_pairs(docs, ["sort_key"], window=_SNM_WINDOW)


_MB_MAX_BLOCK = 1000


@query(
    "metablocking_wnp_edges",
    f"""
    WITH t AS (SELECT doc_id,
                      string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS toks
               FROM documents),
    p1 AS (SELECT DISTINCT doc_id AS id,
                  unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                                        FOR i IN range(1, greatest(len(toks)-2, 1)+1)])) AS key
           FROM t),
    p2 AS (SELECT * FROM p1 WHERE key <> ''),
    census AS (SELECT key, count(*) AS bs FROM p2 GROUP BY 1),
    p AS (SELECT p2.id, p2.key FROM p2 JOIN census USING (key)
          WHERE bs <= {_MB_MAX_BLOCK}),
    nb AS (SELECT id, count(*) AS n FROM p GROUP BY 1),
    pp AS (SELECT p.key, p.id, nb.n FROM p JOIN nb USING (id)),
    edges AS (SELECT a.id AS left_id, b.id AS right_id, a.n AS nl, b.n AS nr,
                     count(*) AS cbs
              FROM pp a JOIN pp b ON a.key = b.key AND a.id < b.id
              GROUP BY 1, 2, 3, 4),
    e2 AS (SELECT left_id, right_id, cbs,
                  round(cbs * 1.0 / (nl + nr - cbs), 6) AS js FROM edges),
    prof AS (SELECT node, round(avg(js), 6) AS mean FROM (
               SELECT left_id AS node, js FROM e2
               UNION ALL SELECT right_id AS node, js FROM e2) GROUP BY 1)
    SELECT e2.left_id, e2.right_id, e2.cbs, e2.js
    FROM e2 JOIN prof pl ON pl.node = e2.left_id
            JOIN prof pr ON pr.node = e2.right_id
    WHERE e2.js >= pl.mean OR e2.js >= pr.mean
    """,
)
def metablocking_wnp_edges(spark, sf_dir):
    """WNP meta-blocking over word-trigram token blocking."""
    from ..operators.metablocking import meta_blocking_wnp, shingle_postings

    docs = _t(spark, sf_dir, "documents")
    return meta_blocking_wnp(shingle_postings(docs, n=3), max_block_size=_MB_MAX_BLOCK)


@query(
    "survivorship_golden_records",
    """
    WITH RECURSIVE
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
          GROUP BY 1, 2, 3, 4),
    edges AS (SELECT l AS a, b FROM (SELECT l, r AS b FROM p
              WHERE c * 1.0 / (ln + rn - c) >= 0.5)),
    dir AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    reach(a, b) AS (
      SELECT a, b FROM dir
      UNION
      SELECT r.a, d.b FROM reach r JOIN dir d ON r.b = d.a
    ),
    asg AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            FROM reach GROUP BY a),
    j AS (SELECT asg.cluster_id, d.lang, d.source, d.text, d.n_chars
          FROM asg JOIN documents d USING (doc_id)),
    lang_m AS (SELECT cluster_id, lang FROM (
        SELECT cluster_id, lang,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY c DESC, lang ASC) AS rk
        FROM (SELECT cluster_id, lang, count(*) AS c FROM j
              WHERE lang IS NOT NULL GROUP BY 1, 2)) WHERE rk = 1),
    src_m AS (SELECT cluster_id, source FROM (
        SELECT cluster_id, source,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY c DESC, source ASC) AS rk
        FROM (SELECT cluster_id, source, count(*) AS c FROM j
              WHERE source IS NOT NULL GROUP BY 1, 2)) WHERE rk = 1),
    txt_l AS (SELECT cluster_id, text FROM (
        SELECT cluster_id, text,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY length(text) DESC, text ASC) AS rk
        FROM j WHERE text IS NOT NULL) WHERE rk = 1),
    nmax AS (SELECT cluster_id, max(n_chars) AS n_chars FROM j GROUP BY 1),
    cl AS (SELECT DISTINCT cluster_id FROM j)
    SELECT cl.cluster_id, lang_m.lang, src_m.source, txt_l.text, nmax.n_chars
    FROM cl LEFT JOIN lang_m USING (cluster_id)
            LEFT JOIN src_m USING (cluster_id)
            LEFT JOIN txt_l USING (cluster_id)
            LEFT JOIN nmax USING (cluster_id)
    """,
)
def survivorship_golden_records(spark, sf_dir):
    """Field-level golden record per near-dup cluster: modal lang/source,
    longest text, max n_chars."""
    from ..operators.clustering import connected_components
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.survivorship import golden_records

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.5, max_doc_freq=1_000_000_000)
    asg = connected_components(
        edges.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    ).select(F.col("file_id").alias("doc_id"), "cluster_id")
    return golden_records(
        asg,
        docs,
        {"lang": "majority", "source": "majority", "text": "longest", "n_chars": "max"},
    )


_PPJ_T = 0.6


@query(
    "ppjoin_token_jaccard",
    f"""
    WITH t AS (SELECT doc_id,
                      list_distinct([x FOR x IN
                        string_split_regex(lower(trim(coalesce(text, ''))), '\\s+')
                        IF x <> '']) AS toks
               FROM documents),
    e AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS token FROM t),
    p AS (SELECT a.doc_id AS l, b.doc_id AS r, a.n AS ln, b.n AS rn,
                 count(*) AS c
          FROM e a JOIN e b ON a.token = b.token AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
    SELECT l AS left_id, r AS right_id,
           round(c * 1.0 / (ln + rn - c), 6) AS jaccard
    FROM p WHERE round(c * 1.0 / (ln + rn - c), 6) >= {_PPJ_T}
    """,
)
def ppjoin_token_jaccard_q(spark, sf_dir):
    """Prefix-filtered exact token-set jaccard join; the oracle is the
    brute-force inverted index — identical output, so the driver pins the
    prefix filter's EXACTNESS, while pytest pins its candidate reduction."""
    from ..operators.setjoin import ppjoin_token_jaccard

    return ppjoin_token_jaccard(_t(spark, sf_dir, "documents"), threshold=_PPJ_T)


@query("fs_em_linkage_tf", _fs_em_sql(mode="tf"))
def fs_em_linkage_tf(spark, sf_dir):
    """FS-EM scores with Splink-style term-frequency adjustment on the
    lang/source agreements: rare-value agreement earns extra weight."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.linkage import (
        comparison_vectors,
        fs_score_tf,
        fs_train,
        tf_share_table,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.0, max_doc_freq=1_000_000_000)
    vec = comparison_vectors(
        pairs,
        docs,
        {
            "g_lang": "lang",
            "g_source": "source",
            "g_len": ("n_chars", lambda l, r: F.floor(l / 100).eqNullSafe(F.floor(r / 100))),
        },
        keep_values=True,
    ).withColumn("g_jac", (F.col("jaccard") >= 0.3).cast("int"))
    model = fs_train(vec, _GAMMAS, iters=_ITERS, round_at=_ROUND, lam0=_LAM0, m0=_M0, u0=_U0)
    shares = {
        "g_lang": tf_share_table(docs, "lang"),
        "g_source": tf_share_table(docs, "source"),
    }
    return fs_score_tf(vec, model, shares).select(
        "left_id", "right_id", *_GAMMAS, "match_weight", "posterior", "tf_match_weight"
    )


@query("fs_linkage_clusters", _fs_em_sql(mode="cluster"))
def fs_linkage_clusters(spark, sf_dir):
    """The whole link_entities pipeline as one row: EM-scored pairs ->
    posterior>=0.9 edges -> connected components -> golden records."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.linkage import link_entities

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.0, max_doc_freq=1_000_000_000)
    res = link_entities(
        docs,
        pairs,
        fields={
            "g_lang": "lang",
            "g_source": "source",
            "g_len": ("n_chars", lambda l, r: F.floor(l / 100).eqNullSafe(F.floor(r / 100))),
        },
        extra_gammas={"g_jac": (F.col("jaccard") >= 0.3).cast("int")},
        rules={"lang": "majority", "source": "majority", "text": "longest", "n_chars": "max"},
        threshold=0.9,
        iters=_ITERS,
        round_at=_ROUND,
    )
    return res.golden


_CONT_T = 0.8


@query(
    "dedup_containment",
    f"""
    WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
               FROM documents),
    g AS (SELECT doc_id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks)-2, 1)+1)]) AS grams
          FROM t),
    e AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM g),
    p AS (SELECT a.doc_id AS l, b.doc_id AS r, a.n_grams AS ln, b.n_grams AS rn,
                 count(*) AS c
          FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
    o AS (SELECT
            CASE WHEN ln < rn OR (ln = rn AND l < r) THEN l ELSE r END AS inner_id,
            CASE WHEN ln < rn OR (ln = rn AND l < r) THEN r ELSE l END AS outer_id,
            round(c * 1.0 / (CASE WHEN ln < rn OR (ln = rn AND l < r)
                                  THEN ln ELSE rn END), 6) AS containment,
            round(c * 1.0 / (ln + rn - c), 6) AS jaccard
          FROM p)
    SELECT inner_id, outer_id, containment, jaccard
    FROM o WHERE containment >= {_CONT_T}
    """,
)
def dedup_containment(spark, sf_dir):
    """Directional containment pairs: truncation/extension duplicates the
    symmetric jaccard threshold misses."""
    from ..operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _t(spark, sf_dir, "documents"),
        n=3,
        min_containment=_CONT_T,
        max_doc_freq=1_000_000_000,
    )


@query(
    "token_entropy_stats",
    """
    WITH e AS (SELECT doc_id, unnest(string_split_regex(
                 lower(trim(coalesce(text, ''))), '\\s+')) AS token
               FROM documents),
    c AS (SELECT doc_id, token, count(*) AS c FROM e
          WHERE token <> '' GROUP BY 1, 2),
    s AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS distinct_tokens,
                 sum(c * log2(c)) AS sc
          FROM c GROUP BY 1)
    SELECT d.doc_id,
           CAST(s.n_tokens AS DOUBLE) AS n_tokens,
           CAST(s.distinct_tokens AS DOUBLE) AS distinct_tokens,
           round(s.distinct_tokens * 1.0 / s.n_tokens, 6) AS ttr,
           round(log2(s.n_tokens) - s.sc / s.n_tokens, 6) AS entropy
    FROM documents d LEFT JOIN s USING (doc_id)
    """,
)
def token_entropy_stats(spark, sf_dir):
    """Unigram entropy + type-token ratio per document."""
    from ..operators.stats import token_entropy

    return token_entropy(_t(spark, sf_dir, "documents"))


_REVIEW_K = 40


@query(
    "fs_review_queue",
    f"""
    SELECT *, round(abs(posterior - 0.5), 6) AS margin
    FROM ({_fs_em_sql()})
    ORDER BY round(abs(posterior - 0.5), 6), left_id, right_id
    LIMIT {_REVIEW_K}
    """,
)
def fs_review_queue(spark, sf_dir):
    """Uncertainty-sampled review batch: the 40 pairs nearest posterior 0.5."""
    from ..operators.linkage import review_queue

    return review_queue(fs_em_linkage(spark, sf_dir), _REVIEW_K)


def _fs_audit_sql() -> str:
    """cluster mode's CTEs, finishing in the per-cluster edge-density audit
    instead of golden records."""
    base = _fs_em_sql(mode="cluster")
    head, _, _ = base.rpartition(",\n    j AS (")
    return (
        head
        + """,
    sedges AS (SELECT left_id, right_id,
                      round((lam * num) /
                            (lam * num + (1.0 - lam) * den), 6) AS posterior
               FROM scored
               WHERE round((lam * num) /
                           (lam * num + (1.0 - lam) * den), 6) >= 0.9),
    sizes AS (SELECT cluster_id, count(*) AS n_members FROM asg GROUP BY 1),
    inside AS (SELECT al.cluster_id, count(*) AS n_edges,
                      round(min(se.posterior), 6) AS min_score,
                      round(avg(se.posterior), 6) AS mean_score
               FROM sedges se
               JOIN asg al ON al.doc_id = se.left_id
               JOIN asg ar ON ar.doc_id = se.right_id
               WHERE al.cluster_id = ar.cluster_id
               GROUP BY 1)
    SELECT s.cluster_id, s.n_members, coalesce(i.n_edges, 0) AS n_edges,
           (s.n_members * (s.n_members - 1)) // 2 AS possible_pairs,
           round(coalesce(i.n_edges, 0) * 1.0 /
                 greatest((s.n_members * (s.n_members - 1)) // 2, 1), 6)
             AS density,
           i.min_score, i.mean_score
    FROM sizes s LEFT JOIN inside i USING (cluster_id)"""
    )


@query("fs_cluster_audit", _fs_audit_sql())
def fs_cluster_audit(spark, sf_dir):
    """Per-cluster consistency audit of the FS-linked entities: edge
    density + min/mean posterior flag chained clusters for review."""
    from ..operators.clustering import connected_components
    from ..operators.quality import cluster_edge_density

    scored = fs_em_linkage(spark, sf_dir)
    edges = scored.where(F.col("posterior") >= 0.9).select(
        "left_id", "right_id", "posterior"
    )
    asg = connected_components(
        edges.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    ).select(F.col("file_id").alias("doc_id"), "cluster_id")
    return cluster_edge_density(asg, edges)


def _fs_explain_sql() -> str:
    """score mode's EM CTEs, finishing in the per-field waterfall terms."""
    base = _fs_em_sql(mode="score")
    head, _, _ = base.rpartition(",\n    scored AS (")
    terms = ", ".join(
        f"""round(CASE WHEN {g} = 1 THEN log2(e.m{i + 1} / e.u{i + 1})
                 ELSE log2((1.0 - e.m{i + 1}) / (1.0 - e.u{i + 1})) END, 6)
             AS wt_{g}"""
        for i, g in enumerate(_GAMMAS)
    )
    total = " + ".join(f"wt_{g}" for g in _GAMMAS) + " + wt_prior"
    return (
        head
        + f""",
    expl AS (SELECT v.left_id, v.right_id, {', '.join('v.' + g for g in _GAMMAS)},
                    {terms},
                    round(log2(e.lam / (1.0 - e.lam)), 6) AS wt_prior
             FROM v CROSS JOIN e{_ITERS} e)
    SELECT *, round({total}, 6) AS wt_total FROM expl"""
    )


@query("fs_explain_weights", _fs_explain_sql())
def fs_explain_weights(spark, sf_dir):
    """Per-field additive weight breakdown (the Splink waterfall) for every
    candidate pair under the EM-fitted model."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.linkage import comparison_vectors, fs_explain, fs_train

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.0, max_doc_freq=1_000_000_000)
    vec = comparison_vectors(
        pairs,
        docs,
        {
            "g_lang": "lang",
            "g_source": "source",
            "g_len": ("n_chars", lambda l, r: F.floor(l / 100).eqNullSafe(F.floor(r / 100))),
        },
    ).withColumn("g_jac", (F.col("jaccard") >= 0.3).cast("int"))
    model = fs_train(vec, _GAMMAS, iters=_ITERS, round_at=_ROUND, lam0=_LAM0, m0=_M0, u0=_U0)
    return fs_explain(vec, model).select(
        "left_id", "right_id", *_GAMMAS,
        *[f"wt_{g}" for g in _GAMMAS], "wt_prior", "wt_total",
    )


@query(
    "ngram_novelty_scores",
    """
    WITH t AS (SELECT doc_id,
                      string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS toks
               FROM documents),
    g AS (SELECT doc_id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks)-2, 1)+1)]) AS grams
          FROM t),
    e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    e2 AS (SELECT doc_id, gram FROM e WHERE gram <> ''),
    dfq AS (SELECT gram, count(*) AS df FROM e2 GROUP BY 1),
    s AS (SELECT e2.doc_id, count(*) AS n_grams,
                 sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS novel_grams
          FROM e2 JOIN dfq USING (gram) GROUP BY 1)
    SELECT d.doc_id,
           CAST(s.n_grams AS DOUBLE) AS n_grams,
           CAST(s.novel_grams AS DOUBLE) AS novel_grams,
           round(s.novel_grams * 1.0 / s.n_grams, 6) AS novelty
    FROM documents d LEFT JOIN s USING (doc_id)
    """,
)
def ngram_novelty_scores(spark, sf_dir):
    """Share of each doc's distinct trigrams unique to it corpus-wide."""
    from ..operators.stats import ngram_novelty

    return ngram_novelty(_t(spark, sf_dir, "documents"), n=3)


def _sx_code(c: str) -> str:
    """Soundex letter->code CASE (commons-codec mapping, which Spark's
    builtin follows): H/W -> '7' (merge adjacent equal codes), vowels AND
    mid-string non-letters -> '0' (reset the run; Spark 'x9z' -> 'X200')."""
    return f"""CASE WHEN {c} IN ('B','F','P','V') THEN '1'
         WHEN {c} IN ('C','G','J','K','Q','S','X','Z') THEN '2'
         WHEN {c} IN ('D','T') THEN '3'
         WHEN {c} = 'L' THEN '4'
         WHEN {c} IN ('M','N') THEN '5'
         WHEN {c} = 'R' THEN '6'
         WHEN {c} IN ('H','W') THEN '7'
         ELSE '0' END"""


_SOUNDEX_SQL = f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id,
                    coalesce(string_split_regex(
                      lower(trim(coalesce(text, ''))), '\\s+')[1], '') AS token
             FROM documents),
    base AS (SELECT doc_id, token, upper(token) AS u FROM toks),
    walk(doc_id, u, sx, last, pos) AS (
      SELECT doc_id, u, substr(u, 1, 1), {_sx_code("substr(u, 1, 1)")}, 2
      FROM base WHERE substr(u, 1, 1) BETWEEN 'A' AND 'Z'
      UNION ALL
      SELECT doc_id, u,
             CASE WHEN length(sx) >= 4 THEN sx
                  WHEN code IN ('0', '7') THEN sx
                  WHEN code = last THEN sx
                  ELSE sx || code END,
             CASE WHEN code = '7' THEN last ELSE code END,
             pos + 1
      FROM (SELECT w.*, {_sx_code("substr(u, pos, 1)")} AS code
            FROM walk w WHERE pos <= length(u))
    ),
    fin AS (SELECT doc_id, rpad(sx, 4, '0') AS soundex
            FROM walk WHERE pos = length(u) + 1)
    SELECT b.doc_id, b.token, coalesce(f.soundex, b.token) AS soundex
    FROM base b LEFT JOIN fin f USING (doc_id)
"""


@query("phonetic_soundex_keys", _SOUNDEX_SQL)
def phonetic_soundex_keys(spark, sf_dir):
    """Soundex phonetic blocking key over each doc's first token; the
    oracle is a recursive-CTE replica of Spark's builtin soundex
    (commons-codec semantics), additionally pinned over every distinct
    corpus token plus hostile edge cases in tests/test_linkage.py."""
    from ..operators.blocking import phonetic_keys

    return phonetic_keys(_t(spark, sf_dir, "documents"))


def _fs_pr_sql() -> str:
    return f"""
    WITH base AS ({_fs_em_sql(mode="score")}),
    truth AS (SELECT left_id, right_id FROM base WHERE jaccard >= 0.5),
    tt AS (SELECT count(*) AS t FROM truth),
    lab AS (SELECT b.posterior AS threshold,
                   CASE WHEN t.left_id IS NOT NULL THEN 1 ELSE 0 END AS is_m
            FROM base b LEFT JOIN truth t USING (left_id, right_id)),
    lvl AS (SELECT threshold, sum(is_m) AS tp_here, count(*) AS n_here
            FROM lab GROUP BY 1),
    cum AS (SELECT threshold,
                   sum(tp_here) OVER (ORDER BY threshold DESC) AS tp,
                   sum(n_here) OVER (ORDER BY threshold DESC) AS predicted
            FROM lvl)
    SELECT threshold, CAST(tp AS BIGINT) AS tp,
           CAST(predicted - tp AS BIGINT) AS fp,
           CAST((SELECT t FROM tt) - tp AS BIGINT) AS fn,
           round(tp * 1.0 / predicted, 6) AS precision,
           round(tp * 1.0 / greatest((SELECT t FROM tt), 1), 6) AS recall,
           round(2.0 * tp / (predicted + (SELECT t FROM tt)), 6) AS f1
    FROM cum
    """


@query("fs_pr_curve_report", _fs_pr_sql())
def fs_pr_curve_report(spark, sf_dir):
    """Operating-point table for the EM model, scored against the
    jaccard>=0.5 pseudo-truth: at most 2^k thresholds by construction."""
    from ..operators.linkage import fs_pr_curve

    scored = fs_em_linkage(spark, sf_dir)
    truth = scored.where(F.col("jaccard") >= 0.5).select("left_id", "right_id")
    return fs_pr_curve(scored, truth)


@query(
    "edit_distance_join_names",
    """
    SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS distance
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def edit_distance_join_names(spark, sf_dir):
    """Ed-Join (q-gram prefix-filtered edit-distance self-join) at tau=1 over
    customer names; the oracle is the brute-force levenshtein join, so the
    driver pins the filter's exactness end-to-end (pytest additionally pins
    the candidate-count reduction)."""
    from ..operators.editjoin import edit_distance_join

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return edit_distance_join(
        cust, tau=1, q=2, id_col="c_custkey", text_col="c_name"
    ).withColumn("distance", F.col("distance").cast("long"))


@query(
    "one_to_one_matches",
    f"""
    WITH {_NGRAM_PAIR_CTES},
    base AS (SELECT l, r, round(c * 1.0 / (ln + rn - c), 6) AS j
             FROM p WHERE c * 1.0 / (ln + rn - c) >= 0.2),
    sym AS (SELECT l AS src, r AS dst, j FROM base
            UNION ALL SELECT r AS src, l AS dst, j FROM base),
    best AS (SELECT src, dst, j,
                    row_number() OVER (PARTITION BY src
                                       ORDER BY j DESC, dst ASC) AS rn
             FROM sym),
    b1 AS (SELECT src, dst, j FROM best WHERE rn = 1)
    SELECT a.src AS left_id, a.dst AS right_id, a.j AS score
    FROM b1 a JOIN b1 b ON a.src = b.dst AND a.dst = b.src
    WHERE a.src < a.dst
    """,
)
def one_to_one_matches(spark, sf_dir):
    """Unique-mapping constraint (census linkage / Splink 'unique' type):
    symmetric best match over the trigram-jaccard candidate graph — each
    doc keeps at most one partner, kept only when the preference is mutual
    (score DESC, partner id ASC tie-break)."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.matching import mutual_best_matches

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.2, max_doc_freq=1_000_000_000
    )
    return mutual_best_matches(pairs, score_col="jaccard")


_TFIDF_T = 0.9


@query(
    "tfidf_cosine_join_docs",
    f"""
    WITH e AS (SELECT doc_id, token, count(*) AS tf
               FROM (SELECT doc_id,
                            unnest(string_split_regex(
                                lower(trim(coalesce(text, ''))), '\\s+')) AS token
                     FROM documents)
               WHERE token <> '' GROUP BY 1, 2),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (SELECT doc_id, token, tf * ln(n_docs * 1.0 / df) AS w
          FROM e
          JOIN (SELECT token, count(*) AS df FROM e GROUP BY 1) USING (token)
          CROSS JOIN n
          WHERE tf * ln(n_docs * 1.0 / df) > 0),
    v AS (SELECT doc_id, token, w / nrm AS wn
          FROM w JOIN (SELECT doc_id, sqrt(sum(w * w)) AS nrm
                       FROM w GROUP BY 1) USING (doc_id)),
    p AS (SELECT a.doc_id AS l, b.doc_id AS r,
                 round(sum(a.wn * b.wn), 6) AS cosine
          FROM v a JOIN v b ON a.token = b.token AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT l AS left_id, r AS right_id, cosine
    FROM p WHERE cosine >= {_TFIDF_T}
    """,
)
def tfidf_cosine_join_docs(spark, sf_dir):
    """AllPairs-style tf-idf cosine similarity self-join (Bayardo et al.,
    WWW 2007): suffix-norm prefix filtering over L2-normalized tf-idf
    vectors, exact verification over shared tokens. The oracle is the
    brute-force weighted inverted index — identical output, so the driver
    pins the prefix filter's exactness; pytest pins candidate reduction."""
    from ..operators.setjoin import tfidf_cosine_join

    return tfidf_cosine_join(_t(spark, sf_dir, "documents"), threshold=_TFIDF_T)


_STI_THETA = 0.85
_STI_T = 0.5


@query(
    "soft_tfidf_part_names",
    f"""
    WITH pr AS (SELECT a.p_partkey AS l, b.p_partkey AS r
                FROM part a JOIN part b
                ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
    e AS (SELECT id, token, count(*) AS tf FROM (
            SELECT p_partkey AS id,
                   unnest(string_split_regex(
                       lower(trim(coalesce(p_name, ''))), '\\s+')) AS token
            FROM part)
          WHERE token <> '' GROUP BY 1, 2),
    n AS (SELECT count(*) AS n_docs FROM part),
    w AS (SELECT id, token, tf * ln(n_docs * 1.0 / df) AS w
          FROM e
          JOIN (SELECT token, count(*) AS df FROM e GROUP BY 1) USING (token)
          CROSS JOIN n
          WHERE tf * ln(n_docs * 1.0 / df) > 0),
    v AS (SELECT id, token, w / nrm AS wn
          FROM w JOIN (SELECT id, sqrt(sum(w * w)) AS nrm
                       FROM w GROUP BY 1) USING (id)),
    tp AS (SELECT pr.l, pr.r, vl.token AS tl, vl.wn AS wl,
                  vr.token AS tr, vr.wn AS wr,
                  jaro_winkler_similarity(vl.token, vr.token) AS jw
           FROM pr JOIN v vl ON vl.id = pr.l JOIN v vr ON vr.id = pr.r
           WHERE jaro_winkler_similarity(vl.token, vr.token) >= {_STI_THETA}),
    lr AS (SELECT l, r, sum(wl * wr * jw) AS s FROM (
             SELECT *, row_number() OVER (PARTITION BY l, r, tl
                                          ORDER BY jw DESC, tr ASC) AS rn
             FROM tp) WHERE rn = 1 GROUP BY 1, 2),
    rl AS (SELECT l, r, sum(wl * wr * jw) AS s FROM (
             SELECT *, row_number() OVER (PARTITION BY l, r, tr
                                          ORDER BY jw DESC, tl ASC) AS rn
             FROM tp) WHERE rn = 1 GROUP BY 1, 2)
    SELECT lr.l AS left_id, lr.r AS right_id,
           round((lr.s + rl.s) / 2, 6) AS soft_tfidf
    FROM lr JOIN rl ON lr.l = rl.l AND lr.r = rl.r
    WHERE round((lr.s + rl.s) / 2, 6) >= {_STI_T}
    """,
)
def soft_tfidf_part_names(spark, sf_dir):
    """Soft-TF-IDF (Cohen/Ravikumar/Fienberg 2003) over brand-blocked part
    name pairs: tf-idf weights with Jaro-Winkler soft token matching; the
    oracle replays the identical weighting/argmax program on DuckDB's
    bit-equal jaro_winkler_similarity."""
    from ..operators.setjoin import soft_tfidf_score
    from ..session import ensure_py_files

    ensure_py_files(spark)
    part = _t(spark, sf_dir, "part")
    pairs = (
        part.alias("a")
        .join(
            part.alias("b"),
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("left_id"),
            F.col("b.p_partkey").alias("right_id"),
        )
    )
    return soft_tfidf_score(
        part,
        pairs,
        threshold=_STI_T,
        theta=_STI_THETA,
        id_col="p_partkey",
        text_col="p_name",
    )


@query(
    "similarity_graph_triangles",
    f"""
    WITH {_NGRAM_PAIR_CTES},
    e2 AS (SELECT l, r FROM p WHERE c * 1.0 / (ln + rn - c) >= 0.2),
    tri AS (SELECT e1.l AS a, e1.r AS b, e2x.r AS c
            FROM e2 e1
            JOIN e2 e2x ON e2x.l = e1.r
            JOIN e2 e3 ON e3.l = e1.l AND e3.r = e2x.r),
    deg AS (SELECT id, count(*) AS degree FROM (
              SELECT l AS id FROM e2 UNION ALL SELECT r AS id FROM e2)
            GROUP BY 1),
    pn AS (SELECT id, count(*) AS triangles FROM (
             SELECT unnest([a, b, c]) AS id FROM tri) GROUP BY 1)
    SELECT deg.id AS id, CAST(degree AS BIGINT) AS degree,
           CAST(COALESCE(triangles, 0) AS BIGINT) AS triangles,
           round(CASE WHEN degree >= 2
                      THEN 2.0 * COALESCE(triangles, 0)
                           / (degree * (degree - 1.0))
                      ELSE 0.0 END, 6) AS clustering_coefficient
    FROM deg LEFT JOIN pn USING (id)
    """,
)
def similarity_graph_triangles(spark, sf_dir):
    """Per-node triangle count + local clustering coefficient over the
    trigram-jaccard similarity graph (degree-oriented wedge join, Suri &
    Vassilvitskii 2011) — the over-merge audit signal in graph form; the
    oracle is the brute-force a<b<c triple join."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.graphmetrics import triangle_stats

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.2, max_doc_freq=1_000_000_000
    )
    return triangle_stats(edges)


@query(
    "monge_elkan_part_names",
    """
    WITH t AS (SELECT p_partkey AS id,
                      list_distinct([x FOR x IN
                        string_split_regex(lower(trim(coalesce(p_name, ''))), '\\s+')
                        IF x <> '']) AS toks
               FROM part),
    e AS (SELECT id, unnest(toks) AS token FROM t),
    pr AS (SELECT a.p_partkey AS l, a.p_partkey + 1 AS r
           FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1),
    tp AS (SELECT pr.l, pr.r, el.token AS tl, er.token AS tr,
                  jaro_winkler_similarity(el.token, er.token) AS jw
           FROM pr JOIN e el ON el.id = pr.l JOIN e er ON er.id = pr.r),
    lr AS (SELECT l, r, avg(best) AS s FROM (
             SELECT l, r, tl, max(jw) AS best FROM tp GROUP BY 1, 2, 3)
           GROUP BY 1, 2),
    rl AS (SELECT l, r, avg(best) AS s FROM (
             SELECT l, r, tr, max(jw) AS best FROM tp GROUP BY 1, 2, 3)
           GROUP BY 1, 2)
    SELECT lr.l AS left_id, lr.r AS right_id,
           round((lr.s + rl.s) / 2, 6) AS monge_elkan
    FROM lr JOIN rl ON lr.l = rl.l AND lr.r = rl.r
    """,
)
def monge_elkan_part_names(spark, sf_dir):
    """Monge-Elkan (KDD 1996) token-best-match similarity over adjacent
    part-name pairs — the unweighted hybrid-metric companion to
    soft_tfidf_part_names; oracle replays the same max/avg program on
    DuckDB's bit-equal jaro_winkler_similarity."""
    from ..operators.setjoin import monge_elkan_score
    from ..session import ensure_py_files

    ensure_py_files(spark)
    part = _t(spark, sf_dir, "part")
    pairs = (
        part.alias("a")
        .join(
            part.alias("b"),
            F.col("b.p_partkey") == F.col("a.p_partkey") + 1,
        )
        .select(
            F.col("a.p_partkey").alias("left_id"),
            F.col("b.p_partkey").alias("right_id"),
        )
    )
    return monge_elkan_score(part, pairs, id_col="p_partkey", text_col="p_name")


def _pagerank_sql(iters: int = 10) -> str:
    """Unrolled DuckDB replica of graphmetrics.pagerank over the 0.2
    trigram-jaccard graph: one (contribution, rank) CTE pair per power
    iteration. `(1.0 - 0.85)` stays an expression — writing 0.15 would
    diverge from the engine's Python `1.0 - damping` in the last ulp."""
    parts = [
        """e0 AS (SELECT l AS a, r AS b FROM p
                 WHERE c * 1.0 / (ln + rn - c) >= 0.2),
    e1 AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
    deg AS (SELECT a, count(*) AS dg FROM e1 GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT a AS id, 1.0 / n AS rank FROM deg CROSS JOIN nn)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""c{i} AS (
      SELECT e1.b AS id, sum(r{i - 1}.rank / deg.dg) AS s
      FROM e1 JOIN r{i - 1} ON r{i - 1}.id = e1.a JOIN deg ON deg.a = e1.a
      GROUP BY 1),
    r{i} AS (
      SELECT deg.a AS id,
             (1.0 - 0.85) / n + 0.85 * COALESCE(c{i}.s, 0) AS rank
      FROM deg CROSS JOIN nn LEFT JOIN c{i} ON c{i}.id = deg.a)""")
    body = ",\n    ".join(parts)
    return (
        f"WITH {_NGRAM_PAIR_CTES}, {body}\n"
        f"    SELECT id, round(rank, 6) AS rank FROM r{iters}"
    )


@query("pagerank_similarity_graph", _pagerank_sql(10))
def pagerank_similarity_graph(spark, sf_dir):
    """10-iteration PageRank (damping 0.85) over the trigram-jaccard
    similarity graph (operators/graphmetrics.py pagerank) — the
    centrality rule for cluster-representative selection; the oracle
    unrolls all ten power iterations as chained CTEs."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.graphmetrics import pagerank

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.2, max_doc_freq=1_000_000_000
    )
    return pagerank(edges, iterations=10, damping=0.85)


@query(
    "canopy_blocking_docs",
    f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES},
    s AS (SELECT l AS a, r AS b, c * 1.0 / (ln + rn - c) AS j FROM p),
    ee1 AS (SELECT a, b FROM s WHERE j >= 0.2
            UNION ALL SELECT b AS a, a AS b FROM s WHERE j >= 0.2),
    ee2 AS (SELECT a, b FROM s WHERE j >= 0.35
            UNION ALL SELECT b AS a, a AS b FROM s WHERE j >= 0.35),
    nbx AS (SELECT a, list(b ORDER BY b) AS nbs FROM ee2 GROUP BY 1),
    allnodes AS (SELECT DISTINCT doc_id AS id FROM documents),
    seq AS (
      SELECT CAST([] AS BIGINT[]) AS centers,
             (SELECT list_sort(list(id)) FROM allnodes) AS remaining
      UNION ALL
      SELECT list_append(sq.centers, sq.rem1),
             list_filter(sq.remaining,
                         x -> x <> sq.rem1
                              AND NOT list_contains(COALESCE(nbx.nbs, []), x))
      FROM (SELECT centers, remaining, remaining[1] AS rem1
            FROM seq WHERE len(remaining) > 0) sq
      LEFT JOIN nbx ON nbx.a = sq.rem1
    ),
    cent AS (SELECT unnest(centers) AS cid FROM seq WHERE len(remaining) = 0),
    memb AS (SELECT ee1.a AS id, ee1.b AS canopy_id
             FROM ee1 JOIN cent ON cent.cid = ee1.b
             UNION SELECT cid AS id, cid AS canopy_id FROM cent)
    SELECT id, canopy_id, id = canopy_id AS is_center FROM memb
    """,
)
def canopy_blocking_docs(spark, sf_dir):
    """Canopy clustering (McCallum et al., KDD 2000) over the trigram
    jaccard cheap metric, T1=0.2 / T2=0.35: the engine's parallel
    local-minima rounds compute exactly the sequential min-id greedy
    (pinned in pytest); the oracle replays that sequential sweep as a
    recursive CTE with list state."""
    from ..operators.canopy import canopy_assignments
    from ..operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.2, max_doc_freq=1_000_000_000
    )
    return canopy_assignments(
        docs.select(F.col("doc_id").alias("id")),
        pairs,
        t1=0.2,
        t2=0.35,
        score_col="jaccard",
    )


def _hits_sql(iters: int = 10) -> str:
    """Unrolled DuckDB replica of graphmetrics.hits (L1-normalized)."""
    parts = [
        """he0 AS (SELECT l AS a, r AS b FROM p
                  WHERE c * 1.0 / (ln + rn - c) >= 0.2),
    he1 AS (SELECT a, b FROM he0 UNION ALL SELECT b AS a, a AS b FROM he0),
    hn AS (SELECT count(DISTINCT a) AS n FROM he1),
    h0 AS (SELECT DISTINCT a AS id, 1.0 / n AS s FROM he1 CROSS JOIN hn)"""
    ]
    for i in range(1, iters + 1):
        # normalize with a window sum, NOT a scalar subquery: a second
        # reference to hr{i} would re-evaluate the whole chain (DuckDB may
        # inline CTEs), turning 10 iterations into 2^10 evaluations
        parts.append(f"""hr{i} AS (
      SELECT he1.b AS id, sum(h{i - 1}.s) AS raw
      FROM he1 JOIN h{i - 1} ON h{i - 1}.id = he1.a GROUP BY 1),
    h{i} AS (SELECT id, raw / sum(raw) OVER () AS s FROM hr{i})""")
    body = ",\n    ".join(parts)
    return (
        f"WITH {_NGRAM_PAIR_CTES}, {body}\n"
        f"    SELECT id, round(s, 6) AS hub, round(s, 6) AS authority FROM h{iters}"
    )


@query("hits_similarity_graph", _hits_sql(10))
def hits_similarity_graph(spark, sf_dir):
    """10-iteration HITS hubs/authorities (L1-normalized) over the
    trigram-jaccard similarity graph — the PageRank companion centrality;
    oracle unrolls every iteration."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.graphmetrics import hits

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.2, max_doc_freq=1_000_000_000
    )
    return hits(edges, iterations=10)


@query(
    "k_core_similarity_graph",
    f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES},
    ke AS (SELECT l AS a, r AS b FROM p
           WHERE c * 1.0 / (ln + rn - c) >= 0.2),
    seq AS (
      SELECT 0 AS i,
             (SELECT coalesce(list({{'a': a, 'b': b}}), []) FROM ke) AS es
      UNION ALL
      SELECT i + 1,
             [x FOR x IN es IF list_contains(good, x.a)
                               AND list_contains(good, x.b)]
      FROM (
        SELECT i, es,
               [n FOR n IN list_distinct(flatten([[x.a, x.b] FOR x IN es]))
                IF len([y FOR y IN es IF y.a = n OR y.b = n]) >= 2] AS good
        FROM seq) s
      WHERE len([n FOR n IN list_distinct(flatten([[x.a, x.b] FOR x IN es]))
                 IF len([y FOR y IN es IF y.a = n OR y.b = n]) < 2]) > 0
    ),
    fin AS (SELECT es FROM seq ORDER BY i DESC LIMIT 1),
    surv AS (SELECT unnest(es) AS ed FROM fin)
    SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
      SELECT ed.a AS id FROM surv UNION ALL SELECT ed.b AS id FROM surv)
    GROUP BY 1
    """,
)
def k_core_similarity_graph(spark, sf_dir):
    """2-core of the trigram-jaccard similarity graph (Seidman 1983,
    operators/graphmetrics.py k_core): parallel peeling to the unique
    fixpoint; the oracle replays the peel with list-state recursion."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.graphmetrics import k_core

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.2, max_doc_freq=1_000_000_000
    )
    return k_core(edges, k=2)


@query(
    "bfs_labels_similarity_graph",
    f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES},
    be AS (SELECT l AS a, r AS b FROM p
           WHERE c * 1.0 / (ln + rn - c) >= 0.2),
    bdir AS (SELECT a, b FROM be UNION ALL SELECT b AS a, a AS b FROM be),
    srcs AS (SELECT doc_id AS id FROM documents WHERE doc_id % 97 = 0),
    walk(id, hops, root) AS (
      SELECT id, 0, id FROM srcs
      UNION
      SELECT d.b, w.hops + 1, w.root
      FROM walk w JOIN bdir d ON d.a = w.id
      WHERE w.hops < 10),
    best AS (SELECT id, min(hops) AS hops FROM walk GROUP BY 1)
    SELECT best.id, CAST(best.hops AS INT) AS hops,
           min(w.root) AS root
    FROM best JOIN walk w ON w.id = best.id AND w.hops = best.hops
    GROUP BY 1, 2
    """,
)
def bfs_labels_similarity_graph(spark, sf_dir):
    """Multi-source BFS label spreading over the trigram-jaccard graph
    (operators/graphmetrics.py bfs_distance): every doc within 10 hops of
    a seed (doc_id % 97 == 0) gets min hops + smallest min-distance seed;
    the oracle's recursive UNION dedups states so cycles can't explode."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.graphmetrics import bfs_distance

    docs = _t(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.2, max_doc_freq=1_000_000_000
    )
    sources = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("id")
    )
    return bfs_distance(edges, sources, max_hops=10)


# --- fuzzy duplicate-transaction detection (banded numeric self-join) -------
# Same customer, totals within 1000.00, order dates within 180 days. The
# oracle is the literal theta self-join; the engine runs the band-equi-join
# rewrite (floor(amount/eps) bands, right side replicated into band ± 1),
# so candidates are an equi-join on (custkey, band) — never a theta join.
@query(
    "fuzzy_duplicate_orders",
    """
    SELECT a.o_custkey, a.o_orderkey AS left_id, b.o_orderkey AS right_id,
           round(abs(a.o_totalprice - b.o_totalprice), 2) AS amount_diff,
           CAST(abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                              CAST(b.o_orderdate AS DATE))) AS BIGINT)
             AS day_gap
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND abs(a.o_totalprice - b.o_totalprice) <= 1000.0
     AND abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                       CAST(b.o_orderdate AS DATE))) <= 180
    """,
)
def fuzzy_duplicate_orders(spark, sf_dir):
    from ..operators.matching import banded_duplicate_pairs

    return banded_duplicate_pairs(
        _t(spark, sf_dir, "orders"),
        key="o_custkey",
        id_col="o_orderkey",
        amount_col="o_totalprice",
        time_col="o_orderdate",
        amount_eps=1000.0,
        max_days=180,
    )


# --- weighted Jaccard similarity join (global IDF token weights) -------------
# Third member of the token-similarity family (unweighted ppjoin, tf-idf
# cosine, weighted Jaccard): shared-token idf mass over union idf mass.
# Global per-token weights mean the intersection mass aggregates directly
# on the inverted-index join — one shuffle on token, one on the pair key.
@query(
    "weighted_jaccard_docs",
    """
    WITH t AS (SELECT doc_id,
                      list_distinct([x FOR x IN
                        string_split_regex(lower(trim(coalesce(text, ''))), '\\s+')
                        IF x <> '']) AS toks
               FROM documents),
    n AS (SELECT count(*) AS nn FROM documents),
    e AS (SELECT doc_id, unnest(toks) AS token FROM t),
    d AS (SELECT token, count(*) AS df FROM e GROUP BY token),
    w AS (SELECT e.doc_id, e.token, ln(1.0 + n.nn * 1.0 / d.df) AS idf
          FROM e JOIN d USING (token), n),
    tw AS (SELECT doc_id, sum(idf) AS total FROM w GROUP BY doc_id),
    p AS (SELECT a.doc_id AS l, b.doc_id AS r, sum(a.idf) AS s
          FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT l AS left_id, r AS right_id,
           round(s / (ta.total + tb.total - s), 6) AS weighted_jaccard
    FROM p JOIN tw ta ON ta.doc_id = p.l JOIN tw tb ON tb.doc_id = p.r
    WHERE round(s / (ta.total + tb.total - s), 6) >= 0.9
    """,
)
def weighted_jaccard_docs(spark, sf_dir):
    from ..operators.setjoin import weighted_token_jaccard

    return weighted_token_jaccard(_t(spark, sf_dir, "documents"), threshold=0.9)


# --- degree distribution of the co-purchase graph ----------------------------
# The pre-flight shape diagnostic for every wedge/block operator: the
# histogram is census-sized (distinct degrees), the cumulative fraction
# runs over that census, and a heavy tail here is what max_middle_degree /
# stop-key budgets exist to absorb.
@query(
    "degree_profile_copurchase",
    """
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 10 = 0),
    e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    e1 AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
    deg AS (SELECT a AS id, count(*) AS degree FROM e1 GROUP BY 1),
    hist AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
             FROM deg GROUP BY 1),
    t AS (SELECT sum(n_nodes) AS total FROM hist)
    SELECT degree, n_nodes,
           round(n_nodes * 1.0 / total, 6) AS frac_nodes,
           round(sum(n_nodes) OVER (ORDER BY degree) * 1.0 / total, 6)
             AS cum_frac
    FROM hist CROSS JOIN t
    """,
)
def degree_profile_copurchase(spark, sf_dir):
    """Degree histogram (operators/graphmetrics.py degree_profile)."""
    from ..operators.graphmetrics import degree_profile

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    edges = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("left_id"),
            F.col("b.l_partkey").alias("right_id"),
        )
        .distinct()
    )
    return degree_profile(edges)


# --- link prediction over the part co-purchase graph -------------------------
# Candidate-recall repair / substitute discovery: score NON-adjacent part
# pairs of the co-purchase graph (parts sharing an order; every-10th order
# keeps the audit bounded) by shared-neighbor structure. Wedge join on the
# middle node; the oracle replays the same wedge/census program. (The
# trigram similarity graph is a near-perfect matching on this corpus — no
# open wedges — so the co-purchase graph is the structural test bed.)
@query(
    "link_prediction_copurchase",
    """
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 10 = 0),
    e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    e1 AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
    deg AS (SELECT a AS id, count(*) AS dg FROM e1 GROUP BY 1),
    w AS (SELECT n1.b AS u, n2.b AS v, n1.a AS m
          FROM e1 n1 JOIN e1 n2 ON n1.a = n2.a AND n1.b < n2.b),
    sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
                  sum(1.0 / ln(deg.dg)) AS aa
           FROM w JOIN deg ON deg.id = w.m GROUP BY 1, 2),
    ne AS (SELECT sc.* FROM sc LEFT JOIN e0 ON e0.a = sc.u AND e0.b = sc.v
           WHERE e0.a IS NULL AND sc.cn >= 2)
    SELECT ne.u AS left_id, ne.v AS right_id, ne.cn AS common_neighbors,
           round(ne.aa, 6) AS adamic_adar,
           round(ne.cn * 1.0 / (du.dg + dv.dg - ne.cn), 6) AS nbr_jaccard
    FROM ne JOIN deg du ON du.id = ne.u JOIN deg dv ON dv.id = ne.v
    """,
)
def link_prediction_copurchase(spark, sf_dir):
    """Adamic-Adar / common-neighbor / neighborhood-jaccard link prediction
    (operators/graphmetrics.py link_prediction) over the part co-purchase
    graph — ranks pairs the co-occurrence join missed."""
    from ..operators.graphmetrics import link_prediction

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    edges = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("left_id"),
            F.col("b.l_partkey").alias("right_id"),
        )
        .distinct()
    )
    return link_prediction(edges, min_common=2)


_COPURCHASE_CTES = """
    li AS (SELECT l_orderkey, l_partkey FROM lineitem
           WHERE l_orderkey % 10 = 0),
    e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
"""


# --- modularity of the brand partition over the co-purchase graph ------------
@query(
    "modularity_copurchase_brand",
    f"""
    WITH {_COPURCHASE_CTES},
    lab AS (SELECT p_partkey AS id, p_brand AS lb FROM part),
    t AS (SELECT coalesce(la.lb, CAST(e0.a AS VARCHAR)) AS la_,
                 coalesce(lr.lb, CAST(e0.b AS VARCHAR)) AS lb_
          FROM e0 LEFT JOIN lab la ON la.id = e0.a
                  LEFT JOIN lab lr ON lr.id = e0.b),
    mm AS (SELECT count(*) AS m FROM e0),
    intra AS (SELECT la_ AS c, CAST(count(*) AS BIGINT) AS ec
              FROM t WHERE la_ = lb_ GROUP BY 1),
    ends AS (SELECT la_ AS c FROM t UNION ALL SELECT lb_ AS c FROM t),
    degc AS (SELECT c, CAST(count(*) AS BIGINT) AS dc FROM ends GROUP BY 1),
    pc AS (SELECT degc.c, coalesce(ec, 0) AS ec, dc
           FROM degc LEFT JOIN intra USING (c))
    SELECT CAST(max(mm.m) AS BIGINT) AS n_edges,
           CAST(count(*) AS BIGINT) AS n_communities,
           round(sum(ec * 1.0 / mm.m
                     - (dc / (2.0 * mm.m)) * (dc / (2.0 * mm.m))), 6)
             AS modularity
    FROM pc CROSS JOIN mm
    """,
)
def modularity_copurchase_brand(spark, sf_dir):
    """Modularity of the p_brand partition over the part co-purchase graph
    (operators/graphmetrics.py modularity) — does brand structure explain
    co-purchase structure better than the degree-preserving null model?"""
    from ..operators.graphmetrics import modularity

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    edges = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("left_id"),
            F.col("b.l_partkey").alias("right_id"),
        )
        .distinct()
    )
    labels = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_brand").alias("label")
    )
    return modularity(edges, labels)


# --- degree assortativity of the co-purchase graph ---------------------------
@query(
    "assortativity_copurchase",
    f"""
    WITH {_COPURCHASE_CTES},
    sym AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
    deg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS dg
            FROM sym GROUP BY 1),
    p AS (SELECT du.dg AS x, dv.dg AS y
          FROM sym JOIN deg du ON du.id = sym.a
                   JOIN deg dv ON dv.id = sym.b),
    mrow AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                    CAST(count(*) AS BIGINT) AS n2,
                    sum(x * 1.0) AS sx, sum(y * 1.0) AS sy,
                    sum(x * 1.0 * x) AS sxx, sum(y * 1.0 * y) AS syy,
                    sum(x * 1.0 * y) AS sxy
             FROM p)
    SELECT CAST(n2 / 2 AS BIGINT) AS n_edges,
           CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0 THEN
             round((n * sxy - sx * sy)
                   / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           END AS assortativity
    FROM mrow
    """,
)
def assortativity_copurchase(spark, sf_dir):
    """Degree assortativity of the part co-purchase graph
    (operators/graphmetrics.py assortativity) — hub-to-hub vs
    hub-and-spoke wiring, the one-number topology fingerprint."""
    from ..operators.graphmetrics import assortativity

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    edges = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("left_id"),
            F.col("b.l_partkey").alias("right_id"),
        )
        .distinct()
    )
    return assortativity(edges)
