"""Driver-contract batch: corpus-statistics quality operators (round 3).

Corpus-level boilerplate removal (operators/boilerplate.py) and bigram
LM perplexity scoring (operators/lm.py) — both fully SQL-expressible, so
each carries a complete DuckDB value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..queries import _t, query

# 8-word segments; boilerplate = a segment appearing in >= 2 distinct docs.
_SEG = 8


@query(
    "boilerplate_segment_removal",
    f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\\s+') AS w
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             [array_to_string(w[i:i+{_SEG - 1}], ' ')
              FOR i IN generate_series(1, len(w), {_SEG})] AS segs
      FROM t
    ),
    e AS (
      SELECT doc_id, unnest(segs) AS seg,
             unnest(generate_series(1, len(segs))) AS pos
      FROM s
    ),
    bp AS (SELECT seg FROM e GROUP BY seg HAVING count(DISTINCT doc_id) > 1),
    kept AS (SELECT e.doc_id, e.seg, e.pos FROM e ANTI JOIN bp USING (seg)),
    r AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(len(s.segs) AS INT) AS n_segments,
           CAST(len(s.segs) - coalesce(r.n_kept, 0) AS INT) AS n_removed
    FROM s LEFT JOIN r USING (doc_id)
    """,
)
def boilerplate_segment_removal(spark, sf_dir):
    """Corpus-frequent segment removal (RefinedWeb-style boilerplate)."""
    from ..operators.boilerplate import remove_boilerplate_segments

    d = _t(spark, sf_dir, "documents")
    return remove_boilerplate_segments(d, seg_words=_SEG, max_doc_freq=1)


@query(
    "bigram_lm_perplexity",
    """
    WITH t AS (
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
    d AS (SELECT doc_id, count(*) AS n, -avg(lp) AS h FROM sc GROUP BY 1)
    SELECT t.doc_id,
           CAST(coalesce(d.n, 0) AS INT) AS n_bigrams,
           round(d.h, 4) AS cross_entropy,
           round(pow(2.0, d.h), 4) AS perplexity
    FROM t LEFT JOIN d USING (doc_id)
    """,
)
def bigram_lm_perplexity(spark, sf_dir):
    """Self-fit bigram LM cross-entropy / perplexity (CCNet-style filter)."""
    from ..operators.lm import bigram_lm_cross_entropy

    d = _t(spark, sf_dir, "documents")
    return bigram_lm_cross_entropy(d)


@query(
    "bpe_top_merges",
    """
    WITH w AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      FROM documents
    ),
    wc AS (
      SELECT word, count(*) AS n FROM w WHERE length(word) >= 2 GROUP BY word
    ),
    p AS (
      SELECT unnest([word[i:i+1] FOR i IN generate_series(1, length(word) - 1)]) AS pair,
             n
      FROM wc
    ),
    c AS (SELECT pair, sum(n) AS cnt FROM p GROUP BY pair)
    SELECT pair, CAST(cnt AS BIGINT) AS cnt
    FROM c ORDER BY cnt DESC, pair LIMIT 50
    """,
)
def bpe_top_merges(spark, sf_dir):
    """Top-50 BPE merge candidates: frequency-weighted adjacent character
    pairs inside words (operators/tokenize.py — the distributed counting
    pass of BPE tokenizer training)."""
    from ..operators.tokenize import bpe_pair_counts

    d = _t(spark, sf_dir, "documents")
    return bpe_pair_counts(d, k=50)


# --- blocking-scheme evaluation (Christen 2012 ch. 7) ------------------------
@query(
    "blocking_quality_report",
    """
    WITH e AS (
      SELECT DISTINCT doc_id AS id,
             lang || ':' || CAST(n_chars // 8 AS VARCHAR) AS b
      FROM documents),
    tr AS (SELECT doc_id AS id,
                  sha256(coalesce(substr(text, 1, 40), '')) AS tc
           FROM documents),
    comp AS (
      SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS v
      FROM (SELECT b, count(*) AS n FROM e GROUP BY 1)),
    nrec AS (SELECT count(DISTINCT id) AS n FROM tr),
    tpx AS (
      SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS v
      FROM (SELECT tc, count(*) AS n FROM tr GROUP BY 1)),
    et AS (SELECT e.id, e.b, tr.tc FROM e JOIN tr USING (id)),
    cov AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM (
        SELECT DISTINCT a.id AS i, c.id AS j
        FROM et a JOIN et c ON a.b = c.b AND a.tc = c.tc AND a.id < c.id))
    SELECT CAST(nrec.n AS BIGINT) AS n_records,
           CAST(nrec.n * (nrec.n - 1) // 2 AS BIGINT) AS total_pairs,
           comp.v AS comparisons,
           tpx.v AS truth_pairs,
           cov.v AS covered_true_pairs,
           round(CASE WHEN nrec.n >= 2
                      THEN 1.0 - comp.v / (nrec.n * (nrec.n - 1) // 2)
                      ELSE 0.0 END, 6) AS reduction_ratio,
           round(CASE WHEN tpx.v > 0 THEN cov.v / tpx.v ELSE 0.0 END, 6) AS pair_completeness,
           round(CASE WHEN comp.v > 0 THEN cov.v / comp.v ELSE 0.0 END, 6) AS pair_quality
    FROM nrec, comp, tpx, cov
    """,
)
def blocking_quality_report(spark, sf_dir):
    """Blocking-scheme evaluation over the documents table: a
    (lang, length-band) key judged against exact-content ground truth —
    reduction ratio, pair completeness, pair quality
    (operators/quality.py:blocking_quality)."""
    from ..operators.quality import blocking_quality

    d = _t(spark, sf_dir, "documents")
    blocks = d.select(
        "doc_id",
        F.concat_ws(
            ":", "lang", F.floor(F.col("n_chars") / 8).cast("long").cast("string")
        ).alias("block_key"),
    )
    # ground truth: documents sharing a 40-char prefix (the sf corpora
    # carry no byte-exact dups, but prefix families exist at every scale)
    truth = d.select(
        "doc_id",
        F.sha2(F.coalesce(F.substring("text", 1, 40), F.lit("")), 256).alias("cluster_id"),
    )
    return blocking_quality(blocks, truth)


def _bpe_train_sql(n_merges: int, vocab_limit: int) -> str:
    """Unrolled DuckDB replica of tokenize.bpe_train: one (pairs, best,
    rewrite) CTE block per merge round. The rewrite is the same greedy
    left-to-right fold the engine runs (list_reduce with a string
    accumulator — verified char-for-char equivalent to Spark's aggregate()
    on repeated-symbol runs)."""
    parts = [
        f"""WITH w0 AS (
      SELECT word, n AS freq,
             array_to_string(regexp_extract_all(word, '.'), ' ') AS sym
      FROM (SELECT word, count(*) AS n
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
                  FROM documents)
            GROUP BY word ORDER BY n DESC, word LIMIT {vocab_limit})
    )"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""p{r} AS (
      SELECT a, b, sum(freq) AS cnt FROM (
        SELECT freq,
               unnest(list_slice(t, 1, len(t) - 1)) AS a,
               unnest(list_slice(t, 2, len(t))) AS b
        FROM (SELECT freq, string_split(sym, ' ') AS t FROM w{r - 1}))
      GROUP BY 1, 2),
    b{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    w{r} AS (
      SELECT w.word, w.freq,
             CASE WHEN b.a IS NULL THEN w.sym
                  ELSE list_reduce(string_split(w.sym, ' '), (acc, t) ->
                    CASE WHEN (acc = b.a OR ends_with(acc, ' ' || b.a)) AND t = b.b
                         THEN substring(acc, 1, length(acc) - length(b.a)) || b.a || b.b
                         ELSE acc || ' ' || t END)
             END AS sym
      FROM w{r - 1} w LEFT JOIN b{r} b ON true)""")
    selects = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, a AS lhs, b AS rhs, a || b AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return ",\n    ".join(parts) + f"\n    {selects}"


@query("bpe_train_merges", _bpe_train_sql(n_merges=10, vocab_limit=100_000))
def bpe_train_merges(spark, sf_dir):
    """Full iterative BPE tokenizer training (Sennrich et al. 2016): 10
    merge rounds over the frequency-weighted word census; returns the
    learned merge table (operators/tokenize.py:bpe_train)."""
    from ..operators.tokenize import bpe_train

    d = _t(spark, sf_dir, "documents")
    return bpe_train(d, n_merges=10)


def _register_source_sketches():
    from ..functions.minhash import MinHashConfig
    from .sql_kernels import minhash_signature_ctes

    m = MinHashConfig().num_hashes
    sql = f"""
    WITH {minhash_signature_ctes()},
    __src AS (
      SELECT s.slot, s.value, d.source AS src
      FROM __sig s JOIN documents d USING (doc_id)),
    __sk AS (SELECT src, slot, min(value) AS mn FROM __src GROUP BY 1, 2)
    SELECT a.src AS src_a, b.src AS src_b,
           CAST(sum((a.mn = b.mn)::int) AS BIGINT) AS matching_slots,
           round(sum((a.mn = b.mn)::int) / {m}.0, 6) AS est_jaccard
    FROM __sk a JOIN __sk b ON a.slot = b.slot AND a.src < b.src
    GROUP BY 1, 2
    """

    @query("source_sketch_similarity", sql)
    def source_sketch_similarity(spark, sf_dir):
        """Source-level content overlap by MinHash sketch ALGEBRA: each
        source's sub-corpus collapses to one union sketch (slot-wise min),
        similarity = slot agreement — no document pairing
        (operators/cross_corpus.py:source_sketch_similarity)."""
        from ..operators.cross_corpus import source_sketch_similarity as op

        d = _t(spark, sf_dir, "documents")
        return op(d)


_register_source_sketches()


def _register_source_overlap():
    from .sql_kernels import minhash_edge_ctes

    @query(
        "source_overlap_matrix",
        f"""
    WITH {minhash_edge_ctes(0.7)},
    __lab AS (
      SELECT least(da.source, db.source) AS src_a,
             greatest(da.source, db.source) AS src_b
      FROM __pairs p
      JOIN documents da ON da.doc_id = p.left_id
      JOIN documents db ON db.doc_id = p.right_id
    )
    SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
    FROM __lab GROUP BY 1, 2
    """,
    )
    def source_overlap_matrix(spark, sf_dir):
        """Inter-source near-duplicate counts (operators/dedup.py) — the
        input to source mixing/weighting decisions."""
        from ..operators.dedup import source_overlap_matrix as op

        d = _t(spark, sf_dir, "documents")
        return op(d, min_jaccard=0.7)


_register_source_overlap()


def _register_cross_corpus():
    from .sql_kernels import cross_corpus_pairs_sql

    @query(
        "cross_corpus_neardup",
        cross_corpus_pairs_sql(0.7, "{id} % 10 < 2", "{id} % 10 >= 2"),
    )
    def cross_corpus_neardup(spark, sf_dir):
        """New-snapshot-vs-standing-corpus near-dup pairs: docs with
        doc_id % 10 < 2 play the new crawl, the rest the reference corpus
        (operators/cross_corpus.py)."""
        from pyspark.sql import functions as F

        from ..operators.cross_corpus import cross_corpus_minhash_pairs

        d = _t(spark, sf_dir, "documents")
        return cross_corpus_minhash_pairs(
            d.filter(F.col("doc_id") % 10 < 2),
            d.filter(F.col("doc_id") % 10 >= 2),
            min_jaccard=0.7,
        )


_register_cross_corpus()


@query(
    "encode_documents_ids",
    """
    WITH counts AS (
      SELECT term, count(*) AS n
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS term
            FROM documents)
      GROUP BY term
    ),
    v AS (
      SELECT term,
             CAST(row_number() OVER (ORDER BY n DESC, term) - 1 AS INT) AS tid
      FROM (SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 1000)
    ),
    t AS (
      SELECT doc_id,
             CAST(unnest(generate_series(1, len(toks))) - 1 AS INT) AS pos,
             unnest(toks) AS term
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+', 0) AS toks
            FROM documents)
    )
    SELECT t.doc_id, t.pos, CAST(coalesce(v.tid, 1000) AS INT) AS token_id
    FROM t LEFT JOIN v USING (term)
    """,
)
def encode_documents_ids(spark, sf_dir):
    """Pretokenization to dense id streams against the corpus's own
    top-1000 vocabulary (operators/tokenize.encode_documents)."""
    from ..operators.tokenize import encode_documents

    d = _t(spark, sf_dir, "documents")
    return encode_documents(d, vocab_size=1000)


@query(
    "pack_token_ids_stream",
    """
    WITH counts AS (
      SELECT term, count(*) AS n
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS term
            FROM documents)
      GROUP BY term
    ),
    v AS (
      SELECT term,
             CAST(row_number() OVER (ORDER BY n DESC, term) - 1 AS INT) AS tid
      FROM (SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 1000)
    ),
    t AS (
      SELECT doc_id,
             CAST(unnest(generate_series(1, len(toks))) - 1 AS INT) AS pos,
             unnest(toks) AS term
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+', 0) AS toks
            FROM documents)
    ),
    e AS (
      SELECT t.doc_id, t.pos, CAST(coalesce(v.tid, 1000) AS INT) AS token_id
      FROM t LEFT JOIN v USING (term)
    ),
    n AS (SELECT doc_id, count(*) AS tok FROM e GROUP BY doc_id),
    s AS (
      SELECT d.source, d.doc_id, n.tok,
             sha256('pack' || CAST(d.doc_id AS VARCHAR)) AS hx
      FROM documents d JOIN n USING (doc_id)
    ),
    c AS (
      SELECT source, doc_id,
             sum(tok) OVER (PARTITION BY source ORDER BY hx, doc_id
                            ROWS UNBOUNDED PRECEDING) - tok AS strt
      FROM s
    )
    SELECT c.source, e.doc_id,
           CAST((c.strt + e.pos) // 512 AS BIGINT) AS seq_id,
           CAST((c.strt + e.pos) % 512 AS BIGINT) AS seq_pos,
           e.token_id
    FROM e JOIN c USING (doc_id)
    """,
)
def pack_token_ids_stream(spark, sf_dir):
    """The fully materialized training stream: encode to ids, lay docs
    end-to-end per source, place every token into its fixed-length
    sequence (operators/tokenize.pack_token_ids, seq_len 512)."""
    from ..operators.tokenize import pack_token_ids

    d = _t(spark, sf_dir, "documents")
    return pack_token_ids(d, seq_len=512, vocab_size=1000)


@query(
    "bcubed_nmi_ari_metrics",
    """
    WITH j AS (SELECT doc_id, source AS pc, lang AS tc FROM documents),
    cont AS (SELECT pc, tc, count(*) AS n FROM j GROUP BY 1, 2),
    rows_ AS (SELECT pc, sum(n) AS a FROM cont GROUP BY 1),
    cols_ AS (SELECT tc, sum(n) AS b FROM cont GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_items FROM cont),
    cell AS (
      SELECT sum(n * n * 1.0 / a) AS bp_num,
             sum(n * n * 1.0 / b) AS br_num,
             CAST(COALESCE(sum(n * (n - 1) // 2), 0) AS BIGINT) AS s_cells,
             sum(n * ln(n * 1.0 / (a * b))) AS mi_raw
      FROM cont JOIN rows_ USING (pc) JOIN cols_ USING (tc)),
    hp AS (SELECT sum(a * ln(a)) AS hp_raw,
                  CAST(COALESCE(sum(a * (a - 1) // 2), 0) AS BIGINT) AS s_pred
           FROM rows_),
    ht AS (SELECT sum(b * ln(b)) AS ht_raw,
                  CAST(COALESCE(sum(b * (b - 1) // 2), 0) AS BIGINT) AS s_truth
           FROM cols_),
    m AS (
      SELECT n_items,
             bp_num / n_items AS bp, br_num / n_items AS br,
             ln(n_items) - hp_raw / n_items AS h_pred,
             ln(n_items) - ht_raw / n_items AS h_truth,
             ln(n_items) + mi_raw / n_items AS mi,
             s_cells, s_pred, s_truth,
             n_items * (n_items - 1) // 2 AS total_pairs
      FROM tot, cell, hp, ht)
    SELECT n_items,
           round(bp, 6) AS bcubed_precision,
           round(br, 6) AS bcubed_recall,
           round(CASE WHEN bp + br > 0 THEN 2 * bp * br / (bp + br)
                      ELSE 0 END, 6) AS bcubed_f1,
           round(CASE WHEN h_pred > 0 AND h_truth > 0
                      THEN mi / sqrt(h_pred * h_truth) ELSE 0 END, 6) AS nmi,
           round(CASE WHEN total_pairs > 0
                          AND (s_pred + s_truth) / 2.0
                              <> s_pred * 1.0 * s_truth / total_pairs
                      THEN (s_cells - s_pred * 1.0 * s_truth / total_pairs)
                           / ((s_pred + s_truth) / 2.0
                              - s_pred * 1.0 * s_truth / total_pairs)
                      ELSE 1.0 END, 6) AS ari
    FROM m
    """,
)
def bcubed_nmi_ari_metrics(spark, sf_dir):
    """B-cubed P/R/F1 + NMI + ARI between the source and lang labelings of
    the documents table (operators/quality.py extended_cluster_metrics) —
    the Bagga-Baldwin / information-theoretic agreement family the pairwise
    metric can't express; all from one contingency table, no pairs."""
    from ..operators.quality import extended_cluster_metrics

    d = _t(spark, sf_dir, "documents")
    pred = d.select("doc_id", F.col("source").alias("cluster_id"))
    truth = d.select("doc_id", F.col("lang").alias("cluster_id"))
    return extended_cluster_metrics(pred, truth, id_col="doc_id")


@query(
    "k_anonymity_customer",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS group_size,
             count(DISTINCT floor(c_acctbal / 1000))
               + max(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
               AS n_sensitive
      FROM customer GROUP BY 1, 2)
    SELECT c_nationkey, c_mktsegment, group_size,
           CAST(n_sensitive AS BIGINT) AS n_sensitive,
           group_size >= 10 AS k_anonymous,
           n_sensitive >= 3 AS l_diverse
    FROM g
    """,
)
def k_anonymity_customer(spark, sf_dir):
    """k-anonymity + distinct-l-diversity audit (operators/privacy.py) over
    (nation, market segment) quasi-identifiers with the account-balance
    thousand-bucket as the sensitive attribute — one hash aggregate."""
    from ..operators.privacy import k_anonymity_report

    c = _t(spark, sf_dir, "customer").withColumn(
        "balance_bucket", F.floor(F.col("c_acctbal") / 1000)
    )
    return k_anonymity_report(
        c,
        ["c_nationkey", "c_mktsegment"],
        k=10,
        sensitive_col="balance_bucket",
        l=3,
    )


@query(
    "k_anonymity_summary_customer",
    """
    WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
               FROM customer GROUP BY 1, 2)
    SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_records,
           count(*) AS n_groups,
           CAST(COALESCE(sum(CASE WHEN n < 25 THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_violating_groups,
           CAST(COALESCE(sum(CASE WHEN n < 25 THEN n ELSE 0 END), 0) AS BIGINT)
             AS records_at_risk,
           min(n) AS min_group_size,
           round(CASE WHEN COALESCE(sum(n), 0) > 0
                      THEN COALESCE(sum(CASE WHEN n < 25 THEN n ELSE 0 END), 0)
                           * 1.0 / sum(n)
                      ELSE 0.0 END, 6) AS risk_fraction
    FROM g
    """,
)
def k_anonymity_summary_customer(spark, sf_dir):
    """Corpus-level k-anonymity release gate at k=25 over the same
    quasi-identifiers: records in sub-k groups and the at-risk fraction."""
    from ..operators.privacy import k_anonymity_summary

    return k_anonymity_summary(
        _t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=25
    )


@query(
    "iqr_outlier_orders",
    """
    WITH f AS (SELECT o_orderstatus,
                      quantile_cont(o_totalprice, 0.25) AS q1,
                      quantile_cont(o_totalprice, 0.75) AS q3
               FROM orders GROUP BY 1)
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           round(q1, 6) AS q25, round(q3, 6) AS q75,
           round(q1 - 0.5 * (q3 - q1), 6) AS lo_fence,
           round(q3 + 0.5 * (q3 - q1), 6) AS hi_fence
    FROM orders JOIN f USING (o_orderstatus)
    WHERE o_totalprice < q1 - 0.5 * (q3 - q1)
       OR o_totalprice > q3 + 0.5 * (q3 - q1)
    """,
)
def iqr_outlier_orders(spark, sf_dir):
    """Tukey-fence outliers (operators/stats.py iqr_outliers) on order
    totals within each order status at k=0.5 — exact per-group quantiles,
    fences broadcast back, only the flagged rows returned."""
    from ..operators.stats import iqr_outliers

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = iqr_outliers(o, "o_totalprice", ["o_orderstatus"], k=0.5)
    return out.where("is_outlier").select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        "q25", "q75", "lo_fence", "hi_fence",
    )


@query(
    "expectations_orders_report",
    """
    SELECT 'orderkey unique' AS rule_name, 'o_orderkey' AS column, 'unique' AS kind,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
           count(*) = count(DISTINCT o_orderkey) AS passed
    FROM orders
    UNION ALL
    SELECT 'custkey filled', 'o_custkey', 'not_null', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'status domain', 'o_orderstatus', 'in_set', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('O', 'F', 'P')
                    THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'price non-negative', 'o_totalprice', 'range', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0
                         THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0
                    THEN 1 ELSE 0 END) = 0
    FROM orders
    """,
)
def expectations_orders_report(spark, sf_dir):
    """Great-Expectations-style constraint report over the orders table
    (operators/expectations.py): uniqueness, null, domain, and range
    rules — each one aggregate, the report a union of rule-sized rows.

    Note: `unique` here counts count(*) - count(DISTINCT) which matches the
    engine's census arithmetic whenever the column has no NULLs (o_orderkey
    doesn't; the NULL-group case is pinned in test_expectations.py)."""
    from ..operators.expectations import check_expectations

    o = _t(spark, sf_dir, "orders")
    return check_expectations(
        o,
        [
            {"name": "orderkey unique", "kind": "unique", "column": "o_orderkey"},
            {"name": "custkey filled", "kind": "not_null", "column": "o_custkey"},
            {
                "name": "status domain",
                "kind": "in_set",
                "column": "o_orderstatus",
                "values": ["O", "F", "P"],
            },
            {
                "name": "price non-negative",
                "kind": "range",
                "column": "o_totalprice",
                "lo": 0,
            },
        ],
    )


# --- LIX readability per language --------------------------------------------
# Pure-Column signals (functions/text.py readability_cols): word census,
# [.!?]-run sentence count, long-word ratio; per-doc lix rounded to 4
# before the group average so both engines average identical doubles.
@query(
    "readability_lang_report",
    """
    WITH d AS (
      SELECT lang,
             [x FOR x IN string_split_regex(trim(coalesce(text, '')), '\\s+')
              IF x <> ''] AS toks,
             trim(coalesce(text, '')) AS t
      FROM documents),
    m AS (
      SELECT lang,
             len(toks) AS n_words,
             len([x FOR x IN toks IF len(x) > 6]) AS n_long,
             greatest(len(regexp_extract_all(t, '[.!?]+')), 1) AS n_sent
      FROM d),
    r AS (
      SELECT lang, n_words, n_long, n_sent,
             round(n_words / n_sent + 100.0 * n_long / n_words, 4) AS lix
      FROM m WHERE n_words > 0)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_words), 6) AS avg_words,
           round(avg(n_sent), 6) AS avg_sentences,
           round(sum(n_long) * 1.0 / sum(n_words), 6) AS long_word_ratio,
           round(avg(lix), 6) AS avg_lix
    FROM r GROUP BY lang
    """,
)
def readability_lang_report(spark, sf_dir):
    from ..functions.text import readability_cols

    d = _t(spark, sf_dir, "documents")
    c = readability_cols(F.col("text"))
    per_doc = d.select(
        "lang",
        c["n_words"].alias("n_words"),
        c["n_long_words"].alias("n_long"),
        c["n_sentences"].alias("n_sent"),
        c["lix"].alias("lix"),
    ).where(F.col("n_words") > 0)
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_words"), 6).alias("avg_words"),
        F.round(F.avg("n_sent"), 6).alias("avg_sentences"),
        F.round(F.sum("n_long") / F.sum("n_words").cast("double"), 6).alias(
            "long_word_ratio"
        ),
        F.round(F.avg("lix"), 6).alias("avg_lix"),
    )


# --- inter-arrival-time quantiles per event type -----------------------------
# Gaps are exact integer microseconds divided once by 1e6 — bit-identical
# doubles on both engines; quantiles are exact interpolated percentiles.
@query(
    "interarrival_quantiles_events",
    """
    WITH s AS (
      SELECT event_type, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS pus
      FROM events),
    g AS (SELECT event_type, (us - pus) / 1e6 AS gap
          FROM s WHERE pus IS NOT NULL)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
           round(avg(gap), 6) AS avg_gap_s,
           round(quantile_cont(gap, 0.25), 6) AS p25_s,
           round(quantile_cont(gap, 0.50), 6) AS p50_s,
           round(quantile_cont(gap, 0.75), 6) AS p75_s,
           round(quantile_cont(gap, 0.95), 6) AS p95_s
    FROM g GROUP BY event_type
    """,
)
def interarrival_quantiles_events(spark, sf_dir):
    from ..operators.timeseries import interarrival_stats

    return interarrival_stats(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_id",
        by=["event_type"],
    )


# --- quality-threshold sweep -------------------------------------------------
# One corpus scan, |grid| conditional aggregates, unpivoted to rows. The
# oracle reuses sql_kernels.quality_expr — the bit-equal DuckDB replica of
# quality_score_col — so the kept sets agree doc-for-doc.
def _sweep_sql() -> str:
    from .sql_kernels import quality_expr

    tok = ("(CASE WHEN trim(coalesce(text, '')) = '' THEN 0"
           " ELSE length(string_split_regex(trim(coalesce(text, '')), '\\s+'))"
           " END)")
    cells = []
    for t in (0.3, 0.5, 0.7, 0.9):
        cells.append(f"""
    SELECT {t} AS threshold,
           CAST(COALESCE(sum(CASE WHEN q >= {t} THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS kept_docs,
           round(COALESCE(sum(CASE WHEN q >= {t} THEN 1 ELSE 0 END), 0)
                 * 1.0 / greatest(count(*), 1), 6) AS kept_fraction,
           CAST(COALESCE(sum(CASE WHEN q >= {t} THEN tok ELSE 0 END), 0)
                AS BIGINT) AS kept_tokens,
           round(COALESCE(sum(CASE WHEN q >= {t} THEN tok ELSE 0 END), 0)
                 * 1.0 / greatest(sum(tok), 1), 6) AS token_fraction
    FROM b""")
    return (
        f"WITH b AS (SELECT {quality_expr('text')} AS q, {tok} AS tok"
        " FROM documents)" + " UNION ALL ".join(cells)
    )


@query("quality_threshold_sweep", _sweep_sql())
def quality_threshold_sweep(spark, sf_dir):
    from ..operators.curation import threshold_sweep

    return threshold_sweep(
        _t(spark, sf_dir, "documents"), thresholds=[0.3, 0.5, 0.7, 0.9]
    )
