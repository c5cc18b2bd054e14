"""Driver-contract batch 2: text-analysis + window + set ops (SURVEY.md §2.5,
§2.7, §2.8 + training-data text operators)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..queries import _t, query


# --- quality scoring (length/alpha/word-shape), JVM-side expression --------
@query(
    "text_quality_score",
    """
    SELECT doc_id,
           round(0.4 * least(length(text) / 500.0, 1.0)
                 + 0.4 * (CASE WHEN length(text) > 0
                          THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text)
                          ELSE 0.0 END)
                 + 0.2 * (CASE WHEN (CASE WHEN trim(text) = '' THEN 0
                                     ELSE length(string_split_regex(trim(text), '\\s+')) END) > 0
                           AND CAST(length(text) AS DOUBLE)
                               / (CASE WHEN trim(text) = '' THEN 1
                                  ELSE length(string_split_regex(trim(text), '\\s+')) END)
                               BETWEEN 3 AND 12
                          THEN 1.0 ELSE 0.5 END),
                 4) AS quality
    FROM documents
    """,
)
def text_quality_score(spark, sf_dir):
    from ..functions.text import quality_score_col

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score_col(F.col("text")).alias("quality"))


# --- BPE-ish token counting ------------------------------------------------
@query(
    "token_count_bpe",
    """
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_bpe(spark, sf_dir):
    from ..functions.text import bpe_token_count_col

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", bpe_token_count_col(F.col("text")).cast("long").alias("n_bpe_tokens"))


# --- language-ID heuristic -------------------------------------------------
# The argmax-over-marker-sets IS SQL-expressible: distinct word list,
# per-language marker intersections, first-in-sorted-order argmax (exactly
# functions/text.py:detect_language's strict-greater iteration over the
# sorted language codes). Upgraded from rows-only to oracle-checked.
@query(
    "lang_id_heuristic",
    """
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS w
      FROM documents),
    s AS (
      SELECT lang,
        len(list_intersect(w, ['der','die','das','und','ist','nicht','ein','mit','sich','auf'])) AS de,
        len(list_intersect(w, ['the','and','of','to','in','is','that','for','with','was'])) AS en,
        len(list_intersect(w, ['el','la','los','de','que','y','en','un','es','por'])) AS es,
        len(list_intersect(w, ['le','la','les','et','est','pas','une','des','que','pour'])) AS fr
      FROM t),
    d AS (
      SELECT lang, CASE
        WHEN greatest(de, en, es, fr) = 0 THEN 'unknown'
        WHEN de >= en AND de >= es AND de >= fr THEN 'de'
        WHEN en >= es AND en >= fr THEN 'en'
        WHEN es >= fr THEN 'es'
        ELSE 'fr' END AS detected
      FROM s)
    SELECT lang, detected, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1, 2
    """,
)
def lang_id_heuristic(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    from ..session import ensure_py_files

    ensure_py_files(spark)

    @pandas_udf(T.StringType())
    def lang_udf(texts: pd.Series) -> pd.Series:
        from ..functions.text import batch_detect_language

        return batch_detect_language(texts)

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang", lang_udf(F.col("text")).alias("detected"))
        .groupBy("lang", "detected")
        .agg(F.count("*").alias("n"))
    )


# --- W: per-group top-k via window (SURVEY.md §2.5) ------------------------
@query(
    "w1_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def w1_topk_per_group(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# --- W2: running (cumulative) aggregate ------------------------------------
@query(
    "w2_running_sum",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
    FROM lineitem WHERE l_suppkey <= 3
    """,
)
def w2_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= 3)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
        )
    )


# --- U2: set except (SURVEY.md §2.7) ---------------------------------------
# customer keys minus event-active keys — verified NON-empty at sf0.01
# (1350 rows; round-1 verdict: nationkey-vs-nationkey was vacuously 0)
@query(
    "u2_set_except",
    """
    SELECT k FROM (SELECT DISTINCT c_custkey AS k FROM customer)
    EXCEPT
    SELECT k FROM (SELECT DISTINCT user_id AS k FROM events)
    """,
)
def u2_set_except(spark, sf_dir):
    a = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k")).distinct()
    b = _t(spark, sf_dir, "events").select(F.col("user_id").alias("k")).distinct()
    return a.exceptAll(b).distinct()


# --- U3: distinct projection (ordered dedup analog) ------------------------
@query(
    "u3_distinct_pairs",
    "SELECT DISTINCT lang, source FROM documents",
)
def u3_distinct_pairs(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select("lang", "source").distinct()


# --- A8: semantic keyword bucketing (entity_assignment.py:180-222 analog) --
@query(
    "a8_semantic_buckets",
    """
    SELECT CASE
             WHEN contains(lower(p_type), 'brushed') THEN 'brushed'
             WHEN contains(lower(p_type), 'polished') THEN 'polished'
             WHEN contains(lower(p_type), 'plated') THEN 'plated'
             WHEN contains(lower(p_type), 'anodized') THEN 'anodized'
             WHEN contains(lower(p_type), 'burnished') THEN 'burnished'
             ELSE 'other'
           END AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM part GROUP BY 1
    """,
)
def a8_semantic_buckets(spark, sf_dir):
    t = F.lower(F.col("p_type"))
    bucket = (
        F.when(t.contains("brushed"), "brushed")
        .when(t.contains("polished"), "polished")
        .when(t.contains("plated"), "plated")
        .when(t.contains("anodized"), "anodized")
        .when(t.contains("burnished"), "burnished")
        .otherwise("other")
    )
    return (
        _t(spark, sf_dir, "part")
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


# --- F10/F11: parse probes (enhanced-dtype lattice inputs) -----------------
@query(
    "f10_parse_probes",
    """
    SELECT CAST(sum(CASE WHEN TRY_CAST(props AS DOUBLE) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS non_numeric_props,
           CAST(sum(CASE WHEN TRY_CAST(event_type AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS numeric_event_types
    FROM events
    """,
)
def f10_parse_probes(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.sum(F.col("props").try_cast("double").isNull().cast("long")).alias("non_numeric_props"),
        F.sum(F.col("event_type").try_cast("double").isNotNull().cast("long")).alias(
            "numeric_event_types"
        ),
    )


# --- P2: null-drop projection ----------------------------------------------
@query(
    "p2_null_drop",
    "SELECT CAST(count(*) AS BIGINT) AS n_nonnull FROM events WHERE value IS NOT NULL",
)
def p2_null_drop(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .na.drop(subset=["value"])
        .agg(F.count("*").alias("n_nonnull"))
    )


# --- O5: longest-element pick with deterministic tiebreak ------------------
@query(
    "o5_longest_per_lang",
    """
    SELECT lang, source AS longest_source FROM (
      SELECT lang, source,
             row_number() OVER (PARTITION BY lang
                                ORDER BY length(source) DESC, source) AS rn
      FROM (SELECT DISTINCT lang, source FROM documents)) WHERE rn = 1
    """,
)
def o5_longest_per_lang(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("lang", "source").distinct()
    w = Window.partitionBy("lang").orderBy(F.desc(F.length("source")), F.asc("source"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("source").alias("longest_source"))
    )


# --- Gopher-style repetition stats (functions/text.py) ---------------------
# Rae et al. 2021 repetition filters as pure column expressions; the SQL
# oracle replicates every count with list comprehensions.
@query(
    "doc_repetition_stats",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    c AS (
      SELECT doc_id, w, len(w) AS n, len(list_distinct(w)) AS nd,
             [array_to_string(w[i:i+1], ' ') FOR i IN range(1, greatest(len(w) - 1, 0) + 1)] AS bg,
             list_sum([length(x) FOR x IN w]) AS total_len
      FROM t
    ),
    s AS (
      SELECT doc_id, n,
        round(CASE WHEN n > 0 THEN (n - nd) * 1.0 / n ELSE 0.0 END, 6) AS frac_dup_words,
        round(CASE WHEN n > 0 THEN
          list_max([len(list_filter(w, x -> x = ww)) FOR ww IN w]) * 1.0 / n
          ELSE 0.0 END, 6) AS top_word_share,
        round(CASE WHEN n >= 2 THEN
          list_max([len(list_filter(bg, x -> x = bb)) FOR bb IN bg]) * 1.0 / (n - 1)
          ELSE 0.0 END, 6) AS top_bigram_share,
        round(CASE WHEN len(bg) > 0 THEN
          (len(bg) - len(list_distinct(bg))) * 1.0 / len(bg)
          ELSE 0.0 END, 6) AS frac_dup_bigrams,
        round(CASE WHEN n > 0 THEN total_len * 1.0 / n ELSE 0.0 END, 6) AS mean_word_len
      FROM c
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_words, frac_dup_words, top_word_share,
           top_bigram_share, frac_dup_bigrams, mean_word_len,
           (frac_dup_words <= 0.85 AND frac_dup_bigrams <= 0.18
            AND mean_word_len >= 2 AND mean_word_len <= 12) AS passes_repetition_filter
    FROM s
    """,
)
def doc_repetition_stats(spark, sf_dir):
    from ..functions.text import repetition_stats_cols

    d = _t(spark, sf_dir, "documents")
    cols = repetition_stats_cols(F.col("text"))
    return d.select("doc_id", *[c.alias(k) for k, c in cols.items()])


# Within-document duplicate-line removal: keep a line iff it is shorter
# than 30 chars (document structure) or it is its first occurrence. The
# oracle replicates the first-occurrence check with list_position.
@query(
    "doc_line_dedup",
    """
    WITH t AS (
      SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM documents
    ),
    k AS (
      SELECT doc_id, text, lines,
             [lines[i] FOR i IN range(1, len(lines) + 1)
              IF length(lines[i]) < 30 OR list_position(lines, lines[i]) = i] AS kept
      FROM t
    )
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL
                ELSE array_to_string(kept, chr(10)) END AS clean_text,
           CAST(CASE WHEN text IS NULL THEN 0 ELSE len(lines) END AS INT) AS n_lines,
           CAST(CASE WHEN text IS NULL THEN 0
                ELSE len(lines) - len(kept) END AS INT) AS n_removed
    FROM k
    """,
)
def doc_line_dedup(spark, sf_dir):
    from ..functions.text import line_dedup_cols

    d = _t(spark, sf_dir, "documents")
    cols = line_dedup_cols(F.col("text"))
    return d.select("doc_id", *[c.alias(k) for k, c in cols.items()])


# C4 page cleaning (Raffel et al. 2020 §2.2): line retention + page drop
# rules, replicated with list comprehensions and the same precedence.
@query(
    "c4_page_filter",
    """
    WITH t AS (SELECT doc_id, coalesce(text, '') AS s FROM documents),
    l AS (
      SELECT doc_id, s,
             [x FOR x IN string_split(s, chr(10))
              IF right(trim(x), 1) IN ('.', '!', '?', '"')
                 AND len(string_split_regex(trim(x), '\\s+')) >= 5
                 AND NOT contains(lower(x), 'javascript')] AS kl
      FROM t
    ),
    sel AS (
      SELECT doc_id, kl, len(kl) AS nk,
             CASE WHEN contains(lower(s), 'lorem ipsum') THEN 'lorem_ipsum'
                  WHEN contains(lower(s), '{') THEN 'brace'
                  WHEN len(kl) < 3 THEN 'too_few_sentences' END AS reason
      FROM l
    )
    SELECT doc_id,
           CASE WHEN reason IS NULL THEN array_to_string(kl, chr(10)) END AS clean_text,
           CAST(nk AS INT) AS n_lines_kept,
           CAST(reason IS NULL AS INT) AS kept,
           reason AS drop_reason
    FROM sel
    """,
)
def c4_page_filter(spark, sf_dir):
    from ..functions.text import c4_filter_cols

    d = _t(spark, sf_dir, "documents")
    cols = c4_filter_cols(F.col("text"))
    return d.select("doc_id", *[c.alias(k) for k, c in cols.items()])


# --- PII redaction (functions/text.py) -------------------------------------
# Email spans -> <EMAIL>, digits -> '#'; patterns restricted to syntax with
# identical Java-regex/RE2 semantics so the oracle is byte-for-byte.
@query(
    "redact_customer_pii",
    """
    SELECT c_custkey,
           regexp_replace(regexp_replace(c_name,
             '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+', '<EMAIL>', 'g'), '[0-9]', '#', 'g')
             AS name_redacted
    FROM customer
    """,
)
def redact_customer_pii(spark, sf_dir):
    from ..functions.text import redact_pii_col

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        redact_pii_col(F.col("c_name")).alias("name_redacted"),
    )


# --- F-family: Jaro-Winkler + Levenshtein oracle row -----------------------
# The engine's JW kernel (functions/similarity.py, the scoring blend's
# basename term) agrees exactly with DuckDB's jaro_winkler_similarity
# (standard conventions: boost 0.7, prefix cap 4, scale 0.1); Levenshtein
# is Spark's builtin vs DuckDB's (both unit-cost).
@query(
    "f_jw_levenshtein",
    """
    SELECT a.c_custkey AS k,
           round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev
    FROM customer a JOIN customer b ON a.c_custkey + 1 = b.c_custkey
    """,
)
def f_jw_levenshtein(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    from ..session import ensure_py_files

    ensure_py_files(spark)

    @pandas_udf(T.DoubleType())
    def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        from ..functions.similarity import batch_jaro_winkler

        return pd.Series(batch_jaro_winkler(a, b))

    c = _t(spark, sf_dir, "customer")
    a = c.select(F.col("c_custkey").alias("k"), F.col("c_name").alias("na"))
    b = c.select((F.col("c_custkey") - 1).alias("k"), F.col("c_name").alias("nb"))
    return a.join(b, "k").select(
        "k",
        F.round(jw_udf(F.col("na"), F.col("nb")), 6).alias("jw"),
        F.levenshtein("na", "nb").alias("lev"),
    )


# --- corpus TF-IDF top terms (two-pass global statistics) ------------------
@query(
    "tfidf_top_terms",
    """
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    tf AS (
      SELECT doc_id AS id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents) GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT t.id, t.term,
             round(t.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0), 6) AS tfidf
      FROM tf t JOIN df d USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term) AS rn
      FROM scored)
    SELECT id AS doc_id, term, tfidf FROM ranked WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 salient terms per doc by smoothed TF-IDF — two-pass corpus
    statistics entirely in JVM expressions (operators/terms.py)."""
    from ..operators.terms import tfidf_top_terms as op

    d = _t(spark, sf_dir, "documents")
    return op(d, k=3)


# --- Gopher / MassiveWeb quality rules (Rae et al. 2021 A1.1) ---------------
@query(
    "gopher_quality_flags",
    r"""
    WITH base AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                    x -> x <> '') AS words,
        list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                                   x -> trim(x)),
                    x -> x <> '') AS lines
      FROM documents),
    stats AS (
      SELECT doc_id, text,
        len(words) AS n,
        coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS sum_len,
        (length(coalesce(text,'')) - length(replace(coalesce(text,''), '#', ''))) / 1.0
          + (length(coalesce(text,'')) - length(replace(coalesce(text,''), '...', ''))) / 3.0
          + (length(coalesce(text,'')) - length(replace(coalesce(text,''), '…', ''))) / 1.0
          AS n_symbols,
        len(lines) AS n_lines,
        len(list_filter(lines, x -> substring(x, 1, 1) IN ('•','‣','▪','-','*'))) AS bullet,
        len(list_filter(lines, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS ellipsis,
        len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS alpha_words,
        (list_contains(list_transform(words, w -> lower(w)), 'the')::int
         + list_contains(list_transform(words, w -> lower(w)), 'be')::int
         + list_contains(list_transform(words, w -> lower(w)), 'to')::int
         + list_contains(list_transform(words, w -> lower(w)), 'of')::int
         + list_contains(list_transform(words, w -> lower(w)), 'and')::int
         + list_contains(list_transform(words, w -> lower(w)), 'that')::int
         + list_contains(list_transform(words, w -> lower(w)), 'have')::int
         + list_contains(list_transform(words, w -> lower(w)), 'with')::int) AS n_stop
      FROM base),
    rounded AS (
      SELECT doc_id, text, n, n_stop,
        round(CASE WHEN n > 0 THEN sum_len / n ELSE 0.0 END, 6) AS mean_word_len,
        round(CASE WHEN n > 0 THEN n_symbols / n ELSE 0.0 END, 6) AS symbol_word_ratio,
        round(CASE WHEN n_lines > 0 THEN bullet / (n_lines * 1.0) ELSE 0.0 END, 6) AS frac_bullet_lines,
        round(CASE WHEN n_lines > 0 THEN ellipsis / (n_lines * 1.0) ELSE 0.0 END, 6) AS frac_ellipsis_lines,
        round(CASE WHEN n > 0 THEN alpha_words / (n * 1.0) ELSE 0.0 END, 6) AS frac_alpha_words
      FROM stats)
    SELECT doc_id,
      CASE WHEN text IS NULL THEN NULL ELSE CAST(n AS BIGINT) END AS n_words,
      CASE WHEN text IS NULL THEN NULL ELSE mean_word_len END AS mean_word_len,
      CASE WHEN text IS NULL THEN NULL ELSE symbol_word_ratio END AS symbol_word_ratio,
      CASE WHEN text IS NULL THEN NULL ELSE frac_bullet_lines END AS frac_bullet_lines,
      CASE WHEN text IS NULL THEN NULL ELSE frac_ellipsis_lines END AS frac_ellipsis_lines,
      CASE WHEN text IS NULL THEN NULL ELSE frac_alpha_words END AS frac_alpha_words,
      CASE WHEN text IS NULL THEN NULL ELSE CAST(n_stop AS INT) END AS n_stop_words,
      CASE WHEN text IS NULL THEN 0 ELSE
        (n >= 50 AND n <= 100000
         AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         AND symbol_word_ratio <= 0.1
         AND frac_bullet_lines <= 0.9
         AND frac_ellipsis_lines <= 0.3
         AND frac_alpha_words >= 0.8
         AND n_stop >= 2)::int END AS passes_gopher
    FROM rounded
    """,
)
def gopher_quality_flags(spark, sf_dir):
    """The seven Gopher/MassiveWeb document-quality rules as one JVM
    projection (functions/text.py:gopher_rules_cols)."""
    from ..functions.text import gopher_rules_cols

    d = _t(spark, sf_dir, "documents")
    cols = gopher_rules_cols(F.col("text"))
    return d.select("doc_id", *[c.alias(k) for k, c in cols.items()])


# --- BM25 retrieval (query -> top-k documents) ------------------------------
_BM25_QUERIES = [
    ("q1", "slow customer join"),
    ("q2", "window merge sort"),
    ("q3", "spark stream batch vector"),
]
_BM25_VALUES = ", ".join(f"('{q}', '{t}')" for q, t in _BM25_QUERIES)


@query(
    "bm25_search_topk",
    f"""
    WITH q(query_id, qtext) AS (VALUES {_BM25_VALUES}),
    qt AS (
      SELECT DISTINCT query_id, unnest(regexp_extract_all(lower(qtext), '[a-z]+')) AS term
      FROM q),
    tf AS (
      SELECT doc_id AS id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents) GROUP BY 1, 2),
    dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY 1),
    consts AS (
      SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT avg(dl) FROM dl) AS avgdl),
    dfq AS (
      SELECT term, count(*) AS df FROM tf
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
    contrib AS (
      SELECT qt.query_id, m.id,
             CAST(round(
               ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
               * m.tf * (1.2 + 1.0)
               / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl))
               * 1e6) AS BIGINT) AS micro
      FROM tf m
      JOIN qt ON m.term = qt.term
      JOIN dfq d ON m.term = d.term
      JOIN dl l ON m.id = l.id
      CROSS JOIN consts c),
    scored AS (
      SELECT query_id, id, round(sum(micro) / 1e6, 6) AS score
      FROM contrib GROUP BY 1, 2),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
      FROM scored)
    SELECT query_id, id AS doc_id, score, rank FROM ranked WHERE rank <= 10
    """,
)
def bm25_search_topk(spark, sf_dir):
    """BM25 retrieval (Lucene idf variant): top-10 documents for three fixed
    query strings, per-term contributions quantized to integer micro-units
    so the score is partition-order-independent (operators/terms.py)."""
    from ..operators.terms import bm25_topk

    d = _t(spark, sf_dir, "documents")
    return bm25_topk(d, _BM25_QUERIES, k=10)


# Multimodal feature extraction (operators/multimodal.py): documents stand
# in as opaque media payloads (UTF-8 bytes), kind cycles by doc_id. The
# deterministic fake decoder derives each 16-dim vector from the payload's
# sha256 digest (little-endian uint32 words / 2^32 as float32), which an
# ANSI-SQL oracle replicates hex-digit-for-hex-digit — so the ENTIRE
# mapInPandas plumbing (Arrow batching, schema, byte handling) is
# value-hash-checked even though the real codec is a declared stub.
@query(
    "multimodal_fake_features",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             sha256(text) AS sha,
             octet_length(CAST(text AS BLOB)) AS nb
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT media_id, kind, sha AS payload_sha256,
           CAST(nb AS BIGINT) AS n_bytes,
           CAST(p AS INT) AS pos,
           CAST((
              ('0x' || substr(sha, ((4*p)     % 32)*2 + 1, 2))::BIGINT
            + ('0x' || substr(sha, ((4*p + 1) % 32)*2 + 1, 2))::BIGINT * 256
            + ('0x' || substr(sha, ((4*p + 2) % 32)*2 + 1, 2))::BIGINT * 65536
            + ('0x' || substr(sha, ((4*p + 3) % 32)*2 + 1, 2))::BIGINT * 16777216
           )::DOUBLE / 4294967296.0 AS FLOAT) AS val
    FROM m, range(0, 16) r(p)
    """,
)
def multimodal_fake_features(spark, sf_dir):
    """Arrow-batched media feature extraction, exploded to scalar rows."""
    from ..operators.multimodal import extract_features
    from ..session import ensure_py_files

    ensure_py_files(spark)
    d = _t(spark, sf_dir, "documents").filter(F.pmod("doc_id", F.lit(5)) == 0)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "kind",
        "payload_sha256",
        "n_bytes",
        F.posexplode("features").alias("pos", "val"),
    )


# Encoding-damage triage (functions/text.py encoding_damage_cols): U+FFFD
# replacement chars, C0 controls (minus tab/newline/CR), and the two
# classic mojibake artifact families, counted by JVM regexps. Damage is
# INJECTED deterministically from doc_id (both engines append identical
# codepoints), so every counter and the ratio are value-checked against
# known-positive rows, not just an all-zeros corpus.
@query(
    "encoding_damage_documents",
    """
    WITH t AS (
      SELECT doc_id,
             text || CASE doc_id % 5
               WHEN 0 THEN ' caf' || chr(195) || chr(169) || ' '
                            || chr(226) || chr(8364) || chr(8482) || ' '
               WHEN 1 THEN chr(65533) || chr(65533)
               WHEN 2 THEN chr(7) || 'x' || chr(1)
               ELSE '' END AS text
      FROM documents),
    m AS (
      SELECT doc_id,
        len(regexp_extract_all(text, chr(65533))) AS n_replacement,
        len(regexp_extract_all(text,
            '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS n_control,
        len(regexp_extract_all(text,
            chr(195) || '[' || chr(128) || '-' || chr(255) || ']|'
              || chr(226) || chr(8364) || '.')) AS n_mojibake,
        length(text) AS L
      FROM t)
    SELECT doc_id, CAST(n_replacement AS INT) AS n_replacement,
           CAST(n_control AS INT) AS n_control,
           CAST(n_mojibake AS INT) AS n_mojibake,
           CASE WHEN L > 0 THEN round(
             (n_replacement + n_control + n_mojibake) * 1.0 / L, 6)
           ELSE 0.0 END AS damage_ratio
    FROM m
    """,
)
def encoding_damage_documents(spark, sf_dir):
    """JVM-regexp encoding-damage profile over deterministically damaged
    document text."""
    from ..functions.text import encoding_damage_cols

    d = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit(" caf\u00c3\u00a9 \u00e2\u20ac\u2122 "))
        .when(F.pmod("doc_id", F.lit(5)) == 1, F.lit("\ufffd\ufffd"))
        .when(F.pmod("doc_id", F.lit(5)) == 2, F.lit("\x07x\x01"))
        .otherwise(F.lit("")),
    )
    base = d.select("doc_id", injected.alias("text"))
    cols = encoding_damage_cols(F.col("text"))
    return base.select(
        "doc_id",
        cols["n_replacement"].alias("n_replacement"),
        cols["n_control"].alias("n_control"),
        cols["n_mojibake"].alias("n_mojibake"),
        cols["damage_ratio"].alias("damage_ratio"),
    )


# Luhn-VALIDATED credit-card redaction (functions/text.py cc_redact_cols):
# candidate digit runs come from one regexp pass; only runs whose
# separator-stripped form is 13-19 digits AND passes the Luhn mod-10
# checksum are masked — the 12-digit phone and order-ref runs in the same
# text are candidates that must NOT redact (the false-positive class a
# bare digit-pattern scrubber hits). Text is built deterministically from
# the customer row (real c_phone + a custkey-derived 16-digit number whose
# Luhn validity varies), so both engines construct identical bytes and the
# whole candidate->validate->redact path is value-hashed.
@query(
    "cc_luhn_redact_customer",
    """
    WITH built AS (
      SELECT c_custkey,
        lpad(CAST((CAST(c_custkey AS BIGINT) * 76543210) % 100000000
             AS VARCHAR), 8, '0')
          || lpad(CAST((CAST(c_custkey AS BIGINT) * 1234567 + 11) % 100000000
               AS VARCHAR), 8, '0') AS dg16,
        lpad(CAST(c_nationkey AS VARCHAR), 2, '0') || '-555-741-2988' AS phone
      FROM customer),
    txt AS (
      SELECT c_custkey,
        'tel ' || phone || ' ref 123456789012 card '
          || substring(dg16, 1, 4) || '-' || substring(dg16, 5, 4) || '-'
          || substring(dg16, 9, 4) || '-' || substring(dg16, 13, 4)
          || ' thanks' AS text
      FROM built),
    cand AS (
      SELECT c_custkey, text,
             regexp_extract_all(text, '\\d(?:[ -]?\\d){11,18}') AS cands
      FROM txt),
    v AS (
      SELECT c_custkey, text, cands,
        list_filter(cands, x -> (
          length(regexp_replace(x, '[ -]', '', 'g')) BETWEEN 13 AND 19
          AND list_sum(list_transform(
                range(1, length(regexp_replace(x, '[ -]', '', 'g')) + 1),
            i -> CASE WHEN (length(regexp_replace(x, '[ -]', '', 'g')) - i) % 2 = 1
                   THEN CASE WHEN CAST(substring(regexp_replace(x, '[ -]', '', 'g'), i, 1) AS INT) * 2 > 9
                             THEN CAST(substring(regexp_replace(x, '[ -]', '', 'g'), i, 1) AS INT) * 2 - 9
                             ELSE CAST(substring(regexp_replace(x, '[ -]', '', 'g'), i, 1) AS INT) * 2 END
                   ELSE CAST(substring(regexp_replace(x, '[ -]', '', 'g'), i, 1) AS INT) END)) % 10 = 0
        )) AS valid
      FROM cand)
    SELECT c_custkey, CAST(len(cands) AS INT) AS cc_candidates,
           CAST(len(valid) AS INT) AS cc_valid,
           list_reduce(list_prepend(text, valid),
                       (acc, x) -> replace(acc, x, '<CC_REDACTED>')) AS redacted
    FROM v
    """,
)
def cc_luhn_redact_customer(spark, sf_dir):
    """Candidate extraction -> Luhn validation -> selective redaction,
    all JVM higher-order expressions (functions/text.py)."""
    from ..functions.text import cc_redact_cols

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("bigint")
    dg16 = F.concat(
        F.lpad(((k * 76543210) % 100000000).cast("string"), 8, "0"),
        F.lpad(((k * 1234567 + 11) % 100000000).cast("string"), 8, "0"),
    )
    phone = F.concat(
        F.lpad(F.col("c_nationkey").cast("string"), 2, "0"),
        F.lit("-555-741-2988"),
    )
    text = F.concat(
        F.lit("tel "), phone, F.lit(" ref 123456789012 card "),
        F.substring(dg16, 1, 4), F.lit("-"), F.substring(dg16, 5, 4),
        F.lit("-"), F.substring(dg16, 9, 4), F.lit("-"),
        F.substring(dg16, 13, 4), F.lit(" thanks"),
    )
    base = cust.select("c_custkey", text.alias("text"))
    cols = cc_redact_cols(F.col("text"))
    return base.select(
        "c_custkey",
        cols["cc_candidates"].alias("cc_candidates"),
        cols["cc_valid"].alias("cc_valid"),
        cols["redacted"].alias("redacted"),
    )


# Real-codec multimodal decode (operators/multimodal.py decode_ppm /
# decode_wav): payloads are REAL binary PPM images and RIFF PCM-16 WAVs,
# built worker-side from arithmetic formulas keyed by media_id
# (synthesize_real_payload), shipped through Arrow as binary columns, and
# decoded header-to-samples by the dependency-free numpy codecs. Every
# feature statistic is an integer < 2^24 (exact in float32), so the oracle
# replicates the DECODED values term-for-term from the same generative
# formulas — n_bytes additionally checks the encoders' exact byte layout
# (header grammar + raster/data sizes). payload_sha256 is excluded only
# because DuckDB's sha256 takes VARCHAR (not BLOB); it stays pinned by
# tests/test_multimodal_streaming.py round-trips.
@query(
    "multimodal_real_decode",
    """
    WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 7 = 0),
    img AS (
      SELECT media_id, 4 + media_id % 5 AS w, 3 + media_id % 4 AS h
      FROM ids WHERE media_id % 2 = 0),
    imgpx AS (
      SELECT media_id, w, h, r.i AS i, (media_id * 31 + r.i * 7) % 256 AS b
      FROM img, LATERAL (SELECT unnest(range(0, w * h * 3)) AS i) r),
    imga AS (
      SELECT media_id, any_value(w) AS w, any_value(h) AS h,
             sum(CASE WHEN i % 3 = 0 THEN b ELSE 0 END) AS sr,
             sum(CASE WHEN i % 3 = 1 THEN b ELSE 0 END) AS sg,
             sum(CASE WHEN i % 3 = 2 THEN b ELSE 0 END) AS sb,
             min(b) AS mn, max(b) AS mx, sum(b) AS sa,
             sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS z,
             arg_min(b, i) AS b0, arg_max(b, i) AS bl,
             sum(i * b) AS iw
      FROM imgpx GROUP BY media_id),
    imgrows AS (
      SELECT media_id, 'image' AS kind,
             3 + strlen(CAST(w AS VARCHAR)) + 1
               + strlen(CAST(h AS VARCHAR)) + 1 + 4 + w*h*3 AS n_bytes,
             r.p AS pos,
             CASE r.p WHEN 0 THEN 1 WHEN 1 THEN w WHEN 2 THEN h
               WHEN 3 THEN 255 WHEN 4 THEN w*h WHEN 5 THEN sr
               WHEN 6 THEN sg WHEN 7 THEN sb WHEN 8 THEN mn WHEN 9 THEN mx
               WHEN 10 THEN sa WHEN 11 THEN z WHEN 12 THEN b0
               WHEN 13 THEN bl WHEN 14 THEN iw ELSE 0 END AS val
      FROM imga, LATERAL (SELECT unnest(range(0, 16)) AS p) r),
    aud AS (SELECT media_id, 32 + media_id % 64 AS n
            FROM ids WHERE media_id % 2 = 1),
    audsx AS (
      SELECT media_id, n, r.i AS i,
             (media_id * 131 + r.i * 17) % 65536 - 32768 AS s
      FROM aud, LATERAL (SELECT unnest(range(0, n)) AS i) r),
    auda AS (
      SELECT media_id, any_value(n) AS n, sum(s) AS ss,
             min(s) AS mn, max(s) AS mx,
             sum(abs(s)) AS sabs, arg_min(s, i) AS s0, arg_max(s, i) AS sl,
             sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS z,
             sum(CASE WHEN i > 0 AND ((s < 0) != (prev < 0))
                 THEN 1 ELSE 0 END) AS zc
      FROM (SELECT *, lag(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
            FROM audsx)
      GROUP BY media_id),
    audrows AS (
      SELECT media_id, 'audio' AS kind, 44 + 2 * n AS n_bytes, r.p AS pos,
             CASE r.p WHEN 0 THEN 2 WHEN 1 THEN 8000 WHEN 2 THEN n
               WHEN 3 THEN ss WHEN 4 THEN mn WHEN 5 THEN mx WHEN 6 THEN sabs
               WHEN 7 THEN zc WHEN 8 THEN s0 WHEN 9 THEN sl WHEN 10 THEN z
               WHEN 11 THEN 1 ELSE 0 END AS val
      FROM auda, LATERAL (SELECT unnest(range(0, 16)) AS p) r)
    SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(pos AS INT) AS pos, CAST(val AS FLOAT) AS val
    FROM (SELECT * FROM imgrows UNION ALL SELECT * FROM audrows)
    """,
)
def multimodal_real_decode(spark, sf_dir):
    """REAL media decode end-to-end: synthesize PPM/WAV bytes worker-side,
    decode them with the numpy codecs inside the mapInPandas extractor,
    explode the integer-exact feature vectors to scalar rows."""
    from ..operators.multimodal import extract_features, with_real_payloads
    from ..session import ensure_py_files

    ensure_py_files(spark)
    ids = (
        _t(spark, sf_dir, "documents")
        .filter(F.pmod("doc_id", F.lit(7)) == 0)
        .select(F.col("doc_id").alias("media_id"))
    )
    feats = extract_features(with_real_payloads(ids), fake=False)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("features").alias("pos", "val"),
    )


# --- document chunking (sliding windows with overlap; RAG prep) -------------
_CHUNK, _OVERLAP = 160, 32
_CHUNK_STEP = _CHUNK - _OVERLAP


@query(
    "chunk_documents_sliding",
    f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n FROM documents
      WHERE text IS NOT NULL AND length(text) > 0),
    s AS (
      SELECT doc_id, text, n,
             unnest(range(1, greatest(n - {_OVERLAP}, 1) + 1, {_CHUNK_STEP})) AS cs
      FROM d)
    SELECT doc_id,
           CAST((cs - 1) / {_CHUNK_STEP} AS BIGINT) AS chunk_idx,
           CAST(cs AS BIGINT) AS chunk_start,
           CAST(least(cs + {_CHUNK} - 1, n) AS BIGINT) AS chunk_end,
           substr(text, CAST(cs AS INT), {_CHUNK}) AS chunk
    FROM s
    """,
)
def chunk_documents_sliding(spark, sf_dir):
    """Sliding-window chunking over the documents corpus — every character
    covered, consecutive chunks share exactly `overlap` chars."""
    from ..operators.chunking import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_chars=_CHUNK, overlap=_OVERLAP)


# Hybrid retrieval: BM25 + tf-idf cosine fused with reciprocal rank fusion
# (Cormack et al., SIGIR 2009). The oracle replays BOTH rankers (the BM25
# CTEs mirror the bm25_search_topk replica; the cosine side mirrors the
# tfidf_query_topk micro-quantized program) and the 1/(60+rank) fusion.
@query(
    "hybrid_rrf_search",
    f"""
    WITH q(query_id, qtext) AS (VALUES {_BM25_VALUES}),
    tf AS (
      SELECT doc_id AS id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents) GROUP BY 1, 2),
    dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY 1),
    consts AS (
      SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT avg(dl) FROM dl) AS avgdl),
    -- ---------- BM25 ranker ----------
    b_qt AS (
      SELECT DISTINCT query_id, unnest(regexp_extract_all(lower(qtext), '[a-z]+')) AS term
      FROM q),
    b_df AS (
      SELECT term, count(*) AS df FROM tf
      WHERE term IN (SELECT DISTINCT term FROM b_qt) GROUP BY 1),
    b_contrib AS (
      SELECT b_qt.query_id, m.id,
             CAST(round(
               ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
               * m.tf * (1.2 + 1.0)
               / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl))
               * 1e6) AS BIGINT) AS micro
      FROM tf m
      JOIN b_qt ON m.term = b_qt.term
      JOIN b_df d ON m.term = d.term
      JOIN dl l ON m.id = l.id
      CROSS JOIN consts c),
    b_ranked AS (
      SELECT query_id, id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sum(micro) DESC, id) AS rank
      FROM b_contrib GROUP BY 1, 2),
    -- ---------- tf-idf cosine ranker ----------
    t_df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    t_wd AS (SELECT id, tf.term, tf.tf * ln(c.n_docs * 1.0 / d.df) AS w
             FROM tf JOIN t_df d ON tf.term = d.term CROSS JOIN consts c
             WHERE tf.tf * ln(c.n_docs * 1.0 / d.df) > 0),
    t_nd AS (SELECT id, sqrt(sum(w * w)) AS nd FROM t_wd GROUP BY 1),
    t_qtf AS (SELECT query_id, term, count(*) AS qtf FROM (
                SELECT query_id,
                       unnest(regexp_extract_all(lower(qtext), '[a-z]+')) AS term
                FROM q) GROUP BY 1, 2),
    t_wq AS (SELECT query_id, t_qtf.term,
                    qtf * ln(c.n_docs * 1.0 / d.df) AS wq
             FROM t_qtf JOIN t_df d ON t_qtf.term = d.term CROSS JOIN consts c
             WHERE qtf * ln(c.n_docs * 1.0 / d.df) > 0),
    t_nq AS (SELECT query_id, sqrt(sum(wq * wq)) AS nq FROM t_wq GROUP BY 1),
    t_contrib AS (
      SELECT w.query_id, d.id,
             CAST(round(d.w / nd.nd * (w.wq / nq.nq) * 1e6) AS BIGINT) AS micro
      FROM t_wd d
      JOIN t_wq w ON d.term = w.term
      JOIN t_nd nd ON nd.id = d.id
      JOIN t_nq nq ON nq.query_id = w.query_id),
    t_ranked AS (
      SELECT query_id, id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sum(micro) DESC, id) AS rank
      FROM t_contrib GROUP BY 1, 2),
    -- ---------- reciprocal rank fusion ----------
    fused AS (
      SELECT query_id, id,
             round(sum(1.0 / (60.0 + rank)), 6) AS rrf_score
      FROM (SELECT query_id, id, rank FROM b_ranked WHERE rank <= 10
            UNION ALL
            SELECT query_id, id, rank FROM t_ranked WHERE rank <= 10)
      GROUP BY 1, 2)
    SELECT query_id, id AS doc_id, rrf_score, CAST(rank AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf_score DESC, id) AS rank
          FROM fused)
    WHERE rank <= 10
    """,
)
def hybrid_rrf_search(spark, sf_dir):
    """Hybrid retrieval: BM25 and tf-idf cosine top-10 lists fused with
    reciprocal rank fusion (operators/fusion.py rrf_fuse, k=60) — the
    standard scoreless combiner for multi-ranker search."""
    from ..operators.fusion import rrf_fuse
    from ..operators.terms import bm25_topk, tfidf_query_topk

    d = _t(spark, sf_dir, "documents")
    bm = bm25_topk(d, _BM25_QUERIES, k=10)
    cos = tfidf_query_topk(d, _BM25_QUERIES, k=10)
    return rrf_fuse([bm, cos], k=60, top_k=10)


@query(
    "pmi_collocations_top",
    """
    WITH t AS (SELECT [x FOR x IN string_split_regex(
                           lower(trim(coalesce(text, ''))), '\\s+')
                       IF x <> ''] AS w
               FROM documents),
    uni AS (SELECT u AS w, count(*) AS c FROM (SELECT unnest(w) AS u FROM t)
            GROUP BY 1),
    nuni AS (SELECT sum(c) AS n FROM uni),
    bi AS (SELECT w1, w2, count(*) AS pair_count FROM (
             SELECT unnest(w[1:len(w) - 1]) AS w1, unnest(w[2:len(w)]) AS w2
             FROM t WHERE len(w) >= 2)
           GROUP BY 1, 2 HAVING count(*) >= 5),
    scored AS (
      SELECT bi.w1, bi.w2, pair_count,
             round(ln(pair_count * n / (a.c * 1.0 * b.c)), 6) AS pmi
      FROM bi JOIN uni a ON a.w = bi.w1 JOIN uni b ON b.w = bi.w2
      CROSS JOIN nuni)
    SELECT w1, w2, pair_count, pmi
    FROM (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rn
          FROM scored)
    WHERE rn <= 50
    """,
)
def pmi_collocations_top(spark, sf_dir):
    """Top-50 adjacent-token collocations by PMI (Church & Hanks 1990) at
    pair-count floor 5 (operators/terms.py pmi_collocations) — two
    censuses + census-sized joins; the phrase-mining vocabulary signal."""
    from ..operators.terms import pmi_collocations

    return pmi_collocations(_t(spark, sf_dir, "documents"), min_count=5, k=50)
