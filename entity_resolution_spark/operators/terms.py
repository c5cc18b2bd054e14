"""Corpus-level term statistics: document frequency and TF-IDF salience.

The classic two-pass global-statistics shape a training-data pipeline needs
(keyword extraction, topic sampling, search-index feeds):

  pass 1  explode terms -> per-(doc, term) counts     (one shuffle)
  pass 2  per-term document frequency                 (one groupBy on term)
  join    tf x idf, window top-k per doc              (one join + window)

Everything is built-in JVM expressions — no Python in the plan. The df
table is one row per distinct term, so corpus-wide stopwords make it
*tall*, never a quadratic block; the top-k window partitions by doc_id
(naturally uniform).

The corpus size N enters as a literal resolved by one control-plane count
(a decision scalar, same rule as the pipeline's metrics pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf) — lowercase alphabetic tokens, one row per distinct
    (doc, term)."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )


def document_frequency(tf: DataFrame) -> DataFrame:
    """(term, df) from a term_counts frame (already distinct per doc)."""
    return tf.groupBy("term").agg(F.count("*").alias("df"))


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k salient terms per document by smoothed TF-IDF
    (tf * (ln((N+1)/(df+1)) + 1)), rounded to 6 before ranking so the
    (tfidf desc, term asc) order — and therefore the pick — is exactly
    reproducible by any engine.
    """
    n_docs = docs.count()  # control-plane scalar
    tf = term_counts(docs, id_col, text_col)
    df = document_frequency(tf)
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    scored = tf.join(df.hint("shuffle_hash"), "term").select(
        "id", "term", F.round(F.col("tf") * idf, 6).alias("tfidf")
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(F.col("id").alias(id_col), "term", "tfidf")
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_salts: int = 32,
) -> DataFrame:
    """(query_id, id_col, score, rank) — BM25 retrieval: the ``k``
    highest-scoring documents for each query string, Lucene's
    non-negative idf variant::

        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    summed over the *distinct* query terms (query-side multiplicity is
    ignored, matching Lucene's default). Each per-term contribution is
    quantized to integer micro-units before the sum (the DSIR pattern:
    integer addition is order-independent, so the score — and therefore
    the retrieved set — is identical on any engine and partitioning),
    and ties break on ascending doc id.

    Scale shape: the query set is tiny and broadcast; the corpus explodes
    once into per-(doc, term) counts (the same single shuffle TF-IDF
    pays), document length and the corpus constants (N, avgdl) come from
    map-side-combined aggregates, and df is computed only for query terms
    (bounded rows). The per-query top-k runs in two phases — a salted
    local window then a final window over <= n_queries*n_salts*k
    survivors — so one hot query never funnels corpus-scale rows through
    a single task.
    """
    spark = docs.sparkSession
    qterms = (
        spark.createDataFrame(queries, "query_id string, qtext string")
        .select("query_id", F.explode(F.expr("regexp_extract_all(lower(qtext), '[a-z]+', 0)")).alias("term"))
        .distinct()
    )
    tf = term_counts(docs, id_col, text_col)
    # dl counts ALL tokens of the doc (sum of tf), not just query matches.
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    # Control-plane scalars: one tiny aggregate (decision constants, same
    # convention as tfidf_top_terms's n_docs).
    n_docs = docs.count()
    avgdl_row = dl.agg(F.avg("dl").alias("avgdl")).collect()[0]
    avgdl = float(avgdl_row["avgdl"] or 0.0) or 1.0
    # df per query term, from the per-(doc, term)-distinct tf frame — via
    # the DISTINCT term list, so a term shared by two queries counts each
    # doc once.
    df_q = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    matched = tf.join(F.broadcast(qterms), "term")
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl") / F.lit(avgdl)
    )
    contrib_micro = F.round(
        idf * F.col("tf") * F.lit(float(k1) + 1.0) / denom * F.lit(1e6)
    ).cast("long")
    scored = (
        matched.join(F.broadcast(df_q), "term")
        .join(dl.hint("shuffle_hash"), "id")
        .groupBy("query_id", "id")
        .agg(F.round(F.sum(contrib_micro) / F.lit(1e6), 6).alias("score"))
    )
    salt = F.pmod(F.xxhash64(F.col("id")), F.lit(int(n_salts)))
    w_local = Window.partitionBy("query_id", "__salt").orderBy(F.desc("score"), F.asc("id"))
    survivors = (
        scored.withColumn("__salt", salt)
        .withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias(id_col), "score", "rank")
    )


def top_vocabulary(
    docs: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, n) — the ``vocab_size`` most frequent lowercase alphabetic
    tokens across the corpus, ties broken lexicographically. The census is
    one map-side-combined groupBy; the final cut is a bounded
    TakeOrdered (vocab_size rows), never a full sort."""
    counts = (
        docs.select(F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    return counts.orderBy(F.desc("n"), F.asc("term")).limit(vocab_size)


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document vocabulary coverage / OOV rate against a token
    vocabulary — the standard pre-tokenizer health check before committing
    a corpus to a training run (a rising OOV rate flags encoding damage,
    language drift, or boilerplate the tokenizer will shred).

    ``vocab`` defaults to the corpus's own top-``vocab_size`` tokens
    (``top_vocabulary``) so the operator is self-contained and
    deterministic; pass a frame with a ``term`` column to check against a
    real tokenizer's vocabulary.

    Returns (id_col, n_tokens, n_oov, oov_rate round-6; NULL rate for
    token-less docs). Scale shape: the vocabulary is bounded (rows =
    vocab_size) and broadcast; the corpus side explodes once and
    aggregates back per doc — linear, no corpus shuffle beyond the per-doc
    combine.
    """
    if vocab is None:
        vocab = top_vocabulary(docs, vocab_size, id_col, text_col)
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    exploded = docs.select(F.col(id_col), F.explode(toks).alias("term"))
    flagged = exploded.join(
        F.broadcast(vocab.select("term", F.lit(1).alias("__in"))), "term", "left"
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def tfidf_query_topk(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_salts: int = 32,
) -> DataFrame:
    """(query_id, id_col, score, rank) — classic tf-idf cosine retrieval:
    the k documents whose L2-normalized tf-idf vectors score highest
    against each query string's vector (idf = ln(N/df) from the corpus;
    query terms absent from the corpus contribute nothing). The lexical
    counterpart to BM25 — same tokenization, same salted two-phase
    top-k, same micro-unit contribution quantization so the score is
    partition- and engine-order-independent.

    Scale shape: one corpus explode + df census (the tfidf_top_terms
    passes); document norms from one join + aggregate; the query side is
    a literal frame that stays broadcast end-to-end.
    """
    spark = docs.sparkSession
    tf = term_counts(docs, id_col, text_col)
    n_docs = docs.count()
    df_all = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(float(n_docs)) / F.col("df"))
    wd = tf.join(df_all.hint("shuffle_hash"), "term").select(
        "id", "term", (F.col("tf") * idf).alias("__w")
    ).where(F.col("__w") > 0)
    norms = wd.groupBy("id").agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__nd")
    )
    qtf = (
        spark.createDataFrame(queries, "query_id string, qtext string")
        .select(
            "query_id",
            F.explode(
                F.expr("regexp_extract_all(lower(qtext), '[a-z]+', 0)")
            ).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    wq = qtf.join(df_all, "term").select(
        "query_id", "term", (F.col("qtf") * idf).alias("__wq")
    ).where(F.col("__wq") > 0)
    qnorms = wq.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("__wq") * F.col("__wq"))).alias("__nq")
    )
    wqn = wq.join(qnorms, "query_id").select(
        "query_id", "term", (F.col("__wq") / F.col("__nq")).alias("__wqn")
    )
    contrib_micro = F.round(
        F.col("__w") / F.col("__nd") * F.col("__wqn") * F.lit(1e6)
    ).cast("long")
    scored = (
        wd.join(F.broadcast(wqn), "term")
        .join(norms.hint("shuffle_hash"), "id")
        .groupBy("query_id", "id")
        .agg(F.round(F.sum(contrib_micro) / F.lit(1e6), 6).alias("score"))
    )
    salt = F.pmod(F.xxhash64(F.col("id")), F.lit(int(n_salts)))
    w_local = Window.partitionBy("query_id", "__salt").orderBy(
        F.desc("score"), F.asc("id")
    )
    survivors = (
        scored.withColumn("__salt", salt)
        .withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias(id_col), "score", "rank")
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, pair_count, pmi round-6) — the ``k`` adjacent-token pairs
    with highest pointwise mutual information (Church & Hanks 1990),
    the classic collocation/phrase-mining signal used to decide which
    word pairs deserve a single vocabulary entry::

        pmi(a, b) = ln( c_ab * N_uni / (c_a * c_b) )

    with c_ab the adjacent-pair count, c_* unigram occurrence counts and
    N_uni the total token count. ``min_count`` floors c_ab (PMI is
    notoriously noisy on rare pairs). Ties break (pmi DESC, w1, w2).

    Two censuses (unigram, bigram) + two broadcastable joins back onto
    the bigram census — the corpus explodes twice and shuffles only
    census-sized frames; top-k is a bounded window over survivors.
    """
    if min_count < 1 or k < 1:
        raise ValueError("min_count and k must be >= 1")
    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    base = docs.select(F.filter(toks, lambda t: t != "").alias("__t"))
    uni = (
        base.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("__n"))
    bi = (
        base.select(
            F.explode(
                F.zip_with(
                    F.slice("__t", 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                    F.slice("__t", 2, F.greatest(F.size("__t") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select(F.col("p.w1"), F.col("p.w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("__c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("__c2"))
    scored = (
        bi.join(u1.hint("shuffle_hash"), "w1")
        .join(u2.hint("shuffle_hash"), "w2")
        .crossJoin(F.broadcast(n_uni))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log(
                    F.col("pair_count")
                    * F.col("__n")
                    / (F.col("__c1") * F.col("__c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy().orderBy(F.desc("pmi"), "w1", "w2")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
