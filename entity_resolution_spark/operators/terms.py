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
