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
