"""Distributed multinomial Naive Bayes text classifier.

The curation role the reference fills with a per-row LLM call
(/root/reference/entity_resolution.py:87-115 describes rows one at a time)
is, at corpus scale, a trained classifier: CCNet/fastText-style language or
quality gates that score every document cheaply. Multinomial NB is the
canonical distributed formulation because BOTH phases are pure relational
algebra — no parameter server, no iteration:

* **train** — one ``groupBy(label, token).count()`` (map-side partial
  aggregation, single shuffle on the composite key) plus two tiny
  label-level aggregates. The fitted model IS a DataFrame
  ``(label, token, loglik)`` — it can be written to parquet, versioned,
  and joined like any other table.
* **predict** — explode test docs to ``(doc_id, token, cnt)``, join the
  model on ``token`` (shuffle-hash: vocabulary can exceed broadcast size
  at 100 TB), sum ``cnt * loglik`` per ``(doc_id, label)``, argmax. Docs
  whose every token is out-of-vocabulary (or that are empty) still get a
  prediction: the label grid is seeded from a broadcast cross join with
  the (tiny) label table, unseen tokens contribute the Laplace default
  ``ln(alpha / (tot_label + alpha * V))``.

Determinism: counts are integers, log-likelihoods are pure functions of
counts, and the argmax tie-break is ``(score DESC, label ASC)`` — the
prediction is reproducible across engines, which is what lets the DuckDB
oracle in contract/classifier_ops.py replicate it value-for-value.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = r"\s+"


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    """Explode whitespace tokens of lower(trim(text)); drops empty tokens.

    Mirrors the bigram-LM tokenizer (operators/lm.py) so NB and perplexity
    gates score the same token stream.
    """
    tok = F.explode(F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), TOKEN_RE))
    return df.withColumn("token", tok).where(F.col("token") != "")


@dataclass
class NBModel:
    """Fitted model: two DataFrames + the vocabulary-size scalar."""

    likelihood: DataFrame  # (label, token, loglik double)
    labels: DataFrame  # (label, log_prior double, log_default double)
    vocab_size: int
    alpha: float


def nb_train(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    alpha: float = 1.0,
    round_terms: int | None = None,
) -> NBModel:
    """Fit multinomial NB with Laplace smoothing ``alpha``.

    One wide shuffle (token counts), two label-sized aggregates, one
    control-plane scalar (vocabulary size). The likelihood table is
    ``O(labels x vocab)`` rows — persistable, mergeable across shards by
    re-aggregating raw counts, never collected to the driver.

    ``round_terms``: optionally round every log term to N decimals. ln() is
    the one non-IEEE-pinned function in the model (JVM Math.log vs another
    engine's libm can differ in the last ulp); rounding at 10 decimals makes
    the individual terms bit-identical across engines while perturbing
    scores ~9 orders of magnitude below any real decision margin. The
    cross-engine oracle uses this; plain Spark-only use can leave it None.
    """

    def _r(c):
        return F.round(c, round_terms) if round_terms is not None else c

    tok = _tokens(docs.select(F.col(label_col).alias("label"), text_col), text_col)
    counts = tok.groupBy("label", "token").agg(F.count(F.lit(1)).alias("c"))
    counts = counts.persist()
    vocab_size = counts.select("token").distinct().count()  # scalar: control plane
    totals = counts.groupBy("label").agg(F.sum("c").alias("tot"))

    lik = (
        counts.join(F.broadcast(totals), "label")
        .select(
            "label",
            "token",
            _r(
                F.log((F.col("c") + F.lit(alpha)) / (F.col("tot") + F.lit(alpha * vocab_size)))
            ).alias("loglik"),
        )
    )

    n_docs = docs.count()
    priors = docs.groupBy(F.col(label_col).alias("label")).agg(
        _r(F.log(F.count(F.lit(1)) / F.lit(float(n_docs)))).alias("log_prior")
    )
    labels = (
        priors.join(F.broadcast(totals), "label", "left")
        .select(
            "label",
            "log_prior",
            _r(
                F.log(
                    F.lit(alpha) / (F.coalesce(F.col("tot"), F.lit(0)) + F.lit(alpha * vocab_size))
                )
            ).alias("log_default"),
        )
    )
    return NBModel(likelihood=lik, labels=labels, vocab_size=vocab_size, alpha=alpha)


def nb_predict(
    docs: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Predict one label per input row -> (id_col, pred_label).

    Physical shape: token histogram per doc (shuffle on id), label grid via
    broadcast cross join with the tiny label table, model join on token
    (shuffle-hash — the vocabulary scales with the corpus, the label table
    does not), then a per-doc argmax window. Empty/all-OOV docs survive via
    the prior-only base grid.
    """
    tok = _tokens(docs.select(id_col, text_col), text_col)
    hist = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("cnt"))

    scored = (
        hist.crossJoin(F.broadcast(model.labels.select("label", "log_default")))
        .join(model.likelihood.hint("shuffle_hash"), ["label", "token"], "left")
        .withColumn("ll", F.coalesce(F.col("loglik"), F.col("log_default")))
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("cnt") * F.col("ll")).alias("tok_score"))
    )

    base = docs.select(id_col).crossJoin(F.broadcast(model.labels.select("label", "log_prior")))
    full = (
        base.join(scored, [id_col, "label"], "left")
        .withColumn("score", F.col("log_prior") + F.coalesce(F.col("tok_score"), F.lit(0.0)))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("label").asc())
    return (
        full.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(id_col, F.col("label").alias("pred_label"))
    )


def nb_evaluate(predictions: DataFrame, truth: DataFrame, id_col: str, label_col: str) -> DataFrame:
    """Confusion counts (label, pred_label, n) — label-squared rows, tiny."""
    return (
        truth.select(id_col, F.col(label_col).alias("label"))
        .join(predictions, id_col)
        .groupBy("label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def save_nb_model(model: NBModel, path: str) -> None:
    """Persist the fitted model: likelihood + labels as parquet tables,
    scalars as a one-row meta table.  The model IS DataFrames, so
    persistence is plain table writes — no serialization format."""
    model.likelihood.write.mode("overwrite").parquet(f"{path}/likelihood")
    labels = model.labels
    labels.write.mode("overwrite").parquet(f"{path}/labels")
    labels.sparkSession.createDataFrame(
        [(int(model.vocab_size), float(model.alpha))], "vocab_size long, alpha double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_nb_model(spark, path: str) -> NBModel:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return NBModel(
        likelihood=spark.read.parquet(f"{path}/likelihood"),
        labels=spark.read.parquet(f"{path}/labels"),
        vocab_size=meta["vocab_size"],
        alpha=meta["alpha"],
    )
