"""N-gram language-model quality scoring (CCNet-style perplexity filter).

CCNet (Wenzek et al. 2020) ranks crawl documents by the perplexity of a
reference-domain LM; documents far from the reference distribution are
noise. Here the LM is a bigram model with add-alpha smoothing, fit on a
reference corpus (by default the corpus itself — self-perplexity, which
flags statistically anomalous documents), scored entirely with built-in
JVM expressions: tokenize → count → join → aggregate, no Python anywhere.

Reference scope note: the reference engine has no corpus-statistics op;
this is an engine-added training-data operator (same family as
operators/terms.py TF-IDF).

Model:  P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V)
        c(w1) = sum of bigram counts with left context w1
        V     = distinct token count of the model corpus
Score:  H(doc) = -(1/N) * sum log2 P over the doc's N bigrams
        ppl(doc) = 2^H        (NULL for docs with < 2 tokens)

Scale: the fitted LM is one row per *distinct* bigram — vocabulary-bounded
and Zipf-concentrated, orders of magnitude smaller than the corpus (prune
further with min_count; the pruned mass falls back to the unigram-context
backoff). Scoring joins the exploded corpus against that table with a
shuffle_hash hint (broadcast only when the model is known-small — a
corpus-sized broadcast GC-thrashes, see BENCH/BASELINE.md). Both count
passes are plain groupBys with map-side partial aggregation; nothing is
quadratic and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.expr(f"split(lower(trim(coalesce({text_col}, ''))), '\\\\s+')")


def _bigrams(text_col: str):
    """array<struct<w1,w2>> of adjacent token pairs (empty when < 2 tokens)."""
    w = f"split(lower(trim(coalesce({text_col}, ''))), '\\\\s+')"
    return F.expr(
        f"CASE WHEN size({w}) >= 2 THEN"
        f"  transform(sequence(1, size({w}) - 1),"
        f"            i -> struct({w}[i-1] AS w1, {w}[i] AS w2))"
        f" ELSE array() END"
    )


def fit_bigram_lm(
    model_docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit the model. Returns (bigram_counts, context_counts, vocab_size):

      bigram_counts  (w1, w2, c12)   distinct bigrams kept (c12 >= min_count)
      context_counts (w1, c1)        total bigram mass per left context
                                     (pre-pruning, so probabilities stay
                                     normalized when min_count prunes)
      vocab_size     1-row (v)       distinct tokens in the model corpus
    """
    bi = (
        model_docs.select(F.explode(_bigrams(text_col)).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    ctx = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    if min_count > 1:
        bi = bi.filter(F.col("c12") >= min_count)
    vocab = (
        model_docs.select(F.explode(_tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    return bi, ctx, vocab


def bigram_lm_cross_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_docs: DataFrame | None = None,
    alpha: float = 1.0,
    min_count: int = 1,
) -> DataFrame:
    """Per-document bigram cross-entropy / perplexity under the fitted LM.

    Returns (id_col, n_bigrams int, cross_entropy double, perplexity double),
    both rounded to 4; NULL entropy for docs with fewer than 2 tokens.
    Unseen bigrams (model_docs != docs, or pruned by min_count) back off to
    the smoothed unigram-context floor alpha / (c1 + alpha*V) with c1 = 0
    for unseen contexts.
    """
    bi, ctx, vocab = fit_bigram_lm(model_docs or docs, text_col, min_count)

    pairs = docs.select(
        F.col(id_col), F.explode(_bigrams(text_col)).alias("b")
    ).select(id_col, "b.w1", "b.w2")

    scored = (
        pairs.join(bi.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(ctx.hint("shuffle_hash"), "w1", "left")
        .crossJoin(vocab)  # 1-row vocab scalar
        .select(
            id_col,
            F.log2(
                (F.coalesce("c12", F.lit(0)) + F.lit(alpha))
                / (F.coalesce("c1", F.lit(0)) + F.lit(alpha) * F.col("v"))
            ).alias("__lp"),
        )
    )

    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("__n"), (-F.avg("__lp")).alias("__h")
    )

    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("__n", F.lit(0)).cast("int").alias("n_bigrams"),
            F.round("__h", 4).alias("cross_entropy"),
            F.round(F.pow(F.lit(2.0), F.col("__h")), 4).alias("perplexity"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    model_docs: DataFrame | None = None,
    alpha: float = 1.0,
    min_count: int = 1,
    exact: bool = True,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """CCNet-style per-language quality buckets (Wenzek et al. 2020 §4.3):
    rank each language's documents by LM perplexity and cut into terciles —
    'head' (closest to the reference distribution), 'middle', 'tail'.
    Documents with < 2 tokens get 'unscored'.

    Returns (id_col, lang_col, n_bigrams, perplexity, bucket).

    Two physical plans, identical semantics up to tie handling:

    - ``exact=True``: integer NTILE(3) per language over
      (perplexity, id) — bit-deterministic (SQL-standard bucket sizing,
      no float cutoff compare), which is what makes the operator
      oracle-checkable. Costs one range shuffle per language partition;
      fine while no single language dominates an executor's sort budget.
    - ``exact=False``: the 100 TB plan — per-language tercile cutoffs from
      ``percentile_approx`` (a tiny map-side-combined aggregate, one row
      per language), broadcast back and assigned with comparisons. No
      per-language sort of the corpus; boundary docs may land one bucket
      off versus the exact plan (the sketch's documented tolerance).
    """
    ppl = bigram_lm_cross_entropy(docs, id_col, text_col, model_docs, alpha, min_count)
    base = docs.select(id_col, lang_col).join(ppl, id_col)
    label = (
        F.when(F.col("__t") == 1, F.lit("head"))
        .when(F.col("__t") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    if exact:
        # unscored rows must not occupy NTILE slots — bucket sizes are
        # computed over every row in the window partition, so keep the
        # window to scored rows only and union the unscored back.
        w = Window.partitionBy(lang_col).orderBy("perplexity", id_col)
        scored = base.filter(F.col("perplexity").isNotNull()).withColumn(
            "__t", F.ntile(3).over(w)
        )
        out = scored.unionByName(
            base.filter(F.col("perplexity").isNull()).withColumn(
                "__t", F.lit(None).cast("int")
            )
        )
    else:
        cuts = (
            base.filter(F.col("perplexity").isNotNull())
            .groupBy(lang_col)
            .agg(
                F.percentile_approx(
                    "perplexity", [1.0 / 3.0, 2.0 / 3.0], approx_accuracy
                ).alias("__cuts")
            )
        )
        out = base.join(F.broadcast(cuts), lang_col, "left").withColumn(
            "__t",
            F.when(F.col("perplexity").isNull(), F.lit(None))
            .when(F.col("perplexity") <= F.col("__cuts")[0], F.lit(1))
            .when(F.col("perplexity") <= F.col("__cuts")[1], F.lit(2))
            .otherwise(F.lit(3)),
        )
    return out.select(
        id_col,
        lang_col,
        "n_bigrams",
        "perplexity",
        F.when(F.col("__t").isNull(), F.lit("unscored")).otherwise(label).alias("bucket"),
    )
