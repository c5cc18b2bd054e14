"""Test-set decontamination: flag training documents whose word n-grams
overlap a benchmark/eval set (engine-added LLM-data-pipeline operator;
the standard n-gram protocol from GPT-3 appendix C / PaLM / Llama data
cards, re-expressed as a Spark plan).

Scale shape (the part that matters at 100 TB):

- Benchmark gram sets are tiny relative to the corpus (eval suites are
  MBs, the corpus is TBs) — the distinct benchmark grams are **broadcast**,
  so the corpus side never shuffles: tokenize -> explode -> broadcast-hash
  semi-probe -> partial count, all map-side except the final per-doc count
  combine.
- The corpus side stays linear: grams are distinct-ed per document BEFORE
  the explode (array_distinct on the gram array), so a pathological
  repeated-phrase doc contributes each gram once, not len(doc) times.
- Everything is JVM column expressions (split/slice/concat_ws inside
  transform) — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SEP = "[^a-z0-9]+"  # lowercase word tokens; unicode letters separate


def word_ngrams_col(text_col, n: int):
    """array<string> of distinct space-joined word n-grams of ``text_col``.

    Tokenization (lower + split on non-[a-z0-9]) is chosen to be exactly
    replicable in ANSI SQL so the operator stays oracle-checkable.
    """
    toks = F.filter(F.split(F.lower(text_col), TOKEN_SEP), lambda t: t != F.lit(""))
    k = F.size(toks) - F.lit(n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document benchmark overlap: (id, total_grams, hit_grams,
    contamination) for every doc with at least one n-gram.

    ``contamination`` is the fraction of the doc's *distinct* n-grams that
    appear anywhere in the benchmark set; callers drop docs above their
    threshold (0.0 keeps the full distribution observable, like the
    scoring stage's convention).
    """
    doc_grams = docs.select(
        F.col(id_col), word_ngrams_col(F.col(text_col), n).alias("grams")
    ).filter(F.size("grams") > 0)
    bench_grams = (
        benchmark.select(F.explode(word_ngrams_col(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    hits = (
        doc_grams.select(F.col(id_col), F.explode("grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("hit_grams"))
    )
    totals = doc_grams.select(F.col(id_col), F.size("grams").cast("long").alias("total_grams"))
    return (
        totals.join(hits, id_col, "left")
        .withColumn("hit_grams", F.coalesce("hit_grams", F.lit(0)))
        .withColumn(
            "contamination",
            F.round(F.col("hit_grams") / F.col("total_grams"), 6),
        )
    )


def embedding_contamination(
    docs_emb: DataFrame,
    benchmark_emb: DataFrame,
    *,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
    threshold: float = 0.95,
    n_buckets: int | None = None,
) -> DataFrame:
    """Semantic (embedding-level) test-set decontamination: for every
    corpus document, its maximum cosine similarity against the benchmark
    embedding set, the nearest benchmark id, and a contaminated flag at
    ``threshold``. Catches paraphrased eval leakage the n-gram protocol
    (``ngram_contamination``) misses.

    Scale shape mirrors ``similarity_search.knn_join`` with the roles
    reversed: the CORPUS is the big side — bucketed once on a uniform
    synthetic key and never replicated — while the benchmark set (eval
    suites are MBs) is replicated to every bucket through a broadcast
    cross-join. Each cogrouped bucket sees the FULL benchmark, so the
    per-row argmax is final locally: one (bucket_rows x bench_rows)
    float64 matmul per bucket, no merge window, nothing collects to the
    driver. Winner cosines are re-scored with the JVM zip_with/aggregate
    expression so reported values are bit-identical to the oracle path
    (BLAS summation order differs in ulps). Ties on cosine break to the
    smallest benchmark id.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = docs_emb.sparkSession
    bench_vec_col = bench_vec_col or vec_col
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism * 4

    out_schema = T.StructType(
        [
            T.StructField(id_col, docs_emb.schema[id_col].dataType),
            T.StructField(bench_id_col, benchmark_emb.schema[bench_id_col].dataType),
            T.StructField("approx", T.DoubleType()),
        ]
    )

    corpus_b = docs_emb.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int").alias("__b"),
    )
    buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("__b"))
    bench_r = benchmark_emb.select(
        F.col(bench_id_col), F.col(bench_vec_col).alias("__bv")
    ).crossJoin(F.broadcast(buckets))

    def bucket_argmax(cdf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cdf) or not len(bdf):
            return pd.DataFrame({id_col: [], bench_id_col: [], "approx": []})
        V = np.asarray(cdf["__v"].tolist(), dtype="float64")
        B = np.asarray(bdf["__bv"].tolist(), dtype="float64")
        bids = bdf[bench_id_col].to_numpy()
        # sort benchmark by id so np.argmax's first-max tie rule == min id
        order = np.argsort(bids, kind="stable")
        B, bids = B[order], bids[order]
        vn = np.linalg.norm(V, axis=1)
        bn = np.linalg.norm(B, axis=1)
        S = (V / np.maximum(vn, 1e-300)[:, None]) @ (B / np.maximum(bn, 1e-300)[:, None]).T
        S[vn == 0, :] = -1.0
        S[:, bn == 0] = -1.0
        j = np.argmax(S, axis=1)
        return pd.DataFrame(
            {
                id_col: cdf[id_col].to_numpy(),
                bench_id_col: bids[j],
                "approx": S[np.arange(len(V)), j],
            }
        )

    winners = (
        corpus_b.groupBy("__b")
        .cogroup(bench_r.groupBy("__b"))
        .applyInPandas(bucket_argmax, out_schema)
        .select(id_col, bench_id_col)
    )
    cv = docs_emb.select(id_col, F.col(vec_col).cast("array<double>").alias("__cv"))
    bv = benchmark_emb.select(
        bench_id_col, F.col(bench_vec_col).cast("array<double>").alias("__bv")
    )
    from .similarity_search import _cosine_cols

    # winners is corpus-sized (one row per doc): join it back co-keyed on
    # the id (shuffle-hash, linear) — only the benchmark side broadcasts
    return (
        cv.join(winners.hint("shuffle_hash"), id_col)
        .join(F.broadcast(bv), bench_id_col)
        .select(
            id_col,
            bench_id_col,
            F.round(_cosine_cols(F.col("__cv"), F.col("__bv")) + F.lit(1e-9), 6).alias("max_cosine"),
            (
                F.round(_cosine_cols(F.col("__cv"), F.col("__bv")) + F.lit(1e-9), 6)
                >= F.lit(float(threshold))
            ).alias("contaminated"),
        )
    )
