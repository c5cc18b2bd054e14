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
