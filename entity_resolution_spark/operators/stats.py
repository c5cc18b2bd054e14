"""Corpus composition report + mixture weighting (engine-added
training-data operator; the reference has no corpus-statistics op).

One pass over the corpus produces the per-(source, lang) facts a data
curator reads before fixing a training mixture — document counts, token
and char volumes, median length — plus the temperature-smoothed sampling
weight w_g ∝ n_g^alpha (the multilingual-sampling rule of Conneau &
Lample 2019; alpha=1 reproduces natural proportions, alpha→0 uniform).

Scale shape: a single hash aggregate with map-side partial combine — the
output is one row per (source, lang) group, so the post-shuffle stage is
trivially small; the median uses Spark's exact ``percentile`` (sort-based
WITHIN each tiny group's collected value multiset at the aggregate level,
not a corpus sort). The weight normalization is a window over the
group-level frame (|sources|x|langs| rows — driver-scale, not data-scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import whitespace_token_count_col


def corpus_report(
    docs: DataFrame,
    by: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group corpus composition: (by..., n_docs, total_tokens,
    total_chars, avg_chars, p50_chars, mix_weight).

    ``mix_weight`` = round(n_docs^alpha / sum_g n_docs^alpha, 6) — the
    sampling probability a temperature-smoothed mixture assigns the group.
    NULL text counts as an empty document (0 tokens / 0 chars), matching
    the quality-scoring convention.
    """
    by = list(by)
    chars = F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long")
    toks = whitespace_token_count_col(F.coalesce(F.col(text_col), F.lit(""))).cast("long")
    grouped = docs.groupBy(*by).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.sum(chars).alias("total_chars"),
        F.round(F.avg(chars), 2).alias("avg_chars"),
        F.expr(f"percentile(length(coalesce({text_col}, '')), 0.5)").alias(
            "p50_chars"
        ),
    )
    # group-level normalization: the frame here is |groups| rows, tiny by
    # construction — a single-partition window over it is control-plane work
    w = Window.partitionBy()
    return grouped.withColumn(
        "mix_weight",
        F.round(
            F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
            / F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))).over(w),
            6,
        ),
    )
