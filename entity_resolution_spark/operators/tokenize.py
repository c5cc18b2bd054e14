"""Tokenizer-training support: corpus-wide BPE merge-candidate mining.

The first (and every) BPE training iteration (Sennrich et al. 2016) is a
corpus-scale count: weight each distinct word by its frequency, count
adjacent symbol pairs inside words, rank by count. The counting pass is
the distributed-heavy part — the merge loop itself runs over the
word-frequency table, which is vocabulary-sized, not corpus-sized.

All exact integer arithmetic, all built-in JVM expressions:

  words   regexp explode -> groupBy word        (corpus shuffle, once)
  pairs   char 2-grams inside each word x freq  (vocab-sized, narrow)
  rank    groupBy pair -> top-k                 (tiny aggregate)

Scale: after the first groupBy the frame is one row per DISTINCT word —
Zipf-bounded, orders of magnitude smaller than the corpus — so the pair
explosion and every later BPE iteration are cheap regardless of corpus
size. Deterministic: ties rank by pair string ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — lowercase alphabetic word counts over the corpus."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Top-k BPE merge candidates: (pair, cnt) of adjacent character pairs
    inside words, weighted by word frequency, ordered (cnt desc, pair asc).

    Words of length 1 carry no pair (filtered BEFORE sequence(): Spark's
    sequence(1, 0) infers step -1 and would yield [1, 0], not empty)."""
    wc = word_frequencies(docs, text_col).filter(F.length("word") >= 2)
    pairs = wc.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                "          i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(k)
    )
