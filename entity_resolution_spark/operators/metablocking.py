"""Meta-blocking: prune the blocking graph before pairwise scoring.

Papadakis et al., "Meta-Blocking: Taking Entity Resolution to the Next
Level" (TKDE 2014).  Redundancy-positive blocking (token blocking, the
reference's multi-key families in operators/blocking.py) emits the same
pair from many blocks; the number of shared blocks is itself a cheap
similarity signal.  Meta-blocking builds the implicit blocking graph —
nodes = entities, edges = co-occurring pairs, weight = block overlap — and
prunes low-weight edges BEFORE any expensive comparison runs.  At 100 TB
this is the difference between scoring every co-occurring pair and scoring
only the edges that beat their endpoints' local weight profile: the paper
reports order-of-magnitude candidate reductions at near-zero recall loss.

Everything is relational algebra (one inverted-index self-join + two
hash aggregates + one edge-filter join), so Catalyst/AQE handle the
physical plan; the oversized-block purge keeps the self-join skew-safe the
same way dedup's stop-gram pruning does.

Weights: cbs = |shared blocks| (integer); js = Jaccard of the two block
sets, rounded at 6 so the per-edge weight is engine-exact.  Pruning: WNP
(weighted node pruning) — an edge survives if its weight is >= the mean
edge weight of EITHER endpoint.  Node means are means of rounded weights,
themselves rounded at 6, so the only cross-engine drift (FP summation
order inside avg) is absorbed exactly like the EM M-step rounding in
operators/linkage.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, key) distinct whitespace-token blocking assignments."""
    tok = F.explode(
        F.array_distinct(
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"), tok.alias("key"))
        .where(F.col("key") != "")
    )


def meta_blocking_wnp(
    postings: DataFrame,
    max_block_size: int = 10_000,
    id_col: str = "id",
    key_col: str = "key",
) -> DataFrame:
    """WNP-pruned candidate edges -> (left_id, right_id, cbs, js).

    Stages (each one shuffle, all JVM):
      1. block purge — drop keys with more than ``max_block_size`` postings
         (hash-aggregate census + join-back, not a window: oversized blocks
         are exactly the keys a per-key window would straggle on);
      2. per-entity block count AFTER the purge (the paper's convention);
      3. inverted-index self-join on the key, count shared blocks per pair
         (cbs), Jaccard weight js = cbs / (n_l + n_r - cbs) rounded at 6;
      4. node weight profile — each edge contributes its weight to both
         endpoints; mean per node, rounded at 6;
      5. WNP filter — keep the edge if js >= mean(left) OR js >= mean(right).
    """
    p = postings.select(F.col(id_col).alias("id"), F.col(key_col).alias("key")).distinct()
    census = p.groupBy("key").agg(F.count(F.lit(1)).alias("__bs"))
    p = p.join(census.hint("shuffle_hash"), "key").where(
        F.col("__bs") <= max_block_size
    )
    n_blocks = p.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    p = p.join(n_blocks.hint("shuffle_hash"), "id").select("key", "id", "n")

    a = p.select("key", F.col("id").alias("left_id"), F.col("n").alias("__nl"))
    b = p.select("key", F.col("id").alias("right_id"), F.col("n").alias("__nr"))
    edges = (
        a.join(b, "key")
        .where(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id", "__nl", "__nr")
        .agg(F.count(F.lit(1)).alias("cbs"))
        .withColumn(
            "js",
            F.round(F.col("cbs") / (F.col("__nl") + F.col("__nr") - F.col("cbs")), 6),
        )
        .select("left_id", "right_id", "cbs", "js")
    )
    edges = edges.persist()

    prof = (
        edges.select(F.col("left_id").alias("node"), "js")
        .unionByName(edges.select(F.col("right_id").alias("node"), "js"))
        .groupBy("node")
        .agg(F.round(F.avg("js"), 6).alias("__mean"))
    )
    return (
        edges.join(
            prof.withColumnRenamed("node", "left_id")
            .withColumnRenamed("__mean", "__ml")
            .hint("shuffle_hash"),
            "left_id",
        )
        .join(
            prof.withColumnRenamed("node", "right_id")
            .withColumnRenamed("__mean", "__mr")
            .hint("shuffle_hash"),
            "right_id",
        )
        .where((F.col("js") >= F.col("__ml")) | (F.col("js") >= F.col("__mr")))
        .select("left_id", "right_id", "cbs", "js")
    )


def shingle_postings(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, key) distinct word-n-gram blocking assignments (token blocking
    with shingle keys — rarer, more discriminative blocks than unigrams).
    Same JVM gram construction as dedup.ngram_jaccard_pairs."""
    toks = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("key")
    ).where(F.col("key") != "")
