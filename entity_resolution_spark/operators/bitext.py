"""Margin-based parallel-pair mining over two embedding tables (the
LASER/CCMatrix bitext-mining rule, Artetxe & Schwenk 2019).

Given two embedding collections (e.g. sentences in two languages, or two
snapshots of a corpus), mine aligned pairs by the RATIO-MARGIN criterion:

    margin(x, y) = cos(x, y) / ((avgK_L(x) + avgK_R(y)) / 2)

where avgK_L(x) is the mean cosine of x to its k nearest neighbors on the
right side (and symmetrically for y). A pair is emitted when each side is
the other's best candidate BY MARGIN (mutual argmax) and the margin
clears the threshold — the margin normalizes away "hub" vectors that are
near everything, which plain cosine thresholds cannot.

Scale shape: both kNN sweeps run through similarity_search.knn_join — the
distributed bucket-matmul path (corpus hashed once into buckets, one BLAS
call per bucket, local top-k merge) — so nothing collects to the driver;
everything after is k-row-per-node aggregates and broadcastable argmax
frames. For corpus-scale sides, swap the exact sweep for ivf_knn_join
with the same downstream margin plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def margin_mine(
    left: DataFrame,
    right: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mutual-argmax ratio-margin mining -> (left_id, right_id, margin
    round-6), margin >= threshold, ordered tie-break (margin desc, partner
    id asc) on both argmax sides.

    ``k`` controls the neighborhood that defines each vector's own
    similarity scale; candidates are drawn from the same k-NN lists, so
    the whole plan costs two distributed kNN joins plus small-frame aggs.
    """
    from .similarity_search import knn_join

    if k < 1:
        raise ValueError("k must be >= 1")

    # kNN sweeps (cosines round-6, re-scored by the deterministic JVM
    # expression inside knn_join). Output: (query_id, <id_col>, cosine, rank).
    ab = knn_join(
        left, right, k=k, query_id=id_col, id_col=id_col, vec_col=vec_col,
        qvec_col=vec_col,
    ).select(
        F.col("query_id").alias("x"), F.col(id_col).alias("y"), "cosine"
    )
    ba = knn_join(
        right, left, k=k, query_id=id_col, id_col=id_col, vec_col=vec_col,
        qvec_col=vec_col,
    ).select(
        F.col(id_col).alias("x"), F.col("query_id").alias("y"), "cosine"
    )

    avg_l = ab.groupBy("x").agg(F.avg("cosine").alias("__ax"))
    avg_r = ba.groupBy("y").agg(F.avg("cosine").alias("__ay"))

    def with_margin(cand: DataFrame) -> DataFrame:
        return (
            cand.join(F.broadcast(avg_l), "x")
            .join(F.broadcast(avg_r), "y")
            .select(
                "x",
                "y",
                (F.col("cosine") / ((F.col("__ax") + F.col("__ay")) / 2)).alias(
                    "__m"
                ),
            )
        )

    wx = Window.partitionBy("x").orderBy(F.desc("__m"), F.asc("y"))
    wy = Window.partitionBy("y").orderBy(F.desc("__m"), F.asc("x"))
    best_x = (
        with_margin(ab).withColumn("__r", F.row_number().over(wx)).filter("__r = 1")
    )
    best_y = (
        with_margin(ba).withColumn("__r", F.row_number().over(wy)).filter("__r = 1")
    )
    return (
        best_x.select("x", "y", "__m")
        .join(best_y.select("x", "y"), ["x", "y"])
        .filter(F.col("__m") >= threshold)
        .select(
            F.col("x").alias("left_id"),
            F.col("y").alias("right_id"),
            F.round("__m", 6).alias("margin"),
        )
    )
