"""Vector-column analytics: normalization and group centroids.

Embedding columns (`array<float>`) get aggregated constantly in a
training-data pipeline — cluster centroids for IVF coarse quantizers,
per-source mean embeddings for domain balancing, dedup-cluster prototypes.
Spark has no native element-wise array aggregate, so the scalable shape is

    posexplode -> groupBy (group, pos) avg -> ordered reassembly

two shuffles, both on uniform keys ((group, pos) fan-out = dim x groups —
never skewed by group size), all JVM expressions. Math in double: float32
partial sums drift vs any double-precision oracle (same convention as
similarity_search / embedding dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_vectors(df: DataFrame, vec_col: str = "embedding", out_col: str | None = None) -> DataFrame:
    """L2-normalize an array column (zero vectors pass through unchanged)."""
    out_col = out_col or vec_col
    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)
    return df.withColumn(out_col, unit)


def group_centroids(
    df: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """(group, centroid: array<double>) — element-wise mean per group."""
    exploded = df.select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    means = exploded.groupBy("grp", "pos").agg(F.avg("val").alias("val"))
    return (
        means.groupBy("grp")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))),
                lambda s: s["val"],
            ).alias("centroid")
        )
        .select(F.col("grp").alias(group_col), "centroid")
    )


def group_centroids_long(
    df: DataFrame, group_col: str, vec_col: str = "embedding", decimals: int = 6
) -> DataFrame:
    """Centroids as scalar rows (group, pos, val) — the driver-contract
    shape (list cells break the driver canonicalizer), rounded for
    cross-engine float comparability."""
    exploded = df.select(
        F.col(group_col).alias(group_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    return exploded.groupBy(group_col, "pos").agg(
        F.round(F.avg("val"), decimals).alias("val")
    )
