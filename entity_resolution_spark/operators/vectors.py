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


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    code_col: str = "codes",
    scale_col: str = "scale",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric scalar quantization: ``scale = max|x| / qmax``,
    ``codes[i] = round(x[i] / scale)`` in ``[-qmax, qmax]`` — 4x storage
    over float32 at 8 bits, the standard at-rest format for 100 TB
    embedding tables (dequant = codes * scale). Pure JVM expressions, no
    shuffle; zero vectors get scale 0 and all-zero codes."""
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    qmax = float((1 << (bits - 1)) - 1)
    v = F.col(vec_col).cast("array<double>")
    amax = F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(qmax)).otherwise(F.lit(0.0))
    df = df.withColumn(scale_col, scale)
    codes = F.when(
        F.col(scale_col) > 0,
        F.transform(v, lambda x: F.round(x / F.col(scale_col), 0).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.withColumn(code_col, codes)


def dequantize_cosine(codes_a, scale_a, codes_b, scale_b):
    """Cosine of two quantized vectors — scales cancel in the cosine, so
    this is exactly the integer-code cosine (all math in double)."""
    a = F.transform(codes_a, lambda x: x.cast("double"))
    b = F.transform(codes_b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(-1.0))


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, pos, coord) — Johnson-Lindenstrauss random projection of an
    embedding column to ``out_dim`` dimensions (seeded Gaussian planes,
    scaled 1/sqrt(out_dim) so pairwise distances are preserved in
    expectation). The standard 100 TB cost-reducer in front of ANN /
    clustering: a 64-d corpus projected to 16-d cuts every downstream
    matmul, shuffle, and index 4x while keeping near-neighbor ranking
    approximately intact (JL lemma).

    Pure-JVM map-only projection: each output coordinate is a sequential
    index-order dot product (`F.zip_with` + `F.aggregate`) against a plane
    of inlined literals — no Python in the path, no shuffle, and the same
    op order as DuckDB's list_dot_product, so the round-6 coords are
    engine-independent. Output is exploded to scalar (id, pos, coord) rows
    (the driver-hash convention for vector-valued results); reassemble
    with collect_list over pos when an array column is wanted.
    """
    import numpy as np

    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    if dim_row is None or dim_row["d"] is None:
        return emb.sparkSession.createDataFrame([], f"{id_col} long, pos int, coord double")
    dim = int(dim_row["d"])
    planes = np.random.RandomState(seed).normal(size=(out_dim, dim)) / np.sqrt(out_dim)

    vec_d = F.col(vec_col).cast("array<double>")
    coords = F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        vec_d,
                        F.array(*[F.lit(float(p)) for p in planes[j]]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            )
            for j in range(out_dim)
        ]
    )
    return emb.select(F.col(id_col), F.posexplode(coords).alias("pos", "coord"))


def random_projection_planes(out_dim: int, dim: int, seed: int = 42):
    """The exact plane matrix `random_projection` uses (for oracles/tests)."""
    import numpy as np

    return np.random.RandomState(seed).normal(size=(out_dim, dim)) / np.sqrt(out_dim)
