"""operators/vectors.py behavior."""

import math

from entity_resolution_spark.operators.vectors import (
    group_centroids,
    group_centroids_long,
    normalize_vectors,
)


def _emb(spark):
    rows = [
        (1, "a", [1.0, 0.0, 0.0]),
        (2, "a", [0.0, 1.0, 0.0]),
        (3, "b", [3.0, 4.0, 0.0]),
        (4, "b", [0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")


def test_normalize_unit_length_and_zero_passthrough(spark):
    out = {r["vec_id"]: r["embedding"] for r in normalize_vectors(_emb(spark)).collect()}
    assert abs(math.sqrt(sum(x * x for x in out[3])) - 1.0) < 1e-12
    assert out[4] == [0.0, 0.0, 0.0]


def test_group_centroids_elementwise_mean(spark):
    cents = {r["label"]: r["centroid"] for r in group_centroids(_emb(spark), "label").collect()}
    assert cents["a"] == [0.5, 0.5, 0.0]
    assert cents["b"] == [1.5, 2.0, 0.0]


def test_long_form_matches_array_form(spark):
    df = _emb(spark)
    arr = {(r["label"], i): v for r in group_centroids(df, "label").collect()
           for i, v in enumerate(r["centroid"])}
    long = {(r["label"], r["pos"]): r["val"] for r in group_centroids_long(df, "label").collect()}
    assert set(arr) == set(long)
    assert all(abs(arr[k] - long[k]) < 1e-6 for k in arr)


def test_quantize_roundtrip_and_cosine(spark):
    import numpy as np

    from entity_resolution_spark.operators.vectors import (
        dequantize_cosine,
        quantize_embeddings,
    )
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(20)]
    rows.append((99, [0.0] * 16))  # zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = quantize_embeddings(df).collect()
    by_id = {r.vec_id: r for r in q}
    # codes bounded, zero vector -> scale 0 / all-zero codes
    for r in q:
        assert all(-127 <= c <= 127 for c in r.codes)
    assert by_id[99].scale == 0.0 and set(by_id[99].codes) == {0}
    # dequant reconstruction error bounded by scale/2 per element
    for r in q:
        if r.scale == 0:
            continue
        for orig, code in zip(r.embedding, r.codes):
            assert abs(orig - code * r.scale) <= r.scale / 2 + 1e-12
    # int8 cosine tracks the float cosine within quantization noise
    qd = quantize_embeddings(df).select("vec_id", "embedding", "codes", "scale")
    a = qd.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("ea"), F.col("codes").alias("ca"), F.col("scale").alias("sa")
    )
    b = qd.filter(F.col("vec_id") == 1).select(
        F.col("embedding").alias("eb"), F.col("codes").alias("cb"), F.col("scale").alias("sb")
    )
    pair = a.crossJoin(b)
    row = pair.select(
        dequantize_cosine(F.col("ca"), F.col("sa"), F.col("cb"), F.col("sb")).alias("qcos")
    ).collect()[0]
    va = np.array(rows[0][1]); vb = np.array(rows[1][1])
    fcos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
    assert abs(row.qcos - fcos) < 0.02


def test_random_projection_matches_sequential_dot(spark):
    import numpy as np

    from entity_resolution_spark.operators.vectors import (
        random_projection,
        random_projection_planes,
    )

    rows = [(i, "x", [float((i * j) % 7) - 3.0 for j in range(8)]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    out = {(r["vec_id"], r["pos"]): r["coord"] for r in random_projection(df, out_dim=4, seed=7).collect()}
    planes = random_projection_planes(4, 8, seed=7)
    for i, _, v in rows:
        for j in range(4):
            acc = 0.0
            for a, b in zip(v, planes[j]):
                acc += a * b
            assert out[(i, j)] == round(acc, 6), (i, j)


def test_random_projection_preserves_neighbor_ranking(spark):
    import numpy as np

    from entity_resolution_spark.operators.vectors import random_projection

    rng = np.random.RandomState(0)
    base = rng.normal(size=64)
    near = base + rng.normal(scale=0.05, size=64)
    far = rng.normal(size=64)
    rows = [(0, "x", base.tolist()), (1, "x", near.tolist()), (2, "x", far.tolist())]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    red = random_projection(df, out_dim=16, seed=42).collect()
    vecs = {}
    for r in red:
        vecs.setdefault(r["vec_id"], [0.0] * 16)[r["pos"]] = r["coord"]
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    assert cos(vecs[0], vecs[1]) > cos(vecs[0], vecs[2])
