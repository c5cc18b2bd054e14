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
