"""DBSCAN structural guarantees on a hand-built vector set."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.dbscan import dbscan_clusters


@pytest.fixture(scope="module")
def labeled(spark):
    # two dense blobs on orthogonal axes + one bridge-ish stray + isolates
    def v(axis, eps, dim=8):
        x = [0.0] * dim
        x[axis] = 1.0
        x[(axis + 4) % dim] = eps
        return x

    rows = (
        [(i, v(0, 0.01 * i)) for i in range(4)]  # blob A: ids 0-3
        + [(10 + i, v(1, 0.01 * i)) for i in range(4)]  # blob B: ids 10-13
        + [(20, [0.7, 0.7, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0])]  # between A and B
        + [(30, [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0])]  # isolated
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dbscan_clusters(
        emb, min_cosine=0.9, min_pts=2, n_planes=2, n_tables=8, seed=42
    )
    return {r["vec_id"]: (r["role"], r["cluster_id"]) for r in out.collect()}


def test_dbscan_roles_and_clusters(labeled):
    assert len(labeled) == 10  # every input vector labeled
    # dense blobs are cores of two distinct clusters
    a = {labeled[i] for i in range(4)}
    b = {labeled[10 + i] for i in range(4)}
    assert all(role == "core" for role, _ in a | b)
    assert len({c for _, c in a}) == 1 and len({c for _, c in b}) == 1
    assert {c for _, c in a} != {c for _, c in b}
    # cluster label is the component-min core id
    assert labeled[0][1] == 0 and labeled[10][1] == 10


def test_dbscan_noise_unclustered(labeled):
    role, cid = labeled[30]
    assert role == "noise" and cid is None
    # the in-between vector is not similar enough (cos < 0.9) to either blob
    role20, _ = labeled[20]
    assert role20 == "noise"


def test_dbscan_min_pts_gates_core(spark):
    # a single similar pair: degree 1 < min_pts=2 -> nobody is core
    rows = [(0, [1.0, 0.0]), (1, [0.999, 0.01]), (2, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dbscan_clusters(
        emb, min_cosine=0.9, min_pts=2, n_planes=2, n_tables=4, seed=1
    )
    roles = {r["vec_id"]: r["role"] for r in out.collect()}
    assert set(roles.values()) == {"noise"}
