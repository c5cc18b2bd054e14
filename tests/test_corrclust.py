"""Pivot correlation clustering: XXH64 parity, structural guarantees,
and bit-for-bit agreement with the unrolled DuckDB replica."""

import duckdb
import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.contract.sql_kernels import (
    pivot_clusters_ctes,
    spark_xxhash64_seed,
    xxh64_long_py,
)
from entity_resolution_spark.operators.corrclust import pivot_clusters


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def test_xxh64_chain_matches_spark(spark):
    """pi(v) = xxhash64(lit(seed), v) == xxh64_long(v, chained-seed) —
    the identity the SQL replica (and its folded constant) relies on."""
    ids = [0, 1, 2, 42, -1, -42, 123456789, 2**62, -(2**62), 999983]
    got = {
        r["id"]: r["h"]
        for r in spark.createDataFrame([(i,) for i in ids], "id long")
        .select("id", F.xxhash64(F.lit(7).cast("long"), F.col("id")).alias("h"))
        .collect()
    }
    h1 = spark_xxhash64_seed(7)
    for i in ids:
        assert _signed(xxh64_long_py(i, h1)) == got[i], i


# path + triangle + isolated-pair graph: exercises pivots with and without
# neighbors, multi-round shrinkage, and the singleton fallback.
_EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]


def _clusters(spark, seed=42, rounds=12):
    e = spark.createDataFrame(_EDGES, "src long, dst long")
    return {
        r["id"]: r["cluster_id"]
        for r in pivot_clusters(e, seed=seed, rounds=rounds).collect()
    }


def test_pivot_partition_and_star_property(spark):
    lab = _clusters(spark)
    nodes = sorted({x for e in _EDGES for x in e})
    assert sorted(lab) == nodes  # every node exactly once
    adj = {frozenset(e) for e in _EDGES}
    for v, c in lab.items():
        # star property: members are pivot-adjacent (CC gives this up)
        assert v == c or frozenset((v, c)) in adj, (v, c)
    # pivots form an independent set
    pivots = {c for c in lab.values()}
    for p in pivots:
        assert lab[p] == p  # a pivot is its own cluster
    for a in pivots:
        for b in pivots:
            if a < b:
                assert frozenset((a, b)) not in adj


def test_pivot_deterministic_and_seed_sensitive(spark):
    assert _clusters(spark, seed=42) == _clusters(spark, seed=42)
    # some seed in a small pool must reshuffle the pivot order
    base = _clusters(spark, seed=42)
    assert any(_clusters(spark, seed=s) != base for s in (1, 2, 3, 4, 5))


def test_pivot_singleton_fallback_round_limit(spark):
    """rounds=1 leaves unclustered actives; they become deterministic
    singletons — engine and replica agree even on non-converged inputs."""
    lab = _clusters(spark, rounds=1)
    nodes = sorted({x for e in _EDGES for x in e})
    assert sorted(lab) == nodes


def test_pivot_matches_duckdb_replica(spark):
    vals = ", ".join(f"({a}, {b})" for a, b in _EDGES)
    for seed, rounds in [(42, 12), (7, 1), (3, 4)]:
        sql = f"""
        WITH edges0(a, b) AS (VALUES {vals}),
        {pivot_clusters_ctes("edges0", rounds=rounds, seed=seed)}
        SELECT id, cluster_id FROM __pivot_out ORDER BY id
        """
        oracle = duckdb.sql(sql).fetchall()
        got = sorted(_clusters(spark, seed=seed, rounds=rounds).items())
        assert got == [(a, b) for a, b in oracle], (seed, rounds)


def test_pivot_rejects_bad_rounds(spark):
    e = spark.createDataFrame(_EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pivot_clusters(e, rounds=0)
