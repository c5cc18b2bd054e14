"""Parallel Pivot correlation clustering (ClusterWild/KDD'14 family).

Connected components treat every scored edge as transitively conclusive:
a chain A~B~C forces {A,B,C} together even when A-C is strong negative
evidence.  Correlation clustering instead penalizes both cut "+" edges and
merged non-edges; the classic Pivot algorithm (Ailon-Charikar-Newman 2008;
3-approximation in expectation) picks a uniformly random node, clusters it
with its (remaining) neighbors, removes them, repeats.  Chierichetti,
Dalvi & Kumar (KDD 2014) showed rounds of LOCALLY-MINIMAL pivots preserve
the guarantee while needing only O(log n) rounds — that's what this
implements, DataFrame-native:

* the random order is pi(v) = xxhash64(lit(seed), v) — Spark's builtin
  seeded XXH64, replicated bit-for-bit in DuckDB by
  `contract.sql_kernels.xxh64_long_ctes` (so the driver oracle covers the
  WHOLE algorithm, randomness included);
* a round: every active node whose key (pi, id) is smaller than all its
  active neighbors' becomes a pivot (pivots form an independent set);
  every active neighbor of a pivot joins the adjacent pivot with the
  smallest key; clustered nodes leave the graph;
* after ``rounds`` rounds (default 12 — ~2^12 nodes' worth of expected
  progress) any still-active node becomes a singleton, deterministically,
  so the engine and the SQL replica agree even on non-converged inputs.

Every cluster is a STAR of its pivot: members are pivot-adjacent, so a
merged non-edge is at most one hop from the pivot — the property CC gives
up.  Per round: one hash-agg (neighbor min), one join (pivot adjacency),
two semi-joins (frontier shrink); the frontier localCheckpoints like the
CC loop.  No UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_clusters(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed: int = 42,
    rounds: int = 12,
) -> DataFrame:
    """Cluster the undirected "+"-edge graph -> (id, cluster_id).

    Covers nodes appearing in ``edges`` (callers union isolated records as
    singletons if desired).  cluster_id is the pivot's node id.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e0 = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    pi_of = lambda c: F.xxhash64(F.lit(seed).cast("long"), F.col(c))  # noqa: E731
    adj = sym.select(
        "src",
        "dst",
        pi_of("src").alias("spi"),
        pi_of("dst").alias("dpi"),
    ).localCheckpoint(eager=True)
    active = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("pi", pi_of("id"))
        .localCheckpoint(eager=True)
    )
    parts: list[DataFrame] = []
    for _ in range(rounds):
        if active.isEmpty():
            break
        nmin = adj.groupBy("src").agg(
            F.min(F.struct(F.col("dpi").alias("p"), F.col("dst").alias("i"))).alias(
                "nk"
            )
        )
        pivots = (
            active.join(nmin, active["id"] == nmin["src"], "left")
            .where(
                F.col("nk").isNull()
                | (
                    F.struct(F.col("pi").alias("p"), F.col("id").alias("i"))
                    < F.col("nk")
                )
            )
            .select("id")
        )
        assigned = (
            adj.join(
                pivots.select(F.col("id").alias("__p")),
                adj["dst"] == F.col("__p"),
                "inner",
            )
            .groupBy("src")
            .agg(
                F.min(
                    F.struct(F.col("dpi").alias("p"), F.col("dst").alias("i"))
                ).alias("mk")
            )
            .select(F.col("src").alias("id"), F.col("mk.i").alias("cluster_id"))
        )
        clustered = (
            pivots.select("id", F.col("id").alias("cluster_id"))
            .unionByName(assigned)
            .localCheckpoint(eager=True)
        )
        parts.append(clustered)
        gone = clustered.select("id")
        active = active.join(gone, "id", "left_anti").localCheckpoint(eager=True)
        keep = active.select("id")
        adj = (
            adj.join(keep, adj["src"] == keep["id"], "left_semi")
            .join(keep, adj["dst"] == keep["id"], "left_semi")
            .localCheckpoint(eager=True)
        )
    out = active.select("id", F.col("id").alias("cluster_id"))
    for p in parts:
        out = out.unionByName(p)
    return out
