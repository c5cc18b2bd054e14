"""Canopy clustering (McCallum, Nigam & Ungar, KDD 2000) — overlapping
cheap-metric blocking.

Canopies use two thresholds over a CHEAP similarity: T2 (tight) removes
points from the candidate pool, T1 (loose, T1 <= T2) grants canopy
membership; every point can belong to several canopies, and the
expensive metric then runs only within canopies.

The textbook algorithm is a sequential greedy sweep (pick the next
remaining point as a center, remove its T2-neighbors). Run here as
parallel LOCAL-MINIMA rounds: every remaining point with no smaller-id
remaining T2-neighbor becomes a center simultaneously, then all their
T2-neighborhoods leave the pool. This computes EXACTLY the sequential
min-id-order greedy result (the lexicographically-first maximal
independent-ish cover — Blelloch et al., SPAA 2012 analysis: the round
count is O(log^2 n) w.h.p.), so the operator is deterministic and
oracle-able while each round is two distributed anti-joins, never a
driver-side sweep. Per-round driver work is one empty-check count — a
control-plane scalar, the clustering.py CC convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canopy_assignments(
    records: DataFrame,
    pairs: DataFrame,
    t1: float,
    t2: float,
    id_col: str = "id",
    left_col: str = "left_id",
    right_col: str = "right_id",
    score_col: str = "score",
    max_rounds: int = 200,
) -> DataFrame:
    """(id, canopy_id, is_center) membership rows — ``canopy_id`` is the
    center's id; a point joins every canopy whose center scores >= t1
    against it (overlap is the point of canopies), and every point
    belongs to >= 1 canopy because removal requires a >= t2 >= t1 edge
    to a center. ``pairs`` is the cheap-metric scored pair frame
    (symmetric pairs expected once in either orientation)."""
    if not t1 <= t2:
        raise ValueError("need t1 <= t2 (T1 loose/membership, T2 tight/removal)")
    nodes = records.select(F.col(id_col).alias("id")).distinct().localCheckpoint(
        eager=True
    )
    sym = pairs.select(
        F.col(left_col).alias("a"), F.col(right_col).alias("b"), F.col(score_col)
    ).unionAll(
        pairs.select(
            F.col(right_col).alias("a"), F.col(left_col).alias("b"), F.col(score_col)
        )
    )
    t1_edges = sym.where(F.col(score_col) >= t1).select("a", "b").distinct()
    t2_edges = t1_edges.join(
        sym.where(F.col(score_col) >= t2).select("a", "b").distinct(),
        ["a", "b"],
        "left_semi",
    ).localCheckpoint(eager=True)

    remaining = nodes
    centers = None
    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        live = t2_edges.join(
            remaining.withColumnRenamed("id", "a").hint("shuffle_hash"), "a"
        ).join(remaining.withColumnRenamed("id", "b").hint("shuffle_hash"), "b")
        # a point stays out of this round's centers iff a SMALLER-id
        # remaining T2-neighbor exists
        blocked = live.where(F.col("a") < F.col("b")).select(F.col("b").alias("id"))
        round_centers = remaining.join(blocked, "id", "left_anti").localCheckpoint(
            eager=True
        )
        covered = (
            live.join(
                round_centers.withColumnRenamed("id", "a").hint("shuffle_hash"), "a"
            )
            .select(F.col("b").alias("id"))
            .unionAll(round_centers)
            .distinct()
        )
        remaining = remaining.join(covered, "id", "left_anti").localCheckpoint(
            eager=True
        )
        centers = (
            round_centers if centers is None else centers.unionAll(round_centers)
        ).localCheckpoint(eager=True)
    else:
        raise RuntimeError(f"canopy selection did not converge in {max_rounds} rounds")

    member = (
        t1_edges.join(
            centers.withColumnRenamed("id", "b").hint("shuffle_hash"), "b"
        )
        .select(F.col("a").alias("id"), F.col("b").alias("canopy_id"))
        .unionAll(centers.select(F.col("id"), F.col("id").alias("canopy_id")))
        .distinct()
    )
    return member.withColumn("is_center", F.col("id") == F.col("canopy_id"))
