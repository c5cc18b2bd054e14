"""Incremental view maintenance for distributive aggregates.

A standing grouped aggregate (counts, sums, and anything derived from
them — avg, rates) over a 100 TB fact table must not be recomputed from
scratch when a delta of inserts and retractions arrives. Counts and sums
are DISTRIBUTIVE: the maintained view is exactly

    merge(base_partials, +insert_partials, -delete_partials)

so maintenance costs one hash aggregate over the DELTA plus one merge
keyed on the (small) group domain — the base facts are never rescanned.
This module provides that algebra as plain DataFrame ops; it is the
batch analogue of the streaming update-mode aggregates in streaming/ and
the delta-proportional contract of plans/incremental.py.

Exactness note: over integer/decimal columns the maintained result is
bit-equal to a full recompute (addition is associative); over float
columns it agrees only up to summation order — cast to decimal first
when downstream equality checks are exact (the contract query does).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def aggregate_partials(
    facts: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    sign: int = 1,
) -> DataFrame:
    """Distributive partials per group: (group_cols..., __cnt,
    sum_<col>...), each multiplied by ``sign`` (+1 inserts, -1
    retractions). One map-side-combinable hash aggregate over the input.
    """
    if sign not in (1, -1):
        raise ValueError("sign must be +1 or -1")
    aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]
    out = facts.groupBy(*group_cols).agg(*aggs)
    if sign == -1:
        out = out.select(
            *group_cols,
            (-F.col("__cnt")).alias("__cnt"),
            *[(-F.col(f"sum_{c}")).alias(f"sum_{c}") for c in sum_cols],
        )
    return out


def merge_partials(
    partials: Sequence[DataFrame],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Merge signed partial frames into the maintained view: union (a
    no-shuffle concat), one hash aggregate on the group key, and a
    ``__cnt > 0`` filter that retires fully-retracted groups. Groups
    whose rows were all retracted disappear exactly as a recompute would
    drop them.
    """
    frames = list(partials)
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    return (
        merged.groupBy(*group_cols)
        .agg(
            F.sum("__cnt").alias("__cnt"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
        .filter(F.col("__cnt") > 0)
    )


def maintain_aggregate(
    base_partials: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Fold an (inserts, deletes) delta into standing base partials.
    Cost: two delta-sized hash aggregates + one group-domain merge; the
    base facts are untouched. Returns (group_cols..., __cnt, sum_*...).
    """
    plus = aggregate_partials(inserts, group_cols, sum_cols, sign=1)
    minus = aggregate_partials(deletes, group_cols, sum_cols, sign=-1)
    return merge_partials([base_partials, plus, minus], group_cols, sum_cols)
