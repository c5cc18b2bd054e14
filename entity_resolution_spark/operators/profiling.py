"""Data-profiling operators: functional-dependency checks, primary-key
candidate discovery, and inclusion-dependency (foreign-key candidate)
discovery (engine-added; extends the reference's schema-profiling surface —
/root/reference/src/entity_resolution/schema_matching.py profiles single
columns, these profile the relationships BETWEEN columns and tables that a
schema matcher consumes next).

Scale shape: every check is a hash aggregate or an anti-join on the checked
key — no sorts, no windows, no data-sized driver state. Outputs are one row
per checked candidate (driver-scale), so these run as cheap census passes
even on 100 TB fact tables, and each candidate's aggregate is expressed so
Catalyst fuses the whole list into one scan where the inputs coincide.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_profile(
    df: DataFrame, candidates: Sequence[tuple[Sequence[str], str]]
) -> DataFrame:
    """For each candidate functional dependency ``lhs -> rhs``, report how
    badly it is violated: the number of lhs groups, the number of groups
    holding more than one distinct rhs value, and the worst group's distinct
    count. ``holds`` is true iff no group violates.

    One hash aggregate per candidate (groupBy lhs, count distinct rhs),
    then a 1-row reduction — never materializes violating rows.
    """
    outs = []
    for lhs, rhs in candidates:
        lhs = list(lhs)
        per_group = df.groupBy(*lhs).agg(
            F.count_distinct(F.col(rhs)).alias("_ndv")
        )
        outs.append(
            per_group.agg(
                F.lit(",".join(lhs) + " -> " + rhs).alias("dependency"),
                F.count("*").alias("n_groups"),
                F.sum((F.col("_ndv") > 1).cast("long")).alias("n_violating"),
                F.max("_ndv").alias("max_distinct_rhs"),
                (F.max("_ndv") <= 1).alias("holds"),
            )
        )
    return reduce(DataFrame.unionByName, outs)


def pk_candidates(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per column: exact distinct count, null count, and whether the column
    is a primary-key candidate (all values distinct, none null).

    All columns profile in ONE aggregate over one scan (count_distinct is
    exact here — candidate detection cannot tolerate approximation).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs.append(F.count_distinct(F.col(c)).alias(f"_ndv_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
    wide = df.agg(*aggs)
    per_col = [
        wide.select(
            F.lit(c).alias("column_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_ndv_{c}").alias("n_distinct"),
            F.col(f"_null_{c}").alias("n_nulls"),
            (
                (F.col(f"_ndv_{c}") == F.col("_n")) & (F.col(f"_null_{c}") == 0)
            ).alias("is_pk_candidate"),
        )
        for c in cols
    ]
    return reduce(DataFrame.unionByName, per_col)


def inclusion_deps(
    pairs: Sequence[tuple[DataFrame, str, DataFrame, str, str]]
) -> DataFrame:
    """For each ``(child_df, child_col, parent_df, parent_col, label)``:
    does every non-null child value appear in the parent column (i.e. is
    this a foreign-key candidate)? Reports the child's distinct count, how
    many distinct child values are missing from the parent, and ``holds``.

    Each check is distinct-collapse on both sides then a LEFT ANTI join on
    the key — the join carries only the key column, and the anti side
    builds from the parent's distinct set.
    """
    outs = []
    for child, ccol, parent, pcol, label in pairs:
        cvals = child.select(F.col(ccol).alias("_k")).where(
            F.col(ccol).isNotNull()
        ).distinct()
        pvals = parent.select(F.col(pcol).alias("_k")).distinct()
        missing = cvals.join(pvals, "_k", "left_anti")
        outs.append(
            cvals.agg(F.count("*").alias("n_child_distinct")).crossJoin(
                missing.agg(F.count("*").alias("n_missing"))
            ).select(
                F.lit(label).alias("dependency"),
                "n_child_distinct",
                "n_missing",
                (F.col("n_missing") == 0).alias("holds"),
            )
        )
    return reduce(DataFrame.unionByName, outs)
