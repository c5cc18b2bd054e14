"""Survivorship: merge each entity cluster into one golden record.

The reference's consolidation stage picks a whole representative row per
cluster (operators/consolidation.py `canonical_entities`, citing
/root/reference/src/entity_resolution/entity_resolution.py's canonical
labels).  Production MDM/ER systems go one step further: FIELD-LEVEL
survivorship, where each attribute of the golden record is chosen by its
own merge rule — modal value for categorical fields, longest for free
text, numeric extremes for measures.  This module implements the four
standard rules as one hash-aggregate pass per field over the
cluster-joined records:

  majority  modal non-null value; ties broken (count DESC, value ASC)
  longest   longest non-null string; ties broken (length DESC, value ASC)
  max/min   numeric extreme (nulls ignored by the aggregate)

Scale shape: the records frame joins the assignment frame once
(shuffle_hash on the id — both sides are corpus-sized), then every rule is
either a plain groupBy aggregate (longest/max/min — `min(struct(-len, v))`
keeps it a single partial-aggregable pass, no window) or a value census +
per-cluster argmax window (majority — the window input is one row per
DISTINCT (cluster, value), already collapsed by the census, so the sort is
over cluster cardinalities, not corpus rows).  Per-field frames are
cluster-sized and join back on cluster_id.

Null semantics are pinned for cross-engine parity: nulls are excluded
before ranking (Spark orders NULL FIRST asc, DuckDB NULL LAST — excluding
them sidesteps the divergence) and a cluster whose field is entirely null
gets NULL via the final left join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RULES = ("majority", "longest", "max", "min")


def golden_records(
    assignments: DataFrame,
    records: DataFrame,
    rules: dict[str, str],
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One row per cluster_id with each field merged by its rule."""
    for f, rule in rules.items():
        if rule not in RULES:
            raise ValueError(f"unknown survivorship rule {rule!r} for field {f!r}")
    j = assignments.select(id_col, cluster_col).join(
        records.select(id_col, *rules).hint("shuffle_hash"), id_col
    )
    j = j.persist()
    outs = []
    for f, rule in rules.items():
        nn = j.where(F.col(f).isNotNull())
        if rule == "majority":
            cnt = nn.groupBy(cluster_col, f).agg(F.count(F.lit(1)).alias("__c"))
            w = Window.partitionBy(cluster_col).orderBy(
                F.col("__c").desc(), F.col(f).asc()
            )
            sel = (
                cnt.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") == 1)
                .select(cluster_col, f)
            )
        elif rule == "longest":
            sel = nn.groupBy(cluster_col).agg(
                F.min(
                    F.struct((-F.length(F.col(f))).alias("__a"), F.col(f).alias("__v"))
                )["__v"].alias(f)
            )
        elif rule == "max":
            sel = nn.groupBy(cluster_col).agg(F.max(f).alias(f))
        else:  # min
            sel = nn.groupBy(cluster_col).agg(F.min(f).alias(f))
        outs.append(sel)
    base = j.select(cluster_col).distinct()
    return reduce(lambda a, b: a.join(b, cluster_col, "left"), outs, base)
