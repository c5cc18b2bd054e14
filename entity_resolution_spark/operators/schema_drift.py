"""Schema + column-statistics drift between two snapshots of a table.

Upstream producers change schemas and distributions without telling
anyone; this is the standard contract check a nightly pipeline runs
before trusting a new drop: which columns appeared/disappeared, which
changed type, and how far each surviving column's null rate and
cardinality moved (the token_drift / embedding_drift operators' cousin
at the SCHEMA level).

Cost: one aggregate scan per side computing every column's null count
and exact distinct count at once (Spark expands multi-distinct into one
pass per distinct column group — columns, not rows, drive the cost),
collected as two one-row control-plane frames; the report itself is
column-count-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schema_drift_report(old: DataFrame, new: DataFrame) -> DataFrame:
    """One row per column in either snapshot: (column, status
    added|removed|common, type_old, type_new, type_changed,
    null_rate_old, null_rate_new, null_rate_delta round-6,
    distinct_old, distinct_new). Rates are NULL for the side the column
    is missing from."""
    spark = old.sparkSession
    types_old = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    types_new = {f.name: f.dataType.simpleString() for f in new.schema.fields}

    def _stats(df: DataFrame, cols: list[str]) -> dict:
        if not cols:
            return {"__n": df.count()}
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"))
            aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        return df.agg(*aggs).collect()[0].asDict()

    s_old = _stats(old, list(types_old))
    s_new = _stats(new, list(types_new))
    rows = []
    for c in sorted(set(types_old) | set(types_new)):
        in_old, in_new = c in types_old, c in types_new
        status = "common" if in_old and in_new else ("removed" if in_old else "added")
        nro = (
            round(s_old[f"__null_{c}"] / s_old["__n"], 6)
            if in_old and s_old["__n"]
            else None
        )
        nrn = (
            round(s_new[f"__null_{c}"] / s_new["__n"], 6)
            if in_new and s_new["__n"]
            else None
        )
        rows.append(
            (
                c,
                status,
                types_old.get(c),
                types_new.get(c),
                in_old and in_new and types_old[c] != types_new[c],
                nro,
                nrn,
                round(nrn - nro, 6) if nro is not None and nrn is not None else None,
                int(s_old[f"__dist_{c}"]) if in_old else None,
                int(s_new[f"__dist_{c}"]) if in_new else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "column string, status string, type_old string, type_new string, "
        "type_changed boolean, null_rate_old double, null_rate_new double, "
        "null_rate_delta double, distinct_old long, distinct_new long",
    )
