"""Declarative data-quality expectations (the Great Expectations /
Deequ role): assert properties of a table and get a per-rule violation
report instead of a silent bad pipeline run.

Supported rule kinds:
  not_null  — column has no NULLs
  unique    — column values are distinct (NULLs count as values)
  in_set    — every non-NULL value is one of ``values``
  range     — every non-NULL value is within [lo, hi] (either bound
              optional)
  regex     — every non-NULL value fully matches ``pattern``

Each rule reduces to one aggregate over the table; the report is the
union of rule-sized rows (a handful), so checking a 100 TB table costs
one scan per rule group and shuffles nothing but counters. ``unique``
is the exception by nature — it needs the value census — and still
aggregates by the checked column only.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = ("not_null", "unique", "in_set", "range", "regex")


def check_expectations(
    df: DataFrame,
    rules: Sequence[Mapping],
) -> DataFrame:
    """(rule_name, column, kind, n_rows, n_violations, passed) — one row
    per rule, deterministic order by rule_name via the final sort key
    being data, not plan, order (callers sort as needed)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    parts = []
    for r in rules:
        kind = r.get("kind")
        col = r.get("column")
        name = r.get("name", f"{kind}:{col}")
        if kind not in _KINDS:
            raise ValueError(f"unknown rule kind: {kind!r} (one of {_KINDS})")
        if not col:
            raise ValueError(f"rule {name!r} needs a column")
        c = F.col(col)
        if kind == "not_null":
            viol = F.sum(F.when(c.isNull(), 1).otherwise(0))
            agg = df.agg(F.count(F.lit(1)).alias("n_rows"), viol.alias("n_violations"))
        elif kind == "unique":
            # violations = rows beyond the first of each duplicated value;
            # count(*) - count(distinct) misses NULL groups, so census it
            census = df.groupBy(c.alias("__v")).agg(F.count(F.lit(1)).alias("__n"))
            agg = census.agg(
                F.coalesce(F.sum("__n"), F.lit(0)).alias("n_rows"),
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n_violations"),
            )
        elif kind == "in_set":
            values = list(r["values"])
            viol = F.sum(
                F.when(c.isNotNull() & ~c.isin(values), 1).otherwise(0)
            )
            agg = df.agg(F.count(F.lit(1)).alias("n_rows"), viol.alias("n_violations"))
        elif kind == "range":
            lo, hi = r.get("lo"), r.get("hi")
            if lo is None and hi is None:
                raise ValueError(f"rule {name!r} needs lo and/or hi")
            bad = F.lit(False)
            if lo is not None:
                bad = bad | (c < F.lit(lo))
            if hi is not None:
                bad = bad | (c > F.lit(hi))
            viol = F.sum(F.when(c.isNotNull() & bad, 1).otherwise(0))
            agg = df.agg(F.count(F.lit(1)).alias("n_rows"), viol.alias("n_violations"))
        else:  # regex
            pat = r["pattern"]
            viol = F.sum(
                F.when(c.isNotNull() & ~c.rlike(pat), 1).otherwise(0)
            )
            agg = df.agg(F.count(F.lit(1)).alias("n_rows"), viol.alias("n_violations"))
        parts.append(
            agg.select(
                F.lit(name).alias("rule_name"),
                F.lit(col).alias("column"),
                F.lit(kind).alias("kind"),
                F.col("n_rows").cast("long"),
                F.col("n_violations").cast("long"),
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
