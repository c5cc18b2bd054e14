"""Privacy-risk audits for training-data curation.

PII redaction (functions/text.py redact_pii_col) removes direct
identifiers; this module measures the RE-identification risk that remains
through quasi-identifier combinations: k-anonymity (Sweeney 2002 — every
QI combination must be shared by >= k records) and distinct-value
l-diversity (Machanavajjhala et al. 2007 — each QI group must carry >= l
distinct sensitive values, or the group's sensitive attribute leaks even
when k holds).

Plan shape: one hash aggregate over the quasi-identifier key (map-side
partial combine; no joins, no pairs) — the audit of a 100 TB table costs
one shuffle of group-sized rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    sensitive_col: str | None = None,
    l: int | None = None,
) -> DataFrame:
    """Per-QI-group audit: the quasi columns, ``group_size``,
    ``k_anonymous`` (group_size >= k), and — when ``sensitive_col`` is given
    — ``n_sensitive`` (distinct sensitive values, NULL counted as a value)
    plus ``l_diverse`` (n_sensitive >= l; requires ``l``)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    if (sensitive_col is None) != (l is None):
        raise ValueError("sensitive_col and l must be given together")
    aggs = [F.count(F.lit(1)).alias("group_size")]
    if sensitive_col is not None:
        if l < 1:
            raise ValueError("l must be >= 1")
        # count_distinct ignores NULLs; a NULL sensitive value is still a
        # disclosure-relevant value, so count it as one extra when present
        aggs.append(
            (
                F.count_distinct(F.col(sensitive_col))
                + F.max(F.when(F.col(sensitive_col).isNull(), 1).otherwise(0))
            ).alias("n_sensitive")
        )
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out = out.withColumn("k_anonymous", F.col("group_size") >= k)
    if sensitive_col is not None:
        out = out.withColumn("l_diverse", F.col("n_sensitive") >= l)
    return out


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """One row: (n_records, n_groups, n_violating_groups, records_at_risk,
    min_group_size, risk_fraction round-6) — the corpus-level gate a release
    pipeline checks before publishing."""
    rep = k_anonymity_report(df, quasi_cols, k)
    return rep.agg(
        F.coalesce(F.sum("group_size"), F.lit(0)).alias("n_records"),
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(
            F.sum(F.when(~F.col("k_anonymous"), 1).otherwise(0)), F.lit(0)
        ).alias("n_violating_groups"),
        F.coalesce(
            F.sum(F.when(~F.col("k_anonymous"), F.col("group_size")).otherwise(0)),
            F.lit(0),
        ).alias("records_at_risk"),
        F.min("group_size").alias("min_group_size"),
    ).select(
        "n_records",
        "n_groups",
        "n_violating_groups",
        "records_at_risk",
        "min_group_size",
        F.round(
            F.when(
                F.col("n_records") > 0,
                F.col("records_at_risk") / F.col("n_records").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("risk_fraction"),
    )
