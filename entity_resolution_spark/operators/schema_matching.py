"""Column-level schema matching — the reference's flagship capability
re-expressed Spark-first.

Reference semantics carried (SURVEY.md §3.1, §2):
- ``find_similar_columns(df1, df2, threshold=80)``
  (/root/reference/src/entity_resolution/entity_resolution.py:213-351):
  describe every column, score description pairs with fuzz.ratio, keep
  pairs >= threshold, sort best-first. The reference's per-column LLM call
  (:194-208) is replaced by a deterministic description derived from the
  normalized column name and a data-driven enhanced dtype — same shape
  (dict[col -> text]), no network, reproducible.
- ``get_enhanced_dtype`` (:374-416): {empty, numeric, numeric_string,
  datetime, boolean, categorical, text} — re-derived here from ONE Spark
  aggregation pass per DataFrame (try_cast null-rates + approx distinct
  counts), instead of pandas probes per column.
- ``analyze_data_type_compatibility`` (:418-479): compatibility matrix and
  convertibility rules preserved verbatim as semantics (numeric-numeric
  100, empty-empty 0, numeric-text default 30 < 70 ⇒ incompatible...).
- ``_calculate_value_overlap`` (:481-566): distinct-set Jaccard + overlap%
  (|∩| / max(|A|,|B|) * 100).
- ``validate_column_matches`` (:568-776): seeded 1000-row sample, weighted
  blend 0.40 semantic / 0.35 type / 0.25 overlap, flags
  (INCOMPATIBLE_DATA_TYPES, LOW_VALUE_OVERLAP, HIGH_NULL_RATE_*,
  COLUMN_NOT_FOUND), tiered recommendation, sort by score desc.

Scale notes: column *metadata* loops are driver-side (a schema has
hundreds of columns, not billions); every per-ROW computation — dtype
probes, null rates, distinct counts — is a single Spark aggregate over all
columns at once, so the data passes once regardless of column count.
Validation works on a seeded bounded sample exactly like the reference
(sample_size=1000, seed 42), making it control-plane by construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import (
    DEFAULT_SIMILARITY_THRESHOLD,
    DEFAULT_VALIDATION_SAMPLE,
    DEFAULT_VALIDATION_SEED,
)
from ..functions.similarity import fuzz_ratio

_BOOL_VALUES = {"true", "false", "1", "0", "yes", "no"}

# (type1, type2) -> score; symmetric lookup; unmatched -> 30
COMPATIBILITY_MATRIX = {
    ("numeric", "numeric"): 100,
    ("numeric", "numeric_string"): 90,
    ("numeric_string", "numeric_string"): 95,
    ("datetime", "datetime"): 100,
    ("datetime", "text"): 60,
    ("boolean", "boolean"): 100,
    ("boolean", "categorical"): 70,
    ("categorical", "categorical"): 85,
    ("categorical", "text"): 75,
    ("text", "text"): 90,
    ("empty", "empty"): 0,
}
CONVERTIBLE_PAIRS = {
    ("numeric_string", "numeric"),
    ("text", "datetime"),
    ("boolean", "categorical"),
}


@dataclass
class ColumnProfile:
    name: str
    enhanced_dtype: str
    spark_dtype: str
    n_rows: int
    n_nulls: int
    n_distinct: int
    description: str = ""


def _norm_name(col: str) -> str:
    return re.sub(r"[_\W]+", " ", col.lower()).strip()


def profile_columns(df: DataFrame) -> dict[str, ColumnProfile]:
    """One aggregation pass computing, for every column simultaneously:
    null count, distinct count, numeric/datetime parse-failure counts and
    boolean-membership counts — the inputs of the enhanced-dtype lattice."""
    string_like = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        sc = F.col(c)
        s = sc.cast("string")
        aggs += [
            F.sum(sc.isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(sc, 0.01).alias(f"{c}__distinct"),
            # parse probes over non-null values
            F.sum((sc.isNotNull() & s.try_cast("double").isNull()).cast("long")).alias(
                f"{c}__non_numeric"
            ),
            F.sum((sc.isNotNull() & s.try_cast("timestamp").isNull()).cast("long")).alias(
                f"{c}__non_datetime"
            ),
            F.sum(
                (sc.isNotNull() & ~F.lower(F.trim(s)).isin(*sorted(_BOOL_VALUES))).cast("long")
            ).alias(f"{c}__non_bool"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    n = int(row["__n"])
    out: dict[str, ColumnProfile] = {}
    for c in df.columns:
        nulls = int(row[f"{c}__nulls"] or 0)
        distinct = int(row[f"{c}__distinct"] or 0)
        non_null = n - nulls
        spark_t = string_like[c]
        if n == 0 or non_null == 0:
            t = "empty"
        elif spark_t in ("tinyint", "smallint", "int", "bigint", "float", "double") or any(
            spark_t.startswith(p) for p in ("decimal",)
        ):
            t = "numeric"
        elif spark_t == "boolean":
            t = "boolean"
        elif spark_t in ("timestamp", "date", "timestamp_ntz"):
            t = "datetime"
        elif int(row[f"{c}__non_numeric"] or 0) == 0:
            t = "numeric_string"
        elif int(row[f"{c}__non_datetime"] or 0) == 0:
            t = "datetime"
        elif int(row[f"{c}__non_bool"] or 0) == 0:
            t = "boolean"
        elif non_null > 0 and distinct / non_null < 0.1 and distinct < 50:
            t = "categorical"
        else:
            t = "text"
        out[c] = ColumnProfile(c, t, spark_t, n, nulls, distinct)
    return out


def describe_columns(df: DataFrame, profiles: dict[str, ColumnProfile] | None = None) -> dict[str, str]:
    """Deterministic replacement for the reference's per-column LLM
    description (entity_resolution.py:117-210): normalized name tokens +
    enhanced dtype. Cached on the profile."""
    profiles = profiles or profile_columns(df)
    out = {}
    for c, p in profiles.items():
        p.description = f"{_norm_name(c)} ({p.enhanced_dtype})"
        out[c] = p.description
    return out


def find_similar_columns(
    df1: DataFrame,
    df2: DataFrame,
    threshold: int = DEFAULT_SIMILARITY_THRESHOLD,
    descriptions1: dict[str, str] | None = None,
    descriptions2: dict[str, str] | None = None,
) -> list[tuple[str, str, float]]:
    """All description pairs scored with the fuzzywuzzy-parity ratio;
    >= threshold kept; sorted (score desc, col1, col2) — the reference's
    contract with a deterministic tiebreak (SURVEY.md §1.3). Callers with
    custom describers/templates (compat.SimilarColumnFinder) pass their
    rendered descriptions so matching sees the same text the user shaped."""
    if not 0 <= threshold <= 100:
        raise ValueError(f"threshold must be in [0, 100], got {threshold}")
    d1 = descriptions1 if descriptions1 is not None else describe_columns(df1)
    d2 = descriptions2 if descriptions2 is not None else describe_columns(df2)
    matches: list[tuple[str, str, float]] = []
    for c1, desc1 in d1.items():
        for c2, desc2 in d2.items():
            if not desc1 or not desc2:
                continue
            score = fuzz_ratio(desc1.strip(), desc2.strip())
            if score >= threshold:
                matches.append((c1, c2, float(score)))
    matches.sort(key=lambda m: (-m[2], m[0], m[1]))
    return matches


def type_compatibility(t1: str, t2: str) -> dict:
    score = COMPATIBILITY_MATRIX.get((t1, t2))
    if score is None:
        score = COMPATIBILITY_MATRIX.get((t2, t1), 30)
    convertible = (
        (t1, t2) in CONVERTIBLE_PAIRS or (t2, t1) in CONVERTIBLE_PAIRS or score >= 80
    )
    return {
        "compatible": score >= 70,
        "series1_type": t1,
        "series2_type": t2,
        "compatibility_score": score,
        "type_conversion_possible": convertible,
    }


def value_overlap(df1: DataFrame, col1: str, df2: DataFrame, col2: str) -> dict:
    """Distinct-set overlap computed JVM-side: two distinct projections, an
    intersect and a union — no values ever reach the driver."""
    a = df1.select(F.col(col1).cast("string").alias("v")).na.drop().distinct()
    b = df2.select(F.col(col2).cast("string").alias("v")).na.drop().distinct()
    n1, n2 = a.count(), b.count()
    if n1 == 0 and n2 == 0:
        return {"overlap_percentage": 0.0, "jaccard_similarity": 0.0,
                "n1": 0, "n2": 0, "n_common": 0, "n_union": 0}
    common = a.intersect(b).count()
    union = n1 + n2 - common
    jac = common / union if union else 0.0
    pct = common / max(n1, n2) * 100 if max(n1, n2) else 0.0
    return {
        "overlap_percentage": round(pct, 2),
        "jaccard_similarity": round(jac, 4),
        "n1": n1,
        "n2": n2,
        "n_common": common,
        "n_union": union,
    }


def validate_column_matches(
    df1: DataFrame,
    df2: DataFrame,
    matches: list[tuple[str, str, float]],
    sample_size: int = DEFAULT_VALIDATION_SAMPLE,
    seed: int = DEFAULT_VALIDATION_SEED,
) -> list[dict]:
    """Reference validate_column_matches semantics on Spark frames."""
    n1, n2 = df1.count(), df2.count()
    s1 = _sample(df1, n1, sample_size, seed)
    s2 = _sample(df2, n2, sample_size, seed)
    p1 = profile_columns(s1)
    p2 = profile_columns(s2)
    results = []
    for col1, col2, semantic in matches:
        if col1 not in p1 or col2 not in p2:
            results.append(
                {
                    "col1": col1,
                    "col2": col2,
                    "semantic_similarity": semantic,
                    "overall_validation_score": 0.0,
                    "recommendation": "ERROR: Column not found in dataset",
                    "validation_flags": ["COLUMN_NOT_FOUND"],
                }
            )
            continue
        ta = type_compatibility(p1[col1].enhanced_dtype, p2[col2].enhanced_dtype)
        ov = value_overlap(s1, col1, s2, col2)
        overall = 0.4 * semantic + 0.35 * ta["compatibility_score"] + 0.25 * ov["overlap_percentage"]
        flags = []
        if not ta["compatible"]:
            flags.append("INCOMPATIBLE_DATA_TYPES")
        if ov["overlap_percentage"] < 10:
            flags.append("LOW_VALUE_OVERLAP")
        if p1[col1].n_rows and p1[col1].n_nulls / p1[col1].n_rows > 0.5:
            flags.append("HIGH_NULL_RATE_SERIES1")
        if p2[col2].n_rows and p2[col2].n_nulls / p2[col2].n_rows > 0.5:
            flags.append("HIGH_NULL_RATE_SERIES2")
        rec = _recommendation(overall, flags)
        results.append(
            {
                "col1": col1,
                "col2": col2,
                "semantic_similarity": semantic,
                "data_type_analysis": ta,
                "value_overlap_analysis": ov,
                "overall_validation_score": round(overall, 2),
                "recommendation": rec,
                "validation_flags": flags,
            }
        )
    results.sort(key=lambda r: -r["overall_validation_score"])
    return results


def _sample(df: DataFrame, n: int, sample_size: int, seed: int) -> DataFrame:
    if n <= sample_size:
        return df
    # slight over-sample then cap — deterministic for a fixed seed+input
    frac = min(1.0, sample_size * 1.2 / n)
    return df.sample(withReplacement=False, fraction=frac, seed=seed).limit(sample_size)


def _recommendation(score: float, flags: list[str]) -> str:
    if score >= 85:
        rec = "EXCELLENT MATCH: High confidence for data integration"
    elif score >= 70:
        rec = "GOOD MATCH: Suitable for integration with minor validation"
    elif score >= 55:
        rec = "FAIR MATCH: Requires careful review and potential data transformation"
    elif score >= 40:
        rec = "POOR MATCH: Significant compatibility issues, manual review needed"
    else:
        rec = "REJECTED: Major incompatibilities, not recommended for integration"
    if "INCOMPATIBLE_DATA_TYPES" in flags:
        rec += " (Data type conversion required)"
    if "LOW_VALUE_OVERLAP" in flags:
        rec += " (Consider manual value mapping)"
    return rec
