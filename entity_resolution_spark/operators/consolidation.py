"""Stage 5 — consolidation: the reference's EntityAssignment semantics on
Spark, plus per-cluster canonical records for the row pipeline.

Reference semantics carried
(/root/reference/src/entity_resolution/entity_assignment.py):
- pattern mining over column names (:58-178): prefix census (first
  '_'-segment, else length-3..6 letter prefixes), suffix census (last
  segment, else length-2..5), frequency threshold max(1, n*min_freq);
- semantic category buckets (:180-222): 7 base categories by keyword
  containment, first match wins, leftovers self-keyed, groups kept if
  >= 2 members or a base category;
- semantic labels for matched pairs (:262-313): category lookup, then
  subset/shared-word/shorter-name fallbacks;
- the join-vs-concat decision (:351-432): required = max(1, min_cols//2)
  top matches, mean score / 100 >= threshold (default 0.7) -> full outer
  join on canonical labels, else union with '_dataset_source' tags;
- join path (:434-486): both sides renamed to the semantic label per
  match; concat path (:488-534): rename + align + missing columns null.

Column-name mining is driver-side (metadata scale); every row operation is
a Spark plan node (full_outer join / unionByName) — the two physical
shapes Catalyst already optimizes (broadcast for small sides, AQE for
skew).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONSOLIDATION_THRESHOLD

BASE_CATEGORIES = {
    "identifier": ["id", "identifier", "number", "num", "key", "pk", "uid"],
    "name": ["name", "title", "label", "description", "desc"],
    "date": ["date", "time", "timestamp", "created", "updated", "modified"],
    "amount": ["amount", "value", "price", "cost", "total", "sum", "balance"],
    "address": ["address", "location", "addr", "street", "city", "state"],
    "contact": ["phone", "telephone", "mobile", "email", "mail"],
    "status": ["status", "state", "condition", "flag", "active", "enabled"],
}


@dataclass
class SemanticPatterns:
    """Mined column-name patterns (prefixes, suffixes, category mappings)."""

    # reference default: entity_assignment.py:47-56 (min_frequency_threshold=0.1)
    min_frequency: float = 0.1
    prefixes: list[str] = field(default_factory=list)
    suffixes: list[str] = field(default_factory=list)
    mappings: dict[tuple, str] = field(default_factory=dict)

    def analyze(self, *column_lists: list[str]) -> "SemanticPatterns":
        cols: list[str] = []
        for cl in column_lists:
            cols.extend(cl)
        if not cols:
            raise ValueError("no columns to analyze")
        cols = list(dict.fromkeys(cols))  # ordered dedup (reference :89)
        self.prefixes = self._census(cols, is_prefix=True)
        self.suffixes = self._census(cols, is_prefix=False)
        self._derive_mappings(cols)
        return self

    def _census(self, cols: list[str], is_prefix: bool) -> list[str]:
        counter: Counter[str] = Counter()
        for col in cols:
            c = col.lower()
            if "_" in c:
                token = c.split("_")[0] + "_" if is_prefix else "_" + c.split("_")[-1]
                counter[token] += 1
            elif len(c) > 4:
                lengths = (3, 4, 5, 6) if is_prefix else (2, 3, 4, 5)
                for ln in lengths:
                    if ln < len(c):
                        token = (c[:ln] + "_") if is_prefix else ("_" + c[-ln:])
                        pat = r"^[a-z]+_$" if is_prefix else r"^_[a-z]+$"
                        if re.match(pat, token):
                            counter[token] += 1
        min_occ = max(1, int(len(cols) * self.min_frequency))
        keep = [t for t, n in counter.items() if n >= min_occ]
        keep.sort(key=lambda t: counter[t], reverse=True)
        return keep

    def _clean(self, name: str) -> str:
        c = re.sub(r"[0-9]+", "", name.lower())
        c = re.sub(r"[^a-z_]", "", c)
        for p in self.prefixes:
            if c.startswith(p):
                c = c[len(p):]
                break
        for s in self.suffixes:
            if c.endswith(s):
                c = c[: -len(s)]
                break
        c = c.strip("_")
        if "_" in c:
            parts = c.split("_")
            c = max(parts, key=len)
        return c

    def _derive_mappings(self, cols: list[str]) -> None:
        groups: dict[str, list[str]] = defaultdict(list)
        for col in cols:
            cl = col.lower()
            cleaned = self._clean(cl)
            for cat, kws in BASE_CATEGORIES.items():
                if any(kw in cleaned for kw in kws):
                    groups[cat].append(cl)
                    break
            else:
                if cleaned:
                    groups[cleaned].append(cl)
        self.mappings = {
            tuple(sorted(set(terms))): cat
            for cat, terms in groups.items()
            if len(terms) >= 2 or cat in BASE_CATEGORIES
        }

    def semantic_label(self, col1: str, col2: str) -> str:
        c1, c2 = col1.lower(), col2.lower()
        for terms, label in self.mappings.items():
            if any(t in c1 for t in terms) or any(t in c2 for t in terms):
                return label
        a, b = self._strip_affixes(c1), self._strip_affixes(c2)
        if a and b:
            if a in b:
                return a
            if b in a:
                return b
        common = set(a.split("_")) & set(b.split("_"))
        if common:
            return "_".join(sorted(common))
        return col1 if len(col1) <= len(col2) else col2

    def _strip_affixes(self, name: str) -> str:
        c = name.lower()
        for p in self.prefixes:
            if c.startswith(p):
                c = c[len(p):]
                break
        for s in self.suffixes:
            if c.endswith(s):
                c = c[: -len(s)]
                break
        return c.strip("_")


def consolidation_decision(
    matches: list[tuple[str, str, float]],
    n_cols1: int,
    n_cols2: int,
    threshold: float = DEFAULT_CONSOLIDATION_THRESHOLD,
) -> tuple[str, float]:
    """Join-vs-concat rule (entity_assignment.py:399-432): mean of the top
    max(1, min_cols // 2) match scores, normalized /100, vs threshold."""
    if not matches:
        return "none", 0.0
    required = max(1, min(n_cols1, n_cols2) // 2)
    top = sorted(matches, key=lambda m: -m[2])[:required]
    avg = sum(m[2] for m in top) / len(top) / 100.0
    return ("join" if avg >= threshold else "concatenate"), avg


def consolidate_datasets(
    df1: DataFrame,
    df2: DataFrame,
    matches: list[tuple[str, str, float]],
    threshold: float = DEFAULT_CONSOLIDATION_THRESHOLD,
    patterns: SemanticPatterns | None = None,
) -> tuple[DataFrame, str, dict]:
    """Reference consolidate_datasets_based_on_matches on Spark frames."""
    if not matches:
        return df1, "no_matches", {"reason": "empty match list", "avg_score": 0.0}
    patterns = patterns or SemanticPatterns().analyze(df1.columns, df2.columns)
    method, avg = consolidation_decision(matches, len(df1.columns), len(df2.columns), threshold)
    if method == "join":
        out, meta = _join_on_matches(df1, df2, matches, patterns)
    else:
        out, meta = _concatenate_with_labels(df1, df2, matches, patterns)
    meta.update({"avg_score_normalized": round(avg, 4), "threshold": threshold,
                 "n_matches": len(matches)})
    return out, method, meta


def _canonical_renames(
    matches: list[tuple[str, str, float]], patterns: SemanticPatterns
) -> tuple[dict[str, str], dict[str, str]]:
    ren1: dict[str, str] = {}
    ren2: dict[str, str] = {}
    used: set[str] = set()
    for c1, c2, _ in sorted(matches, key=lambda m: (-m[2], m[0], m[1])):
        if c1 in ren1 or c2 in ren2:
            continue  # a column participates in one canonical label only
        label = patterns.semantic_label(c1, c2)
        if label in used:  # disambiguate repeated labels deterministically
            label = f"{label}_{len(used)}"
        used.add(label)
        ren1[c1] = label
        ren2[c2] = label
    return ren1, ren2


def _apply_renames(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    return df.select(
        *[F.col(c).alias(renames.get(c, c)) for c in df.columns]
    )


def _join_on_matches(df1, df2, matches, patterns):
    ren1, ren2 = _canonical_renames(matches, patterns)
    a = _apply_renames(df1, ren1)
    b = _apply_renames(df2, ren2)
    join_cols = sorted(set(ren1.values()))
    # suffix-disambiguate non-join collisions (Spark has no merge suffixes)
    collide = (set(a.columns) & set(b.columns)) - set(join_cols)
    a = a.select(*[F.col(c).alias(c + "_dataset1" if c in collide else c) for c in a.columns])
    b = b.select(*[F.col(c).alias(c + "_dataset2" if c in collide else c) for c in b.columns])
    out = a.join(b, on=join_cols, how="full_outer")
    return out, {"join_columns": join_cols, "renames_df1": ren1, "renames_df2": ren2}


def _concatenate_with_labels(df1, df2, matches, patterns):
    ren1, ren2 = _canonical_renames(matches, patterns)
    a = _apply_renames(df1, ren1).withColumn("_dataset_source", F.lit("dataset_1"))
    b = _apply_renames(df2, ren2).withColumn("_dataset_source", F.lit("dataset_2"))
    out = a.unionByName(b, allowMissingColumns=True)
    return out, {"aligned_columns": sorted(set(ren1.values())),
                 "renames_df1": ren1, "renames_df2": ren2}


# ---------------------------------------------------------------------------
# Row-pipeline Stage 5: canonical record per entity cluster
# ---------------------------------------------------------------------------

def canonical_entities(clusters: DataFrame, features: DataFrame) -> DataFrame:
    """One canonical record per cluster: the min-file_id member's identity
    plus membership stats. One shuffle on cluster_id."""
    joined = clusters.join(
        features.select("file_id", "repo", "path", "lang", "content_sha256"),
        "file_id",
    )
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.min("file_id").alias("canonical_file_id"),
            F.min_by("repo", "file_id").alias("canonical_repo"),
            F.min_by("path", "file_id").alias("canonical_path"),
            F.min_by("content_sha256", "file_id").alias("canonical_sha256"),
            F.countDistinct("repo").alias("n_repos"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )
