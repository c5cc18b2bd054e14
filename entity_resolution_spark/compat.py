"""Reference-API compatibility layer.

Exposes the reference's public class surface
(/root/reference/src/entity_resolution/__init__.py:66-74:
``SimilarColumnFinder``, ``SemanticConsolidation``, ``EntityAssignment``,
``LangGraphWorkflow``) over Spark DataFrames, so a user of the reference
can switch imports and keep their calling code:

    from entity_resolution_spark.compat import SimilarColumnFinder
    finder = SimilarColumnFinder()
    matches = finder.find_similar_columns(df1, df2, threshold=80)

Differences from the reference, by design:
- inputs are ``pyspark.sql.DataFrame`` (a ``pandas.DataFrame`` is accepted
  and converted when a session is supplied/active);
- the per-column LLM call (entity_resolution.py:194-208) is replaced by
  the deterministic description in operators/schema_matching.py — same
  output shape, no network, reproducible (the reference's own tests mock
  the LLM anyway, SURVEY.md §5.1);
- ``LangGraphWorkflow``'s mock DAG (workflow.py:23-40 — it never executes)
  maps onto Spark's real lazy plan: the workflow object wires the same
  four nodes (describe x2 -> compare -> consolidate) and ``run()``
  actually executes them.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .config import (
    DEFAULT_CONSOLIDATION_THRESHOLD,
    DEFAULT_SIMILARITY_THRESHOLD,
    DEFAULT_VALIDATION_SAMPLE,
)
from .operators import consolidation as _cons
from .operators import schema_matching as _sm


def _as_spark(df: Any, spark: SparkSession | None = None) -> DataFrame:
    if isinstance(df, DataFrame):
        return df
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise TypeError(
            "expected a pyspark DataFrame (or a pandas DataFrame with an "
            "active SparkSession to convert it)"
        )
    return spark.createDataFrame(df)


class SimilarColumnFinder:
    """Reference: entity_resolution.py:50-351. ``llm`` / ``prompt_template``
    hooks are accepted for signature parity; the deterministic describer
    ignores them (a callable ``describer(df) -> dict[col,str]`` may be
    injected instead)."""

    def __init__(self, llm=None, prompt_template=None, describer=None, spark=None):
        self.llm = llm
        self.prompt_template = prompt_template
        self.describer = describer or _sm.describe_columns
        self.spark = spark

    def describe_columns(self, df) -> dict[str, str]:
        return self.describer(_as_spark(df, self.spark))

    def find_similar_columns(
        self, df1, df2, threshold: int = DEFAULT_SIMILARITY_THRESHOLD
    ) -> list[tuple[str, str, float]]:
        a, b = _as_spark(df1, self.spark), _as_spark(df2, self.spark)
        if not a.columns or not b.columns:
            raise ValueError("input DataFrames must have columns")
        return _sm.find_similar_columns(a, b, threshold)

    def validate_column_matches(
        self, df1, df2, column_matches, sample_size: int = DEFAULT_VALIDATION_SAMPLE
    ) -> list[dict]:
        a, b = _as_spark(df1, self.spark), _as_spark(df2, self.spark)
        return _sm.validate_column_matches(a, b, column_matches, sample_size)


class SemanticConsolidation:
    """Reference: entity_assignment.py:20-313 (pattern mining)."""

    def __init__(self, min_frequency_threshold: float = 0.3):
        self.patterns = _cons.SemanticPatterns(min_frequency=min_frequency_threshold)
        self._analyzed = False

    @property
    def common_prefixes(self) -> list[str]:
        return self.patterns.prefixes

    @property
    def common_suffixes(self) -> list[str]:
        return self.patterns.suffixes

    @property
    def semantic_mappings(self) -> dict:
        return self.patterns.mappings

    def analyze_datasets(self, *datasets, spark=None) -> dict:
        cols = [list(_as_spark(d, spark).columns) for d in datasets]
        self.patterns.analyze(*cols)
        self._analyzed = True
        return {
            "total_columns_analyzed": len(
                dict.fromkeys(c for cl in cols for c in cl)
            ),
            "semantic_mappings": self.patterns.mappings,
            "common_prefixes": self.patterns.prefixes,
            "common_suffixes": self.patterns.suffixes,
        }

    def get_semantic_label(self, col1: str, col2: str) -> str:
        return self.patterns.semantic_label(col1, col2)


class EntityAssignment:
    """Reference: entity_assignment.py:316-534 (consolidation decision +
    join/concat execution)."""

    def __init__(self, spark=None):
        self.semantic_consolidation: SemanticConsolidation | None = None
        self.spark = spark

    def consolidate_datasets_based_on_matches(
        self,
        df1,
        df2,
        column_matches,
        match_threshold: float = DEFAULT_CONSOLIDATION_THRESHOLD,
    ) -> tuple[DataFrame, str, dict]:
        a, b = _as_spark(df1, self.spark), _as_spark(df2, self.spark)
        if self.semantic_consolidation is None:
            self.semantic_consolidation = SemanticConsolidation()
            self.semantic_consolidation.analyze_datasets(a, b)
        return _cons.consolidate_datasets(
            a,
            b,
            column_matches,
            threshold=match_threshold,
            patterns=self.semantic_consolidation.patterns,
        )


class ColumnMatchingWorkflow:
    """Reference: workflow.py:121-282 (``LangGraphWorkflow``). The
    reference builds a 4-node graph it can never run (mock NodeGraph,
    workflow.py:23-40); here the same graph shape is recorded for
    introspection AND ``run()`` executes it through Spark's lazy plan."""

    def __init__(self, finder: SimilarColumnFinder | None = None,
                 assigner: EntityAssignment | None = None):
        self.finder = finder or SimilarColumnFinder()
        self.assigner = assigner or EntityAssignment()
        self.nodes: list[str] = []
        self.edges: list[tuple[str, str]] = []

    def create_column_matching_graph(self, df1, df2):
        self._df1, self._df2 = df1, df2
        self.nodes = ["describe_df1", "describe_df2", "compare_columns", "consolidate"]
        self.edges = [
            ("describe_df1", "compare_columns"),
            ("describe_df2", "compare_columns"),
            ("compare_columns", "consolidate"),
        ]
        return self

    def run(self, threshold: int = DEFAULT_SIMILARITY_THRESHOLD,
            match_threshold: float = DEFAULT_CONSOLIDATION_THRESHOLD):
        matches = self.finder.find_similar_columns(self._df1, self._df2, threshold)
        return self.assigner.consolidate_datasets_based_on_matches(
            self._df1, self._df2, matches, match_threshold
        )


# the reference exports this name; keep an alias for drop-in imports
LangGraphWorkflow = ColumnMatchingWorkflow
