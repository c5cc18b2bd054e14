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
    """Reference: entity_resolution.py:50-351. The ``llm`` hook is accepted
    for signature parity (the deterministic describer replaces it; a
    callable ``describer(df) -> dict[col,str]`` may be injected instead).

    ``prompt_template`` is HONORED the way the reference honors
    ``column_description_prompt`` (entity_resolution.py:87-115): the
    reference lets callers reshape the description text per column; here a
    template with a ``format`` method (``str`` works) renders each
    description from ``column_name`` / ``dtype`` / ``description`` (the
    deterministic default text). Same validation as the reference: a
    non-None template without ``format`` raises TypeError."""

    def __init__(self, llm=None, prompt_template=None, describer=None, spark=None):
        self.llm = llm
        if prompt_template is not None and not hasattr(prompt_template, "format"):
            # reference entity_resolution.py:110-112
            raise TypeError(
                "prompt_template must have a 'format' method (a str or "
                "PromptTemplate-like object)"
            )
        self.prompt_template = prompt_template
        self.describer = describer or _sm.describe_columns
        self.spark = spark

    def _render(self, sdf: DataFrame, descriptions: dict) -> dict:
        if self.prompt_template is None:
            return descriptions
        from .operators.schema_matching import profile_columns

        profiles = profile_columns(sdf)
        return {
            c: self.prompt_template.format(
                column_name=c,
                dtype=profiles[c].enhanced_dtype if c in profiles else "",
                description=d,
            )
            for c, d in descriptions.items()
        }

    def describe_columns(self, df, columns: list | None = None) -> dict[str, str]:
        """Reference signature ``describe_columns(df, columns)``
        (entity_resolution.py:117) with the reference's own validation:
        columns must be a non-empty list of existing columns. ``columns``
        stays optional here (None = all columns) so round-1 callers keep
        working."""
        sdf = _as_spark(df, self.spark)
        if columns is not None:
            if not isinstance(columns, list):
                raise TypeError("columns must be a list")
            if not columns:
                raise ValueError("columns list cannot be empty")
            missing = [c for c in columns if c not in sdf.columns]
            if missing:
                raise ValueError(
                    f"The following columns are not found in the DataFrame: {missing}"
                )
            sdf = sdf.select(*columns)
        return self._render(sdf, self.describer(sdf))

    def find_similar_columns(
        self, df1, df2, threshold: int = DEFAULT_SIMILARITY_THRESHOLD
    ) -> list[tuple[str, str, float]]:
        a, b = _as_spark(df1, self.spark), _as_spark(df2, self.spark)
        if not a.columns or not b.columns:
            raise ValueError("input DataFrames must have columns")
        return _sm.find_similar_columns(
            a,
            b,
            threshold,
            descriptions1=self._render(a, self.describer(a)),
            descriptions2=self._render(b, self.describer(b)),
        )

    def validate_column_matches(
        self, df1, df2, column_matches, sample_size: int = DEFAULT_VALIDATION_SAMPLE
    ) -> list[dict]:
        a, b = _as_spark(df1, self.spark), _as_spark(df2, self.spark)
        return _sm.validate_column_matches(a, b, column_matches, sample_size)


class SemanticConsolidation:
    """Reference: entity_assignment.py:20-313 (pattern mining). Default
    min_frequency_threshold matches the reference's 0.1
    (entity_assignment.py:35) so ported callers mine the same
    prefixes/suffixes."""

    def __init__(self, min_frequency_threshold: float = 0.1):
        if not isinstance(min_frequency_threshold, (int, float)):
            raise TypeError("min_frequency_threshold must be a number")
        if not (0 <= min_frequency_threshold <= 1):
            raise ValueError("min_frequency_threshold must be between 0 and 1")
        self.min_frequency_threshold = min_frequency_threshold
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
    join/concat execution). Constructor signature and validation mirror
    the reference's ``__init__(match_threshold=0.7,
    semantic_consolidation=None)`` (entity_assignment.py:329)."""

    def __init__(
        self,
        match_threshold: float = DEFAULT_CONSOLIDATION_THRESHOLD,
        semantic_consolidation: "SemanticConsolidation | None" = None,
        spark=None,
    ):
        if not isinstance(match_threshold, (int, float)):
            raise TypeError("match_threshold must be a number")
        if not (0 <= match_threshold <= 1):
            raise ValueError("match_threshold must be between 0 and 1")
        if semantic_consolidation is not None and not isinstance(
            semantic_consolidation, SemanticConsolidation
        ):
            raise TypeError(
                "semantic_consolidation must be a SemanticConsolidation instance"
            )
        self.match_threshold = match_threshold
        self.semantic_consolidation = semantic_consolidation
        self.spark = spark

    def consolidate_datasets_based_on_matches(
        self,
        df1,
        df2,
        column_matches,
        match_threshold: float | None = None,
    ) -> tuple[DataFrame, str, dict]:
        """``match_threshold=None`` uses the instance default — the
        reference's convention (entity_assignment.py:351)."""
        a, b = _as_spark(df1, self.spark), _as_spark(df2, self.spark)
        if self.semantic_consolidation is None:
            self.semantic_consolidation = SemanticConsolidation()
            self.semantic_consolidation.analyze_datasets(a, b)
        elif not self.semantic_consolidation._analyzed:
            self.semantic_consolidation.analyze_datasets(a, b)
        return _cons.consolidate_datasets(
            a,
            b,
            column_matches,
            threshold=self.match_threshold if match_threshold is None else match_threshold,
            patterns=self.semantic_consolidation.patterns,
        )


class NodeGraph:
    """Reference: workflow.py:23-40 — dict-shaped nodes with
    (name, function, inputs, output_key), plain edge list. Ported so
    drop-in users inspecting ``graph.nodes[i]['function']`` keep working."""

    def __init__(self):
        self.nodes: list[dict] = []
        self.edges: list[tuple[str, str]] = []

    def add_node(self, name, function, inputs, output_key) -> dict:
        node = {
            "name": name,
            "function": function,
            "inputs": inputs,
            "output_key": output_key,
        }
        self.nodes.append(node)
        return node

    def add_edges(self, edge_list) -> None:
        self.edges.extend(edge_list)


_UNSET = object()


class ColumnMatchingWorkflow:
    """Reference: workflow.py:91-282 (``LangGraphWorkflow``). The
    reference builds a 4-node graph it can never run (mock NodeGraph);
    here the same dict-shaped graph — same node names, functions, inputs,
    output keys, and edges (workflow.py:237-280) — is recorded for
    introspection AND ``run()`` actually executes it through Spark's lazy
    plan. Constructor validation mirrors workflow.py:109-116."""

    def __init__(self, column_finder=_UNSET, match_threshold: float = DEFAULT_CONSOLIDATION_THRESHOLD,
                 assigner: EntityAssignment | None = None):
        if column_finder is _UNSET:
            column_finder = SimilarColumnFinder()
        if column_finder is None:
            raise ValueError("column_finder cannot be None")
        if not hasattr(column_finder, "find_similar_columns"):
            raise TypeError("column_finder must have a 'find_similar_columns' method")
        if not isinstance(match_threshold, (int, float)):
            raise TypeError("match_threshold must be a number")
        if not (0 <= match_threshold <= 1):
            raise ValueError("match_threshold must be between 0 and 1")
        self.column_finder = column_finder
        self.finder = column_finder  # round-1 alias
        self.entity_assignment = assigner or EntityAssignment(match_threshold)
        self.assigner = self.entity_assignment  # round-1 alias
        self.graph: NodeGraph | None = None

    # round-1 surface: nodes/edges directly on the workflow object
    @property
    def nodes(self) -> list[dict]:
        return self.graph.nodes if self.graph is not None else []

    @property
    def edges(self) -> list[tuple[str, str]]:
        return self.graph.edges if self.graph is not None else []

    def create_column_matching_graph(self, df1, df2) -> NodeGraph:
        """Build the reference's 4-node/3-edge DAG (workflow.py:237-280)
        and return the graph; the workflow keeps it for ``run()``."""
        self._df1, self._df2 = df1, df2
        graph = NodeGraph()
        graph.add_node(
            name="Describe columns in Dataset 1",
            function=self.column_finder.describe_columns,
            inputs={"df": df1, "columns": list(df1.columns)},
            output_key="descriptions1",
        )
        graph.add_node(
            name="Describe columns in Dataset 2",
            function=self.column_finder.describe_columns,
            inputs={"df": df2, "columns": list(df2.columns)},
            output_key="descriptions2",
        )
        graph.add_node(
            name="Compare columns and find matches",
            function=self.column_finder.find_similar_columns,
            inputs={"df1": df1, "df2": df2},
            output_key="similar_columns",
        )
        graph.add_node(
            name="Consolidate datasets based on matches",
            function=lambda similar_columns: self.entity_assignment.consolidate_datasets_based_on_matches(
                df1, df2, similar_columns
            ),
            inputs={"similar_columns": "similar_columns"},
            output_key="consolidated_result",
        )
        graph.add_edges(
            [
                ("Describe columns in Dataset 1", "Compare columns and find matches"),
                ("Describe columns in Dataset 2", "Compare columns and find matches"),
                ("Compare columns and find matches", "Consolidate datasets based on matches"),
            ]
        )
        self.graph = graph
        return graph

    def run(self, threshold: int = DEFAULT_SIMILARITY_THRESHOLD,
            match_threshold: float | None = None):
        matches = self.column_finder.find_similar_columns(self._df1, self._df2, threshold)
        return self.entity_assignment.consolidate_datasets_based_on_matches(
            self._df1, self._df2, matches, match_threshold
        )


# the reference exports this name; keep an alias for drop-in imports
LangGraphWorkflow = ColumnMatchingWorkflow
