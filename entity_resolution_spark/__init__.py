"""entity_resolution_spark — PySpark-native record-linkage + training-data engine.

A from-scratch distributed re-expression of the capabilities of
``encrypted-ai/entity_resolution`` (reference at /root/reference, see
SURVEY.md): blocking → pairwise scoring → transitive clustering over a
source-code-repository table, plus the schema-matching / consolidation
semantics of the reference and the training-data-pipeline operators
(dedup, similarity search, text analysis) a 100 TB corpus needs.

Drop-in reference API (``SimilarColumnFinder`` etc.) lives in
``entity_resolution_spark.compat``.
"""

from .config import (
    DEFAULT_CONSOLIDATION_THRESHOLD,
    DEFAULT_SIMILARITY_THRESHOLD,
    DEFAULT_VALIDATION_SAMPLE,
    MinHashConfig,
    PipelineConfig,
)
from .session import ensure_py_files, get_spark

__all__ = [
    "DEFAULT_CONSOLIDATION_THRESHOLD",
    "DEFAULT_SIMILARITY_THRESHOLD",
    "DEFAULT_VALIDATION_SAMPLE",
    "MinHashConfig",
    "PipelineConfig",
    "ensure_py_files",
    "get_spark",
    "resolve",
    "SimilarColumnFinder",
    "SemanticConsolidation",
    "EntityAssignment",
    "LangGraphWorkflow",
]

__version__ = "0.2.0"


def __getattr__(name):  # lazy: avoid importing pyspark plan modules eagerly
    if name == "resolve":
        from .plans.pipeline import resolve

        return resolve
    if name in ("SimilarColumnFinder", "SemanticConsolidation", "EntityAssignment",
                "LangGraphWorkflow", "ColumnMatchingWorkflow", "NodeGraph"):
        from . import compat

        return getattr(compat, name)
    raise AttributeError(name)
