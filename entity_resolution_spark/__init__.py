"""entity_resolution_spark — PySpark-native record-linkage + training-data engine.

A from-scratch distributed re-expression of the capabilities of
``encrypted-ai/entity_resolution`` (reference at /root/reference, see
SURVEY.md): blocking → pairwise scoring → transitive clustering over a
source-code-repository table, plus the schema-matching / consolidation
semantics of the reference and the training-data-pipeline operators
(dedup, similarity search, text analysis) a 100 TB corpus needs.
"""

from .config import (
    DEFAULT_CONSOLIDATION_THRESHOLD,
    DEFAULT_SIMILARITY_THRESHOLD,
    MinHashConfig,
    PipelineConfig,
)
from .session import get_spark

__all__ = [
    "DEFAULT_CONSOLIDATION_THRESHOLD",
    "DEFAULT_SIMILARITY_THRESHOLD",
    "MinHashConfig",
    "PipelineConfig",
    "get_spark",
]

__version__ = "0.1.0"
