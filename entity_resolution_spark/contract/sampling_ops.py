"""Driver-contract rows for deterministic sampling/splitting
(operators/sampling.py — training-data pipeline operators).

The hash both sides share is sha256 of a salted key string, compared as
lowercase hex: any engine reproduces the assignment bit-for-bit, which is
the point of content-addressed splits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sampling import split_thresholds
from ..queries import _t, query

_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
_BOUNDS = dict(split_thresholds(_FRACTIONS))  # label -> hex upper bound


@query(
    "split_assign",
    f"""
    SELECT doc_id,
           CASE WHEN substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                     < '{_BOUNDS["train"]}' THEN 'train'
                WHEN substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                     < '{_BOUNDS["val"]}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment keyed on doc_id."""
    from ..operators.sampling import deterministic_split

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return deterministic_split(d, "doc_id", _FRACTIONS)


@query(
    "source_cap_sample",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY sha256('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) WHERE rn <= 10
    """,
)
def source_cap_sample(spark, sf_dir):
    """Per-source cap at 10 docs — deterministic uniform sample without
    replacement (data-mixing / domain balancing)."""
    from ..operators.sampling import per_source_cap

    d = _t(spark, sf_dir, "documents")
    return per_source_cap(d, "source", "doc_id", cap=10).select("doc_id", "source")
