"""Document chunking — sliding character windows with overlap, the
standard RAG / context-window prep step (reference has no equivalent;
engine-added LLM-data-pipeline operator like sampling/packing).

``chunk_documents`` emits one row per (doc, window): windows start at
1, 1+step, 1+2*step, ... with ``step = chunk_chars - overlap``, and the
last window is the first one whose start exceeds ``len - overlap`` — so
every character is covered (start_max + chunk_chars - 1 >= len follows
from chunk_chars - step = overlap) and consecutive chunks share exactly
``overlap`` characters except the (possibly shorter) final one.

Scale shape: pure JVM — one ``sequence``/``posexplode`` projection, no
shuffle, no Python; the text column is duplicated per chunk only inside
the projection (Tungsten row copy), never across the wire unless the
caller shuffles downstream. At 100 TB this is a map-only pass that
parallelizes with the input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 512,
    overlap: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs(id_col, text_col)`` -> ``(doc_id, chunk_idx, chunk_start,
    chunk_end, chunk)`` — 0-based chunk_idx, 1-based inclusive character
    offsets. NULL/empty text yields no rows (nothing to chunk)."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError(f"need 0 <= overlap < chunk_chars, got {overlap}/{chunk_chars}")
    step = chunk_chars - overlap
    c = F.col(text_col)
    n = F.length(c)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(step))
    return (
        docs.filter(c.isNotNull() & (n > 0))
        .select(
            F.col(id_col).alias("doc_id"),
            c.alias("__t"),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.least(
                F.col("chunk_start") + F.lit(chunk_chars) - 1, F.length("__t")
            ).cast("long").alias("chunk_end"),
            F.col("__t").substr(F.col("chunk_start"), F.lit(chunk_chars)).alias("chunk"),
        )
    )
