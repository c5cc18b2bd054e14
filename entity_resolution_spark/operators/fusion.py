"""Rank fusion for hybrid retrieval.

Modern retrieval pipelines run SEVERAL rankers over the same corpus —
lexical (BM25), dense (embedding kNN), tf-idf cosine — and fuse the rank
lists. Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
is the standard scoreless fusion: fused(d) = sum over lists of
1 / (k + rank_list(d)). It needs no score calibration between rankers,
which is exactly why it won out in practice.

One union + one bounded aggregate: the inputs are already top-k lists
(n_queries * k rows each), so fusion never touches the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 60,
    top_k: int | None = None,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """(query_col, id_col, rrf_score round-6, rank) — reciprocal rank
    fusion over any number of (query, doc, rank) lists; a doc absent from
    a list simply contributes nothing for it. ``top_k`` truncates the
    fused list per query (rank ties break on doc id ASC)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    parts = [
        r.select(query_col, id_col, F.col(rank_col).alias("__r")) for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    fused = u.groupBy(query_col, id_col).agg(
        F.round(F.sum(1.0 / (F.lit(float(k)) + F.col("__r"))), 6).alias("rrf_score")
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf_score"), F.asc(id_col))
    out = fused.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out
