"""Contrastive training-pair mining over an embedding column (engine-added
training-data operator): for every query vector, its nearest same-label
neighbor (the positive) and nearest different-label neighbor (the hard
negative) by cosine — the batched hard-mining step of contrastive /
metric-learning data prep (supervised SimCSE-style anchor/positive/negative
triples).

Scale shape is ``similarity_search.knn_join``'s: the corpus is bucketed
once on a uniform synthetic key (never replicated, never collected), the
query side — a labeled training subset, small by construction — is
replicated to every bucket via a broadcast cross-join, and a cogrouped
``applyInPandas`` scores each bucket in one (bucket_rows x queries)
float64 matmul, emitting only each bucket's local best per (query, side).
A window over those ``2 x |Q| x n_buckets`` candidate rows picks the
global winners, which are then re-scored with the JVM zip_with/aggregate
expression so reported cosines are bit-identical to the oracle path.
Ties break to the smallest corpus id; the query's own row (same id) is
excluded. For corpus-sized query sets route through IVF cells
(``similarity_search.ivf_knn_join``) instead of replicating the queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .similarity_search import _cosine_cols


def contrastive_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_buckets: int | None = None,
) -> DataFrame:
    """(query_id, side 'positive'|'negative', doc_id, cosine round-6) —
    one row per query per side (absent when no candidate exists, e.g. a
    label unique to the query)."""
    spark = corpus.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism * 4

    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id].dataType),
            T.StructField("side", T.StringType()),
            T.StructField(id_col, corpus.schema[id_col].dataType),
            T.StructField("approx", T.DoubleType()),
        ]
    )

    corpus_b = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.col(label_col).alias("__l"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int").alias("__b"),
    )
    buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("__b"))
    queries_r = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__ql"),
    ).crossJoin(F.broadcast(buckets))

    def bucket_best(cdf: pd.DataFrame, qdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cdf) or not len(qdf):
            return pd.DataFrame({"query_id": [], "side": [], id_col: [], "approx": []})
        V = np.asarray(cdf["__v"].tolist(), dtype="float64")
        ids = cdf[id_col].to_numpy()
        labels = cdf["__l"].to_numpy()
        Q = np.asarray(qdf["__qv"].tolist(), dtype="float64")
        vn = np.linalg.norm(V, axis=1)
        qn = np.linalg.norm(Q, axis=1)
        S = (V / np.maximum(vn, 1e-300)[:, None]) @ (Q / np.maximum(qn, 1e-300)[:, None]).T
        S[vn == 0, :] = -1.0
        S[:, qn == 0] = -1.0
        out = {"query_id": [], "side": [], id_col: [], "approx": []}
        for j in range(len(qdf)):
            qid = qdf["query_id"].iloc[j]
            ql = qdf["__ql"].iloc[j]
            not_self = ids != qid
            for side, mask in (
                ("positive", (labels == ql) & not_self),
                ("negative", (labels != ql) & not_self),
            ):
                idx = np.flatnonzero(mask)
                if not len(idx):
                    continue
                # local best by (-cosine, id): lexsort on the masked slice
                best = idx[np.lexsort((ids[idx], -S[idx, j]))[0]]
                out["query_id"].append(qid)
                out["side"].append(side)
                out[id_col].append(ids[best])
                out["approx"].append(S[best, j])
        return pd.DataFrame(out)

    cand = (
        corpus_b.groupBy("__b")
        .cogroup(queries_r.groupBy("__b"))
        .applyInPandas(bucket_best, out_schema)
    )
    w = Window.partitionBy("query_id", "side").orderBy(F.desc("approx"), F.asc(id_col))
    winners = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", "side", id_col)
    )
    qv = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    cv = corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("__cv"))
    return (
        cv.join(F.broadcast(winners), id_col)
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "side",
            id_col,
            F.round(_cosine_cols(F.col("__qv"), F.col("__cv")) + F.lit(1e-9), 6).alias("cosine"),
        )
    )
