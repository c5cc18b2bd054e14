"""Stage 3 — pairwise scoring of candidate pairs.

Reference semantics carried: ``fuzz.ratio(a.strip(), b.strip())`` + threshold
filter (/root/reference/src/entity_resolution/entity_resolution.py:339-344)
with default threshold 80 (:213), extended per north_star with Jaro-Winkler
(paths) and token-Jaccard (identifier sets), blended with the reference's
0.40/0.35/0.25 weights (entity_resolution.py:710-720 — see config.py).

Execution shape:
- two sort-merge joins attach per-side features to the pair list (file_id is
  the join key both times; Catalyst reuses the exchange);
- ONE Arrow-batched pandas UDF computes all three similarities and the
  blend per batch (no per-row Python, BASELINE.json:input_hint). A
  length-bound pre-filter skips the O(n·m/64) LCS DP when even a perfect
  LCS could not reach the threshold — at a 100 TB corpus most candidate
  pairs die here for the price of two ``len()`` calls;
- the threshold filter runs adjacent to the UDF in the same stage (Catalyst
  keeps it pipelined; only surviving edges hit the next shuffle).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ..config import PipelineConfig

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("lev_ratio", T.IntegerType()),
        T.StructField("token_jaccard", T.DoubleType()),
        T.StructField("path_jw", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def make_scorer_udf(cfg: PipelineConfig):
    w_content, w_jaccard, w_path = cfg.w_content, cfg.w_jaccard, cfg.w_path
    threshold = cfg.similarity_threshold

    @pandas_udf(SCORE_SCHEMA)
    def scorer(
        l_norm: pd.Series,
        r_norm: pd.Series,
        l_tokens: pd.Series,
        r_tokens: pd.Series,
        l_base: pd.Series,
        r_base: pd.Series,
    ) -> pd.DataFrame:
        import numpy as np

        from ..functions.similarity import fuzz_ratio, jaro_winkler, ratio_upper_bound

        def hash_jaccard(x, y) -> float:
            # token_hashes are sorted distinct int64 arrays -> merge-style
            # intersect beats building Python sets per pair
            if x is None or y is None or (len(x) == 0 and len(y) == 0):
                return 0.0
            inter = np.intersect1d(x, y, assume_unique=True).size
            union = len(x) + len(y) - inter
            return inter / union if union else 0.0

        n = len(l_norm)
        lev = [0] * n
        jac = [0.0] * n
        jw = [0.0] * n
        score = [0.0] * n
        ln = l_norm.to_numpy(dtype=object)
        rn = r_norm.to_numpy(dtype=object)
        lt = l_tokens.to_numpy(dtype=object)
        rt = r_tokens.to_numpy(dtype=object)
        lb = l_base.to_numpy(dtype=object)
        rb = r_base.to_numpy(dtype=object)
        for i in range(n):
            j = hash_jaccard(lt[i], rt[i])
            w = jaro_winkler(lb[i], rb[i])
            a, b = ln[i] or "", rn[i] or ""
            # cheap upper bound: even with lev=ub the blend can miss the
            # threshold -> skip the DP entirely
            ub = 100.0 if a == b and a else ratio_upper_bound(len(a), len(b))
            if w_content * ub + w_jaccard * 100.0 * j + w_path * 100.0 * w < threshold:
                r = int(ub) if a == b and a else 0  # not exact; never passes anyway
            elif a == b and a:
                r = 100
            else:
                r = fuzz_ratio(a, b)
            jac[i], jw[i], lev[i] = j, w, r
            score[i] = w_content * r + w_jaccard * 100.0 * j + w_path * 100.0 * w
        return pd.DataFrame(
            {"lev_ratio": lev, "token_jaccard": jac, "path_jw": jw, "score": score}
        )

    return scorer


def score_pairs(
    pairs: DataFrame, features: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """pairs(left_id, right_id, block_key) x features -> scored pairs.

    Returns (left_id, right_id, block_key, lev_ratio, token_jaccard,
    path_jw, score) for ALL candidates; callers apply the threshold
    (matched_edges) so the full score distribution stays observable for
    metrics.
    """
    cfg = cfg or PipelineConfig()
    feat = features.select(
        "file_id",
        "norm_content",
        "token_hashes",
        "basename",
    )
    left = feat.select(
        F.col("file_id").alias("left_id"),
        F.col("norm_content").alias("l_norm"),
        F.col("token_hashes").alias("l_tokens"),
        F.col("basename").alias("l_base"),
    )
    right = feat.select(
        F.col("file_id").alias("right_id"),
        F.col("norm_content").alias("r_norm"),
        F.col("token_hashes").alias("r_tokens"),
        F.col("basename").alias("r_base"),
    )
    scorer = make_scorer_udf(cfg)
    joined = pairs.join(left, "left_id").join(right, "right_id")
    scored = joined.withColumn(
        "s",
        scorer("l_norm", "r_norm", "l_tokens", "r_tokens", "l_base", "r_base"),
    )
    return scored.select(
        "left_id",
        "right_id",
        "block_key",
        F.col("s.lev_ratio").alias("lev_ratio"),
        F.col("s.token_jaccard").alias("token_jaccard"),
        F.col("s.path_jw").alias("path_jw"),
        F.round(F.col("s.score"), 6).alias("score"),
    )


def matched_edges(scored: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Threshold filter (reference P1) -> undirected match edges."""
    cfg = cfg or PipelineConfig()
    return scored.filter(F.col("score") >= cfg.similarity_threshold).select(
        "left_id", "right_id"
    )
