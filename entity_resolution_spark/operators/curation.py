"""Fused corpus-curation pipeline — the canonical training-data prep flow.

One operator composes the engine's text-quality, exact-dedup, and near-dup
stages into the decision an LLM data pipeline actually ships: for every
document, *keep it or name why not*:

    documents ──quality gate──► low_quality out
              ──sha collapse──► exact_dup  out (canonical = sha-group min)
              ──MinHash-LSH ──► near-dup edges among representatives
              ──connected components──► near_dup out (canonical = cluster min)
              ──else──────────► kept

Output: ``(doc_id, status, canonical_id)`` — scalar columns, one row per
input document, fully deterministic. ``status`` ∈ {kept, low_quality,
exact_dup, near_dup}; ``canonical_id`` is NULL for low-quality rows, the
surviving representative otherwise (a document's own id iff kept).

Scale shape (each stage reuses machinery already sized for 100 TB):

- the quality gate is a pure JVM expression (functions/text.py) — codegen,
  no Python;
- exact collapse is a narrow hash-aggregate: only ``(doc_id, digest,
  quality)`` ever shuffles — text bytes move exactly once, and only for
  surviving representatives, keyed by the uniform ``doc_id`` (a window
  over the digest — the earlier design — sort-shuffles every text byte on
  a skewed key: one boilerplate digest repeated 10^8 times becomes a
  single-task external sort);
- NULL text is low_quality by definition (no content to keep) and keys by
  its own doc_id, so content-less docs neither merge with each other nor
  vanish through a null-key join;
- near-dup runs ``minhash_lsh_pairs`` (skew-capped band self-join,
  empty-doc sentinel exclusion) on *representatives only* — boilerplate
  repeated millions of times costs one representative each, the same
  exact-before-pairwise collapse the flagship pipeline uses;
- the status assembly is two hash joins on ``doc_id`` (comp / rep frames
  are each at most corpus-sized, usually far smaller).

Reference parity: the reference has no corpus-curation surface (it
resolves entities); this operator is the engine-added LLM-data-pipeline
composition the build brief names as first-class. The whole chain is
oracle-checked value-for-value by ``contract/sql_kernels.curation_status_sql``
(quality expr + window collapse + the exact seeded MinHash replica +
recursive-CTE closure).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MinHashConfig


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    min_jaccard: float = 0.6,
    cfg: MinHashConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs(id_col, text_col)`` -> ``(doc_id, status, canonical_id)``."""
    from ..functions.text import quality_score_col
    from .clustering import connected_components
    from .dedup import minhash_lsh_pairs

    # Narrow pass: (doc_id, digest, quality) — text is READ here but never
    # shuffled. `rep` = min surviving doc_id per sha group (NULL if the
    # whole group failed quality), assigned via hash-aggregate + hash-join:
    # map-side combine shrinks even a 10^8-member boilerplate digest to one
    # row per input partition, and nothing sorts. NULL text keys by its own
    # doc_id (unknown != unknown; a bare NULL digest would also silently
    # drop those rows at the inner join below).
    digest = F.coalesce(
        F.sha2(F.col(text_col).cast("binary"), 256),
        F.concat(F.lit("__null__:"), F.col(id_col).cast("string")),
    )
    narrow = docs.select(
        F.col(id_col).alias("doc_id"),
        digest.alias("digest"),
        quality_score_col(F.col(text_col)).alias("quality"),
    )
    surviving = F.when(F.col("quality") >= min_quality, F.col("doc_id"))
    rep_map = narrow.groupBy("digest").agg(F.min(surviving).alias("rep"))
    stamp = narrow.join(rep_map.hint("shuffle_hash"), "digest").select(
        "doc_id", "quality", "rep"
    )
    # Text re-attaches ONLY for surviving representatives (the LSH input),
    # keyed by the uniform doc_id — the one corpus-bytes shuffle in the
    # operator, and it is skew-free by construction.
    reps = (
        stamp.filter(
            (F.col("quality") >= min_quality) & (F.col("doc_id") == F.col("rep"))
        )
        .select("doc_id")
        .join(
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            ).hint("shuffle_hash"),
            "doc_id",
        )
    )

    pairs = minhash_lsh_pairs(reps, cfg=cfg, min_jaccard=min_jaccard)
    comp = connected_components(
        pairs.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    ).select(F.col("file_id").alias("doc_id"), "cluster_id")

    # shuffle_hash: build the (small) component-label side as a hash map
    # instead of sort-merge — sorting the corpus-sized stamp frame is the
    # cost to avoid; broadcast would be wrong (comp is corpus-bounded in
    # the worst case), the engine-wide rule for corpus joins
    out = stamp.select("doc_id", "quality", "rep").join(
        comp.hint("shuffle_hash"), "doc_id", "left"
    )
    is_low = F.col("quality").isNull() | (F.col("quality") < min_quality)
    is_exact = F.col("rep") != F.col("doc_id")
    is_near = F.col("cluster_id").isNotNull() & (F.col("cluster_id") != F.col("doc_id"))
    return out.select(
        "doc_id",
        F.when(is_low, F.lit("low_quality"))
        .when(is_exact, F.lit("exact_dup"))
        .when(is_near, F.lit("near_dup"))
        .otherwise(F.lit("kept"))
        .alias("status"),
        F.when(is_low, F.lit(None).cast("long"))
        .when(is_exact, F.col("rep"))
        .when(is_near, F.col("cluster_id"))
        .otherwise(F.col("doc_id"))
        .alias("canonical_id"),
    )


def threshold_sweep(
    docs: DataFrame,
    thresholds: Sequence[float],
    text_col: str = "text",
) -> DataFrame:
    """Quality-gate tuning curve: for each candidate threshold, how much
    corpus survives — (threshold, kept_docs, kept_fraction, kept_tokens,
    token_fraction). The knob-picking report a curator reads before fixing
    ``min_quality`` in `curate_corpus`: the elbow where kept_tokens drops
    fastest is where the gate starts cutting real content.

    Scale shape: ONE corpus scan computes (quality, tokens) per doc; the
    sweep is a conditional aggregate per threshold inside a single hash
    aggregate — |thresholds| output columns, unpivoted to rows at the end.
    The grid never re-scans the corpus and nothing is exploded per doc.
    NULL-text docs score NULL quality and fail every threshold (the
    engine's curation convention).
    """
    from ..functions.text import quality_score_col, whitespace_token_count_col

    ts = sorted(set(float(t) for t in thresholds))
    if not ts:
        raise ValueError("thresholds must be non-empty")
    base = docs.select(
        quality_score_col(F.col(text_col)).alias("_q"),
        whitespace_token_count_col(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long")
        .alias("_tok"),
    )
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum("_tok").alias("_tot_tok"),
    ]
    for i, t in enumerate(ts):
        keep = F.col("_q") >= F.lit(t)
        aggs.append(F.sum(keep.cast("long")).alias(f"_k_{i}"))
        aggs.append(F.sum(F.when(keep, F.col("_tok")).otherwise(F.lit(0))).alias(f"_kt_{i}"))
    m = base.agg(*aggs)
    rows = [
        F.struct(
            F.lit(t).alias("threshold"),
            F.coalesce(F.col(f"_k_{i}"), F.lit(0)).alias("kept_docs"),
            F.round(
                F.coalesce(F.col(f"_k_{i}"), F.lit(0))
                / F.greatest(F.col("_n"), F.lit(1)).cast("double"),
                6,
            ).alias("kept_fraction"),
            F.coalesce(F.col(f"_kt_{i}"), F.lit(0)).alias("kept_tokens"),
            F.round(
                F.coalesce(F.col(f"_kt_{i}"), F.lit(0))
                / F.greatest(F.col("_tot_tok"), F.lit(1)).cast("double"),
                6,
            ).alias("token_fraction"),
        )
        for i, t in enumerate(ts)
    ]
    return m.select(F.explode(F.array(*rows)).alias("_r")).select(
        "_r.threshold",
        "_r.kept_docs",
        "_r.kept_fraction",
        "_r.kept_tokens",
        "_r.token_fraction",
    )
