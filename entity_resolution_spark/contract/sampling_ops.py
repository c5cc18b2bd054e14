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


_WS_TOKENS = """CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)"""


# token-budget mixing: per-source rows in content-address order until the
# running token sum reaches the budget (first crossing row kept)
@query(
    "token_budget_sample",
    f"""
    WITH h AS (
      SELECT doc_id, source,
             {_WS_TOKENS} AS tok,
             sha256('budget' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents),
    c AS (
      SELECT doc_id, source, tok,
             sum(tok) OVER (PARTITION BY source ORDER BY hx, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM h)
    SELECT doc_id, source FROM c WHERE cum - tok < 600
    """,
)
def token_budget_sample(spark, sf_dir):
    from ..operators.sampling import sample_to_token_budget

    d = _t(spark, sf_dir, "documents")
    return sample_to_token_budget(d, 600).select("doc_id", "source")


# GPT-style streaming sequence packing coordinates
@query(
    "sequence_packing",
    f"""
    WITH h AS (
      SELECT doc_id, source,
             {_WS_TOKENS} AS tok,
             sha256('pack' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents),
    c AS (
      SELECT doc_id, source, tok,
             sum(tok) OVER (PARTITION BY source ORDER BY hx, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM h)
    SELECT source, doc_id, tok AS n_tokens,
           CAST((cum - tok) // 512 AS BIGINT) AS seq_id,
           CAST((cum - tok) % 512 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def sequence_packing(spark, sf_dir):
    from ..operators.sampling import pack_into_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_into_sequences(d, 512)


from . import sql_kernels as _sql  # noqa: E402


# near-dup-aware split: the sha256 CASE runs over the CANONICAL id of each
# MinHash-LSH component, so near-duplicates can never straddle splits
@query(
    "leakage_safe_split",
    _sql.leakage_safe_split_sql(min_jaccard=0.6, bounds=_BOUNDS),
)
def leakage_safe_split(spark, sf_dir):
    from ..operators.sampling import leakage_safe_split as op

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return op(d, fractions=_FRACTIONS, min_jaccard=0.6)


# DSIR importance resampling (Xie et al. 2023): hashed char-5-gram bucket
# log-ratios (target = src0 docs), integer micro-nat scores, top-100 kept
@query(
    "dsir_importance_sample",
    _sql.dsir_sql(target_pred="source = 'src0'", top_k=100),
)
def dsir_importance_sample(spark, sf_dir):
    from ..operators.sampling import dsir_importance_sample as op

    d = _t(spark, sf_dir, "documents")
    return op(d, d.filter(F.col("source") == "src0"), top_k=100)


def _shuffle_shards_sql(n_shards: int = 8, seed: int = 42) -> str:
    seed_c = (seed * 0x9E3779B97F4A7C15) % (1 << 64)
    return f"""
WITH __m0 AS (SELECT doc_id, xor(doc_id::UBIGINT, {seed_c}::UBIGINT) AS h FROM documents),
{_sql._splitmix64_ctes("__m0", "doc_id")},
__k AS (SELECT doc_id, (h >> 1)::BIGINT AS k FROM __mixed)
SELECT doc_id,
       CAST(k % {n_shards} AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY k % {n_shards} ORDER BY k, doc_id) - 1 AS INT) AS pos
FROM __k
"""


# Seeded global shuffle + shard layout (training-data write order); the
# oracle reuses the MinHash kernel's splitmix64 UHUGEINT replica.
@query("shuffle_shards_layout", _shuffle_shards_sql())
def shuffle_shards_layout(spark, sf_dir):
    from ..operators.sampling import shuffle_shards

    d = _t(spark, sf_dir, "documents")
    return shuffle_shards(d)


@query(
    "length_batch_layout",
    """
    SELECT doc_id, CAST(n_chars AS BIGINT) AS length,
           CAST((row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) // 32 AS BIGINT) AS batch_id,
           CAST((row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) % 32 AS INT) AS slot
    FROM documents
    """,
)
def length_batch_layout(spark, sf_dir):
    """Length-bucketed batch layout (batch_size=32): deterministic
    dynamic-batching assignment minimizing fixed-shape padding
    (operators/sampling.batch_by_length — range-exchange global rank,
    no single-reducer sort)."""
    from ..operators.sampling import batch_by_length

    d = _t(spark, sf_dir, "documents")
    return batch_by_length(d, batch_size=32)


@query(
    "padding_efficiency_report",
    """
    WITH a AS (
      SELECT CAST(n_chars AS BIGINT) AS length,
             (row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) // 32 AS batch_id
      FROM documents),
    per AS (
      SELECT batch_id, count(*) AS n, sum(length) AS real, max(length) AS mx
      FROM a GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(real) AS BIGINT) AS real_tokens,
           CAST(sum(mx * n) AS BIGINT) AS padded_tokens,
           round(sum(real) / sum(mx * n), 6) AS efficiency
    FROM per
    """,
)
def padding_efficiency_report(spark, sf_dir):
    """Padding-waste metrics of the length-bucketed layout: every row padded
    to its batch max (operators/sampling.padding_stats)."""
    from ..operators.sampling import batch_by_length, padding_stats

    d = _t(spark, sf_dir, "documents")
    return padding_stats(batch_by_length(d, batch_size=32))


def _weighted_sample_sql(k: int = 100, seed: int = 42) -> str:
    seed_c = (seed * 0x9E3779B97F4A7C15) % (1 << 64)
    return f"""
WITH __m0 AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         xor(doc_id::UBIGINT, {seed_c}::UBIGINT) AS h
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
{_sql._splitmix64_ctes("__m0", "doc_id, weight")},
__k AS (
  SELECT doc_id, weight,
         (((h >> 1)::BIGINT >> 10) + 1) / 9007199254740992.0 AS u
  FROM __mixed),
__s AS (
  SELECT doc_id, weight,
         CAST(round(ln(u) / weight * 1e6) AS BIGINT) AS es_micro
  FROM __k)
SELECT doc_id, weight, es_micro,
       CAST(row_number() OVER (ORDER BY es_micro DESC, doc_id) AS INT) AS rank
FROM __s ORDER BY es_micro DESC, doc_id LIMIT {k}
"""


# A-ES weighted sampling without replacement; the oracle reuses the
# MinHash kernel's splitmix64 UHUGEINT replica for the seeded uniform.
@query("weighted_docs_sample", _weighted_sample_sql())
def weighted_docs_sample(spark, sf_dir):
    """Efraimidis–Spirakis weighted sample (k=100, weight=n_chars):
    seeded-uniform ln(u)/w keys quantized to micro-units, global
    TakeOrdered — no corpus shuffle (operators/sampling.weighted_sample)."""
    from ..operators.sampling import weighted_sample

    d = _t(spark, sf_dir, "documents")
    return weighted_sample(d, k=100, weight_col="n_chars")


@query(
    "balanced_token_shards",
    """
    SELECT doc_id, weight,
           CAST(CASE WHEN (gpos // 8) % 2 = 0 THEN gpos % 8
                     ELSE 7 - gpos % 8 END AS INT) AS shard,
           CAST(gpos // 8 AS INT) AS pos
    FROM (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS gpos
      FROM documents
    )
    """,
)
def balanced_token_shards(spark, sf_dir):
    """Serpentine weight-balanced shard layout over the documents table
    (operators/sampling.balanced_shards, n_chars as the work weight)."""
    from ..operators.sampling import balanced_shards

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return balanced_shards(d, weight_col="n_chars", n_shards=8)


@query(
    "compaction_plan_documents",
    """
    WITH f AS (SELECT lang,
                      lpad(CAST(doc_id AS VARCHAR), 8, '0') AS file_path,
                      n_chars AS size_bytes
               FROM documents),
    p AS (SELECT *,
                 COALESCE(sum(size_bytes) OVER (
                     PARTITION BY lang ORDER BY file_path
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prev
          FROM f)
    SELECT lang, file_path, size_bytes,
           CAST(floor(prev / 4000.0) AS BIGINT) AS bin_id
    FROM p
    """,
)
def compaction_plan_documents(spark, sf_dir):
    """Small-file compaction plan (operators/layout.py): documents as
    per-language file listings packed into ~4000-byte bins by the
    deterministic prefix-sum rule — one window cumsum, no driver loop."""
    from ..operators.layout import compaction_plan

    d = _t(spark, sf_dir, "documents").select(
        "lang",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("file_path"),
        F.col("n_chars").alias("size_bytes"),
    )
    return compaction_plan(d, 4000, ["lang"])


@query(
    "zorder_layout_events",
    """
    WITH b AS (SELECT quantile_cont(user_id, [x * 1.0 / 16 FOR x IN range(1, 16)]) AS bu,
                      quantile_cont(value, [x * 1.0 / 16 FOR x IN range(1, 16)]) AS bv
               FROM events),
    c AS (SELECT event_id,
                 CASE WHEN user_id IS NULL THEN 0
                      ELSE len(list_filter(bu, x -> user_id >= x)) END AS cu,
                 CASE WHEN value IS NULL THEN 0
                      ELSE len(list_filter(bv, x -> value >= x)) END AS cv
          FROM events CROSS JOIN b)
    SELECT event_id,
           CAST((
             (((cu >> 0) & 1) << 0) + (((cv >> 0) & 1) << 1) +
             (((cu >> 1) & 1) << 2) + (((cv >> 1) & 1) << 3) +
             (((cu >> 2) & 1) << 4) + (((cv >> 2) & 1) << 5) +
             (((cu >> 3) & 1) << 6) + (((cv >> 3) & 1) << 7)
           ) AS BIGINT) AS zorder
    FROM c
    """,
)
def zorder_layout_events(spark, sf_dir):
    """Morton (Z-order) clustering keys over (user_id, value) at 4 bits per
    dimension (operators/layout.py zorder_key): exact-quantile cell
    normalization broadcast from one aggregate — no global-order window."""
    from ..operators.layout import zorder_key

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return zorder_key(e, ["user_id", "value"], bits=4).select("event_id", "zorder")
