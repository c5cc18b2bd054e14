"""Deterministic corpus sampling/splitting for training-data pipelines.

Two operators a 100 TB curation run needs constantly:

- ``deterministic_split``: hash-based train/val/test assignment. Pure
  JVM expression (sha256 hex prefix compared lexicographically against
  precomputed thresholds) — narrow, codegen'd, no shuffle, and the
  assignment is a content-address: stable across runs, partitionings,
  cluster sizes, and engine versions (any system that can sha256 a string
  reproduces it — the DuckDB oracle does exactly that).

- ``per_source_cap``: keep at most ``cap`` rows per source (data-mixing /
  domain balancing). Exact semantics are "the cap smallest rows per source
  in (hash, key) order", i.e. a deterministic uniform sample without
  replacement. The direct plan is one window over a shuffle on source;
  a skewed source (half the corpus from one crawl) makes that a
  single-partition sort straggler, so for corpus-scale sources an optional
  hash *prefilter* bounds the sorted volume per source to ~margin*cap rows
  before the exact window runs, with a counted repair pass for any source
  the conservative prefilter undershot (never silent, and the final rows
  are identical to the exact plan — verified in tests/test_sampling.py).

Reference parity note: the reference (encrypted-ai/entity_resolution) has
no sampling surface; these are engine-added operators for the
training-data-pipeline axis of the task brief (sampling caps appear in the
reference only as the describe-time row cap, entity_resolution.py:117 area,
covered by schema_matching.sample_rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_COL = "__split_h"


def _hash_hex(key: Column, salt: str) -> Column:
    """Lowercase sha256 hex of salt+key — identical in Spark and DuckDB."""
    return F.sha2(F.concat(F.lit(salt), key.cast("string")), 256)


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(label, upper-bound-hex) pairs over the first 8 hex chars.

    Buckets are [prev, bound) in lexicographic hex order; the last label
    absorbs rounding remainder so every row gets a label.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    out: list[tuple[str, str]] = []
    cum = 0.0
    for label, frac in fractions.items():
        cum += frac
        bound = min(int(cum * 16**8), 16**8 - 1)
        out.append((label, format(bound, "08x")))
    return out


def deterministic_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split:",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split label by hashing ``key_col``.

    Keying on a stable id (not content) keeps near-duplicate leakage
    decisions orthogonal: dedup first, then split, and a doc's split never
    changes when unrelated docs are added (the property random sampling
    lacks).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    pairs = split_thresholds(fractions)
    h8 = _hash_hex(F.col(key_col), salt).substr(1, 8)
    # first-match CASE chain over cumulative bounds; last label is the tail
    chain = None
    for label, bound in pairs[:-1]:
        cond = h8 < F.lit(bound)
        chain = F.when(cond, F.lit(label)) if chain is None else chain.when(cond, F.lit(label))
    expr = F.lit(pairs[-1][0]) if chain is None else chain.otherwise(F.lit(pairs[-1][0]))
    return df.withColumn(out_col, expr)


def per_source_cap(
    df: DataFrame,
    source_col: str,
    key_col: str,
    cap: int,
    salt: str = "cap:",
    prefilter_margin: float | None = None,
) -> DataFrame:
    """Keep the ``cap`` smallest rows per source in (sha256, key) order.

    prefilter_margin=None runs the exact one-window plan. A float (e.g.
    4.0) enables the skew-safe path: rows whose hash fraction exceeds
    margin*cap/count(source) can't be in the winning cap except with
    vanishing probability, so they are dropped before the sort; sources
    where the conservative bound still undershot (kept < min(cap, n)) are
    recomputed exactly — counted, not silent. Output rows are identical to
    the exact plan either way.
    """
    h = _hash_hex(F.col(key_col), salt)
    w = Window.partitionBy(source_col).orderBy(_HASH_COL, key_col)

    def _exact(frame: DataFrame) -> DataFrame:
        return (
            frame.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )

    hashed = df.withColumn(_HASH_COL, h)
    if prefilter_margin is None:
        return _exact(hashed).drop(_HASH_COL)

    counts = hashed.groupBy(source_col).agg(F.count("*").alias("__n"))
    # fraction of the 60-bit hash prefix space each source may keep
    frac = F.least(F.lit(1.0), F.lit(float(prefilter_margin) * cap) / F.col("__n"))
    hashed = hashed.join(counts, source_col, "inner").withColumn(
        "__hfrac", F.conv(F.substring(_HASH_COL, 1, 15), 16, 10).cast("long") / F.lit(float(16**15))
    )
    survivors = hashed.filter(F.col("__hfrac") <= frac).drop("__hfrac")
    kept = _exact(survivors).persist()
    kept_counts = kept.groupBy(source_col).agg(F.count("*").alias("__kept"))
    undershot = (
        counts.join(kept_counts, source_col, "left")
        .filter(F.coalesce(F.col("__kept"), F.lit(0)) < F.least(F.col("__n"), F.lit(cap)))
        .select(source_col)
    )
    bad = [r[0] for r in undershot.collect()]  # control-plane: tiny by construction
    if bad:
        repair = _exact(hashed.filter(F.col(source_col).isin(bad)).drop("__hfrac"))
        kept = kept.filter(~F.col(source_col).isin(bad)).unionByName(
            repair.select(kept.columns)
        )
    return kept.drop(_HASH_COL, "__n")


def sample_to_token_budget(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    salt: str = "budget",
) -> DataFrame:
    """Per-source subset whose token count just reaches ``budget_tokens``
    (training-data mixing: "N tokens of web, M of code").

    Rows are taken in content-address (sha256-hash, key) order — stable
    under any partitioning / corpus growth, like deterministic_split — and
    a row is kept iff the running token sum BEFORE it is under the budget,
    so the budget is met (first row crossing the boundary is included),
    never undershot while tokens remain. Skew note: the per-source cumsum
    window is the per_source_cap trade-off; for a corpus-scale source the
    same hash-prefilter pattern applies (bound ~budget/min_doc_tokens rows
    before the exact window).
    """
    from ..functions.text import whitespace_token_count_col

    tokens = (
        F.col(token_col) if token_col else whitespace_token_count_col(F.col(text_col))
    ).cast("long")
    w = Window.partitionBy(source_col).orderBy(_HASH_COL, key_col)
    cum = F.sum("__tok").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.withColumn(_HASH_COL, _hash_hex(F.col(key_col), salt))
        .withColumn("__tok", tokens)
        .withColumn("__cum", cum)
        .filter(F.col("__cum") - F.col("__tok") < F.lit(int(budget_tokens)))
        .drop(_HASH_COL, "__tok", "__cum")
    )


def pack_into_sequences(
    df: DataFrame,
    seq_len: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """GPT-style streaming sequence packing: documents are laid end-to-end
    per source in content-address order and each gets its training-sequence
    coordinates — ``seq_id = floor(start / seq_len)``, ``seq_offset =
    start % seq_len`` (a document may straddle a boundary; readers split at
    materialization, the standard concat-then-chunk packing). Deterministic
    for any partitioning; output is scalar columns (source, key, n_tokens,
    seq_id, seq_offset)."""
    from ..functions.text import whitespace_token_count_col

    tokens = (
        F.col(token_col) if token_col else whitespace_token_count_col(F.col(text_col))
    ).cast("long")
    w = Window.partitionBy(source_col).orderBy(_HASH_COL, key_col)
    cum = F.sum("__tok").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.col("__cum") - F.col("__tok")).alias("__start")
    return (
        df.withColumn(_HASH_COL, _hash_hex(F.col(key_col), salt))
        .withColumn("__tok", tokens)
        .withColumn("__cum", cum)
        .select(
            source_col,
            key_col,
            F.col("__tok").alias("n_tokens"),
            F.floor((F.col("__cum") - F.col("__tok")) / F.lit(int(seq_len))).alias("seq_id"),
            ((F.col("__cum") - F.col("__tok")) % F.lit(int(seq_len))).alias("seq_offset"),
        )
    )
