"""Deterministic distributed Bloom filter (build + probe).

The membership prefilter a 100 TB decontamination / blocklist pass wants:
build a filter over the REFERENCE key set (benchmark n-grams, banned
digests, seen URLs), broadcast its bit positions, and probe the corpus
with a join — no corpus shuffle, no driver-side bitmap, and (unlike
Spark's private `BloomFilter` / `bloom_filter_agg`) every bit is a
deterministic content address any engine reproduces:

  hash_i(v) = int(sha256(v).hex[15*i : 15*i + 15], 16) mod m    i < k

(15 hex chars = 60 bits per slice; sha256 yields 64 hex chars, so up to
4 independent slices — k <= 4.) The "bit array" is the DISTINCT set of
set positions — at most m rows, broadcastable for any practical m; the
guarantee is the textbook one: NO false negatives, false positives at
the standard (1 - e^{-kn/m})^k rate.

Reference scope: engine-added (the reference has no sketch surface);
this is the scale path in front of `decontam.ngram_contamination` when
the benchmark side is too large to broadcast raw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_K = 4  # 64 hex chars / 15 per slice


def _positions(val: Column, m: int, k: int) -> Column:
    """array<long> of the k bit positions for a value — sha256 hex slices
    mod m, identical in any engine."""
    hx = F.sha2(val.cast("string"), 256)
    return F.array(
        *[
            F.conv(F.substring(hx, 1 + 15 * i, 15), 16, 10).cast("long") % m
            for i in range(k)
        ]
    )


def bloom_build(keys: DataFrame, key_col: str, m: int = 1 << 16, k: int = 4) -> DataFrame:
    """One column ``pos`` — the distinct set bit positions of the filter
    (<= m rows). Build cost: one narrow explode + distinct over the key
    set; the result is the broadcastable artifact `bloom_probe` consumes
    (persist it as parquet to reuse across runs)."""
    if not 1 <= k <= _MAX_K:
        raise ValueError(f"k must be in [1, {_MAX_K}], got {k}")
    return (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.explode(_positions(F.col(key_col), m, k)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """probe columns + ``member`` (INT 0/1): 1 iff ALL k positions of the
    key are set in the filter. No false negatives; false positives at the
    Bloom rate for the build's (n, m, k).

    Scale shape: the filter broadcasts (<= m rows); the probe side
    explodes k rows per key and aggregates back — linear in the probe
    table, zero shuffles of it beyond the per-key combine."""
    if not 1 <= k <= _MAX_K:
        raise ValueError(f"k must be in [1, {_MAX_K}], got {k}")
    exploded = probe.select(
        "*", F.explode(_positions(F.col(key_col), m, k)).alias("__pos")
    )
    hit = exploded.join(
        F.broadcast(bloom.select(F.col("pos").alias("__pos"), F.lit(1).alias("__hit"))),
        "__pos",
        "left",
    )
    agg = hit.groupBy(*probe.columns).agg(
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("__hits")
    )
    return agg.select(
        *probe.columns, (F.col("__hits") == k).cast("int").alias("member")
    )


def cm_sketch_build(
    df: DataFrame, key_col: str, w: int = 2048, d: int = 4
) -> DataFrame:
    """(row, col, cnt) — a count-min sketch (Cormode & Muthukrishnan 2005)
    of the key column's frequency distribution, in at most d*w rows. The
    same engine-portable sha-slice hashing as `bloom_build`: row i uses
    hex slice i, col = slice mod w. Build cost: one narrow d-explode +
    map-side-combined count; the sketch is broadcastable for any
    practical (w, d)."""
    if not 1 <= d <= _MAX_K:
        raise ValueError(f"d must be in [1, {_MAX_K}], got {d}")
    rows = df.filter(F.col(key_col).isNotNull()).select(
        F.posexplode(_positions(F.col(key_col), w, d)).alias("row", "col")
    )
    return rows.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def cm_estimate(
    probe: DataFrame,
    sketch: DataFrame,
    key_col: str,
    w: int = 2048,
    d: int = 4,
) -> DataFrame:
    """probe columns + ``est_count`` — the count-min frequency estimate:
    min over the d rows of the sketch counters at the key's positions.
    Never underestimates; overestimates by at most 2n/w with probability
    1 - 2^-d (the textbook bound). Missing counters read 0.

    Scale shape: the sketch broadcasts (<= d*w rows); the probe side
    explodes d rows per key and min-aggregates back — linear, no shuffle
    of the probe table beyond the per-key combine."""
    if not 1 <= d <= _MAX_K:
        raise ValueError(f"d must be in [1, {_MAX_K}], got {d}")
    exploded = probe.select(
        "*", F.posexplode(_positions(F.col(key_col), w, d)).alias("__row", "__col")
    )
    joined = exploded.join(
        F.broadcast(
            sketch.select(
                F.col("row").alias("__row"), F.col("col").alias("__col"), "cnt"
            )
        ),
        ["__row", "__col"],
        "left",
    )
    return joined.groupBy(*probe.columns).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count")
    )
