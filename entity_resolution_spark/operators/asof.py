"""As-of (nearest-prior) join — an operator Spark's API lacks natively.

``asof_join(probe, build)``: for every probe row, attach the build row
with the same key whose timestamp is the latest one <= the probe's
timestamp (the time-series point-in-time join).

Spark-first implementation — NO per-row Python, no range-explode blowup,
and a SINGLE pass: union the two tagged inputs (probe rows carry their own
columns, build rows carry theirs; the other side's slots are null), sort
within each key partition by (ts, side), carry the build attributes
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window, keep probe rows. The carried value is ONE struct per build row —
not per-column lasts — so a NULL in some build attribute stays NULL in the
output instead of being back-filled from an older build row (per-column
carry would silently stitch attributes of different build rows into a
fabricated result). One shuffle on the key; O((n+m) log) per key
partition, independent of time density — the naive
``probe.join(build, key).where(b.ts <= p.ts)`` + max-window alternative is
quadratic per key and dies on hot keys. No row-identity column is needed
(an earlier design joined back on ``monotonically_increasing_id``, whose
values are only stable per physical plan execution — a correctness hazard
under branch recomputation).

Tie rules: a build row at exactly the probe timestamp matches (<=); among
build rows with equal (key, ts) the last under ``__seq`` order (input
order of the build frame's sort below) wins deterministically because the
window orders by (ts, side, seq).

Hot keys: the default single window partitions by the bare key, so ONE
key with a billion rows is one partition — a straggler at scale. Pass
``chunk_seconds`` to switch to the segmented-scan plan: rows are bucketed
by time chunk, the same carry-forward window runs per (key, chunk) —
partition size bounded by chunk density, not key cardinality — and the
cross-chunk carry is resolved on the tiny one-row-per-(key, chunk) frame
(last build row of each earlier chunk, carried with a second window whose
per-key row count is the number of chunks, not rows). The final value per
probe row is coalesce(within-chunk carry, previous-chunk carry). Output
is identical to the single-window plan (asserted in tests/test_asof.py)
except for NULL-timestamp rows, which the chunked plan groups in a
sentinel first chunk (same sort-first semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    build_cols: list[str] | None = None,
    suffix: str = "_asof",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Return probe rows + as-of matched build columns (null when no build
    row precedes the probe row). ``chunk_seconds`` enables the hot-key-safe
    segmented plan (see module docstring); pick it so one key-chunk holds a
    bounded number of rows (e.g. 86_400 for per-day chunks)."""
    from pyspark.sql import types as T

    build_cols = build_cols or [c for c in build.columns if c not in (on, build_ts)]
    probe_cols = [c for c in probe.columns]
    # the build attributes travel as ONE struct: non-null for every build row
    # (even when all its fields are null), so last(ignorenulls) picks the
    # as-of matched ROW atomically and genuine field NULLs survive
    b_struct_type = T.StructType([build.schema[c] for c in build_cols])

    b = build.select(
        F.col(on).alias("__key"),
        F.col(build_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),  # build sorts before probe at equal ts
        # deterministic order among equal-(key, ts) build rows
        F.xxhash64(*[F.col(c) for c in build.columns]).alias("__seq"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"__p_{c}") for c in probe_cols],
        F.struct(*[F.col(c).alias(c) for c in build_cols]).alias("__b"),
    )
    p = probe.select(
        F.col(on).alias("__key"),
        F.col(probe_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__seq"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols],
        F.lit(None).cast(b_struct_type).alias("__b"),
    )
    u = b.unionByName(p)

    if chunk_seconds is None:
        w = (
            Window.partitionBy("__key")
            .orderBy("__ts", "__side", "__seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = u.select(
            "__side",
            *[F.col(f"__p_{c}") for c in probe_cols],
            F.last("__b", ignorenulls=True).over(w).alias("__b"),
        )
    else:
        # segmented scan: null ts -> sentinel first chunk (null sorts first
        # in the single-window plan; the sentinel preserves that, and keeps
        # every join key non-null)
        chunk = F.coalesce(
            F.floor(F.col("__ts").cast("long") / chunk_seconds),
            F.lit(-(1 << 62)),
        )
        uc = u.withColumn("__chunk", chunk)
        w_local = (
            Window.partitionBy("__key", "__chunk")
            .orderBy("__ts", "__side", "__seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = uc.withColumn("__local", F.last("__b", ignorenulls=True).over(w_local))
        # last build row of each chunk (one row per (key, chunk) with builds)
        chunk_last = (
            uc.filter(F.col("__side") == 0)
            .groupBy("__key", "__chunk")
            .agg(F.max_by("__b", F.struct("__ts", "__seq")).alias("__final"))
        )
        # carry across chunks on the tiny per-(key, chunk) frame; include
        # probe-only chunks via the distinct chunk set
        all_chunks = uc.select("__key", "__chunk").distinct()
        w_carry = (
            Window.partitionBy("__key")
            .orderBy("__chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            all_chunks.join(chunk_last, ["__key", "__chunk"], "left")
            .withColumn("__carry", F.last("__final", ignorenulls=True).over(w_carry))
            .select("__key", "__chunk", "__carry")
        )
        carried = local.join(carry, ["__key", "__chunk"]).select(
            "__side",
            *[F.col(f"__p_{c}") for c in probe_cols],
            F.coalesce("__local", "__carry").alias("__b"),
        )

    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__p_{c}").alias(c) for c in probe_cols],
        *[F.col("__b")[c].alias(c + suffix) for c in build_cols],
    )
