"""Physical-layout planning operators: small-file compaction and Z-order
keys.

At 100 TB the dominant cost of a badly-laid-out table is not compute but
I/O amplification: millions of KB-sized files (one per streaming
micro-batch or per skewed shuffle task) destroy scan throughput, and
range queries over un-clustered keys read every file. These operators
compute the PLANS — which files merge into which output bin, which sort
key co-locates which rows — as plain DataFrames, so the rewrite itself
stays an ordinary partitioned write (sources/io.py).

Both are single window/aggregate passes per partition: no joins, no
pairs, deterministic for any input order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    file_stats: DataFrame,
    target_bytes: int,
    partition_cols: Sequence[str] | None = None,
    path_col: str = "file_path",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Assign each input file to an output bin of ~``target_bytes``
    (Delta/Iceberg OPTIMIZE-style bin packing, next-fit over the stable
    path order): files are taken in ``path_col`` order within each
    partition and a file opens a new bin when the bytes already packed
    into the current one reach the target. Oversized files (>= target)
    get a bin of their own by the same rule.

    Returns the input columns plus ``bin_id`` (monotone per partition;
    an oversized file advances the id by its own multiple of the target,
    so ids can skip — they group and order bins, they are not dense).
    This is concat-then-chunk packing (the sampling.py sequence-packing
    coordinates applied to bytes), not first-fit-decreasing: the plan is
    a pure window cumsum — one shuffle on the partition key, no driver
    loop, byte-identical plans for identical listings — and wastes at
    most one max-file of slack per bin, which a compaction pass (unlike
    a knapsack) happily trades for determinism.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    gc = list(partition_cols or [])
    w = (
        Window.partitionBy(*[F.col(c) for c in gc]).orderBy(path_col)
        if gc
        else Window.partitionBy().orderBy(path_col)
    )
    # bytes packed BEFORE this file; a bin closes once it has >= target
    prev = F.coalesce(
        F.sum(F.col(size_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    # bin_id = number of closed bins before this file = floor of how many
    # times the running prefix crossed the target — computed exactly with
    # integer division on the PREFIX sum (a file lands in the bin open at
    # its arrival; the bin that was open when prefix // target last grew)
    return file_stats.withColumn("bin_id", (prev / F.lit(target_bytes)).cast("long"))


def compaction_summary(
    plan: DataFrame,
    partition_cols: Sequence[str] | None = None,
    size_col: str = "size_bytes",
    target_bytes: int | None = None,
) -> DataFrame:
    """Per-partition rollup of a compaction_plan: (partition..., n_files,
    n_bins, total_bytes, max_bin_bytes, fill_ratio round-6 when
    ``target_bytes`` given)."""
    gc = list(partition_cols or [])
    bins = plan.groupBy(*gc, "bin_id").agg(
        F.count(F.lit(1)).alias("__nf"), F.sum(size_col).alias("__bb")
    )
    out = bins.groupBy(*gc).agg(
        F.sum("__nf").alias("n_files"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("__bb").alias("total_bytes"),
        F.max("__bb").alias("max_bin_bytes"),
    )
    if target_bytes is not None:
        out = out.withColumn(
            "fill_ratio",
            F.round(
                F.col("total_bytes")
                / (F.col("n_bins") * F.lit(float(target_bytes))),
                6,
            ),
        )
    return out


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
) -> DataFrame:
    """Append a Morton (Z-order) interleave key over ``cols`` for
    multi-dimensional clustering: each column is quantile-normalized into
    ``bits`` bits — cell(x) = how many of the column's 2^bits - 1 exact
    quantile boundaries x has reached (rank-based, so skewed or
    arbitrary-scale columns still spread evenly; NULLs land in cell 0) —
    then the cells interleave column-round-robin into one ``zorder``
    long. Sorting / range-partitioning by it gives every listed column
    locality within files, which is exactly what min-max data skipping
    prunes on.

    Scale shape: one exact-percentile aggregate computes every column's
    boundary array, broadcast back as a single row; the cell assignment
    is a counted array filter per row. NO global-order window — a
    percent_rank with an empty PARTITION BY would drag the whole table
    through one task, the classic Z-order anti-plan. At most 63 total
    bits (len(cols) * bits <= 63).
    """
    cols = list(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError("need 1 <= bits and len(cols)*bits <= 63")
    hi = (1 << bits) - 1
    fracs = F.array(*[F.lit(k / (hi + 1)) for k in range(1, hi + 1)])
    bounds = df.agg(
        *[
            F.percentile(F.col(c), fracs).alias(f"__b_{i}")
            for i, c in enumerate(cols)
        ]
    )
    out = df.crossJoin(F.broadcast(bounds))
    cells = []
    for i, c in enumerate(cols):
        name = f"__cell_{i}"
        out = out.withColumn(
            name,
            F.when(
                F.col(c).isNull(), F.lit(0)
            ).otherwise(
                F.size(F.filter(F.col(f"__b_{i}"), lambda b: F.col(c) >= b))
            ).cast("long"),
        )
        cells.append(name)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, name in enumerate(cells):
            z = z + F.shiftleft(
                F.shiftright(F.col(name), b).bitwiseAND(F.lit(1)),
                b * len(cells) + i,
            ).cast("long")
    return out.withColumn("zorder", z).drop(*cells, *[f"__b_{i}" for i in range(len(cols))])


def file_minmax_stats(
    df: DataFrame,
    file_col: str,
    value_col: str,
) -> DataFrame:
    """Per-file (min, max, row count) of ``value_col`` — the zone-map /
    Iceberg-manifest statistics a scan planner prunes with. One hash
    aggregate keyed on the file id; this IS the metadata a lakehouse
    table format keeps per data file, so at 100 TB the frame is
    manifest-sized, not data-sized.
    """
    return df.groupBy(F.col(file_col).alias("file_id")).agg(
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def skipping_report(
    stats: DataFrame,
    intervals: Sequence[tuple[float, float]],
    layout_name: str = "layout",
) -> DataFrame:
    """Min-max data-skipping effectiveness: for each closed predicate
    interval [lo, hi], how many files a zone-map scan planner must READ
    (file range overlaps the predicate) vs can SKIP, and the row-count
    upper bound the read set implies. This quantifies what a clustering
    layout (zorder_key / sorted writes) actually buys: the same rows
    under an insertion-order layout overlap every interval, under a
    value-clustered layout almost none.

    Returns (layout, lo, hi, n_files, files_read, files_skipped,
    rows_read_upper, skip_ratio round-6). Cost: stats is manifest-sized
    and the interval list is tiny — a broadcast theta join over metadata,
    never a data scan; NULL-only files (min/max NULL) are conservatively
    read, exactly as a planner without null-counts must.
    """
    if not intervals:
        raise ValueError("intervals must be non-empty")
    spark = stats.sparkSession
    iv = spark.createDataFrame(
        [(float(lo), float(hi)) for lo, hi in intervals], "lo double, hi double"
    )
    overlaps = F.col("min_v").isNull() | ~(
        (F.col("max_v") < F.col("lo")) | (F.col("min_v") > F.col("hi"))
    )
    joined = stats.crossJoin(F.broadcast(iv))
    return (
        joined.groupBy("lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(overlaps.cast("long")).alias("files_read"),
            F.sum(F.when(overlaps, F.col("n_rows")).otherwise(0)).alias(
                "rows_read_upper"
            ),
        )
        .select(
            F.lit(layout_name).alias("layout"),
            "lo",
            "hi",
            "n_files",
            "files_read",
            (F.col("n_files") - F.col("files_read")).alias("files_skipped"),
            "rows_read_upper",
            F.round(
                (F.col("n_files") - F.col("files_read")) / F.col("n_files"), 6
            ).alias("skip_ratio"),
        )
    )


def range_boundaries(
    df: DataFrame,
    value_col: str,
    n_partitions: int,
) -> DataFrame:
    """Range-partition boundary planning for a globally sorted write (the
    Iceberg sort-order / repartitionByRange layout step, made explicit):
    boundary i is the exact ``i/n`` quantile of ``value_col``, so the
    resulting ranges hold ~equal row counts even under heavy skew —
    unlike fixed-width ranges, which skew destroys.

    Returns one row per partition: (partition_id, lo, hi round-6,
    n_rows) where lo is inclusive (NULL for the first partition = open
    below), hi exclusive (NULL for the last = open above), and n_rows
    counts the rows the range captures (inclusive-lower / exclusive-upper,
    so a row equal to a boundary lands in the partition whose ``lo`` it
    is; duplicate quantile values under heavy ties simply leave the
    squeezed partitions empty). One exact-percentile aggregate + one
    broadcast range count; the boundary frame is n_partitions-sized.
    """
    if n_partitions < 2:
        raise ValueError("n_partitions must be >= 2")
    qs = [i / n_partitions for i in range(1, n_partitions)]
    bounds = df.agg(
        F.percentile(F.col(value_col), F.array(*[F.lit(q) for q in qs])).alias("__b")
    )
    parts = bounds.select(
        F.posexplode(
            F.concat(
                F.array(F.lit(None).cast("double")),
                F.col("__b").cast("array<double>"),
            )
        ).alias("partition_id", "lo")
    ).withColumn(
        "hi",
        F.lead("lo").over(
            Window.orderBy("partition_id")
        ),
    )
    counted = (
        df.select(F.col(value_col).cast("double").alias("__v"))
        .join(
            F.broadcast(parts),
            (F.col("lo").isNull() | (F.col("__v") >= F.col("lo")))
            & (F.col("hi").isNull() | (F.col("__v") < F.col("hi"))),
            "right",
        )
        .groupBy("partition_id", "lo", "hi")
        .agg(F.sum(F.when(F.col("__v").isNotNull(), 1).otherwise(0)).alias("n_rows"))
    )
    return counted.select(
        "partition_id",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        "n_rows",
    )


def sortedness_report(
    df: DataFrame,
    key: str,
    pos_col: str,
    order_col: str,
) -> DataFrame:
    """One row (n_rows, n_pairs, n_inversions, sortedness): when each
    key's rows are laid out in ``pos_col`` order (the ingestion /
    write-position column), what fraction of ADJACENT pairs is already
    non-decreasing in ``order_col``? 1.0 means writing in arrival order
    IS the clustered layout (zone maps prune for free); low values
    quantify the re-sort a clustered layout (see `zorder_key` /
    `range_boundaries`) would pay for and the scan-pruning it would buy.

    One key-partitioned window pass (per-key frames are the key's own
    rows, events-per-user sized) reduced to a single row. NULL order
    values are excluded; ``pos_col`` ties are broken by ``order_col`` so
    the count is deterministic.
    """
    w = Window.partitionBy(key).orderBy(pos_col, "_v")
    stepped = (
        df.where(F.col(order_col).isNotNull())
        .select(key, F.col(pos_col), F.col(order_col).alias("_v"))
        .withColumn("_prev", F.lag("_v").over(w))
    )
    return stepped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("_prev").alias("n_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("_v") < F.col("_prev"), 1).otherwise(0)), F.lit(0)
        ).alias("n_inversions"),
        F.round(
            F.lit(1.0)
            - F.coalesce(
                F.sum(F.when(F.col("_v") < F.col("_prev"), 1).otherwise(0)),
                F.lit(0),
            )
            / F.greatest(F.count("_prev"), F.lit(1)).cast("double"),
            6,
        ).alias("sortedness"),
    )
