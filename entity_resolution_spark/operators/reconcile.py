"""Snapshot reconciliation: row-level table diff and orderless content
fingerprints (engine-added warehouse operators; the reference consolidates
datasets by join-and-decide — e.g. its consolidation paths — but has no
snapshot-vs-snapshot audit. At Iceberg scale that audit is the first thing
an operator reaches for after a backfill or engine migration).

Scale shape:

* ``table_diff`` — ONE co-partitioned full-outer join on the key (both
  sides shuffle once on the key; with bucketed tables even that exchange
  disappears). The unchanged majority is dropped INSIDE the join's
  projection, so the output is delta-sized — at 10^12 rows the diff of a
  near-identical snapshot pair materializes almost nothing.
* ``diff_summary`` — the same join reduced to a per-status census (hash
  aggregate, map-side combine; never materializes per-row diffs).
* ``table_fingerprint`` — a per-group bit_xor of a 60-bit sha256 prefix
  over a caller-fixed canonical row rendering. bit_xor is commutative /
  associative, so the aggregate is orderless and map-side combinable, and
  two tables can be compared fingerprint-to-fingerprint without EITHER
  being sorted or co-shuffled — the cheapest possible cross-cluster
  equality check (one scan each side, group-sized output). 60 bits keeps
  the value inside a BIGINT on every engine (no unsigned wraparound).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_US = ""  # unit separator: canonical field delimiter


def _resolve_compare_cols(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None,
) -> list[str]:
    """Validate the comparison column set against BOTH sides. Silently
    intersecting with new.columns would hide a dropped column: rows
    differing only in it would report unchanged and the schema drop
    itself would be invisible in a snapshot-reconciliation audit.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    compare_cols = list(compare_cols)
    missing_new = [c for c in compare_cols if c not in new.columns]
    missing_old = [c for c in compare_cols if c not in old.columns]
    if missing_new or missing_old:
        parts = []
        if missing_new:
            parts.append(f"missing from new: {missing_new}")
        if missing_old:
            parts.append(f"missing from old: {missing_old}")
        raise ValueError(
            "table_diff: comparison columns not present on both sides "
            f"({'; '.join(parts)}). A dropped/renamed column is a schema "
            "change the diff must not silently ignore - pass compare_cols "
            "restricted to the shared columns to compare values only."
        )
    return compare_cols


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots sharing a key: one row per key that
    was added, removed, or changed — (keys..., status, changed_cols), where
    ``changed_cols`` is the comma-joined sorted list of differing columns
    (NULL-safe comparison; '' never occurs — unchanged rows are dropped).
    """
    keys = list(keys)
    compare_cols = _resolve_compare_cols(old, new, keys, compare_cols)
    # presence flags must come from a column that exists on each side; with
    # no compare columns, a constant marker column is joined in instead
    if not compare_cols:
        o = old.select(*keys, F.lit(1).alias("__m")).alias("o")
        n = new.select(*keys, F.lit(1).alias("__m")).alias("n")
        joined = o.join(n, on=keys, how="full_outer")
        present_old = F.col("o.__m").isNotNull()
        present_new = F.col("n.__m").isNotNull()
        changed = F.lit(False)
        changed_cols = F.lit("")
    else:
        # a full-outer join leaves the non-matching side's columns NULL;
        # presence is tracked explicitly so all-NULL payload rows are not
        # mistaken for absent rows
        o = old.select(*keys, F.lit(1).alias("__mo"), *compare_cols).alias("o")
        n = new.select(*keys, F.lit(1).alias("__mn"), *compare_cols).alias("n")
        joined = o.join(n, on=keys, how="full_outer")
        present_old = F.col("o.__mo").isNotNull()
        present_new = F.col("n.__mn").isNotNull()
        diffs = [
            F.when(
                ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
            )
            for c in sorted(compare_cols)
        ]
        changed_cols = F.concat_ws(",", *diffs)
        changed = changed_cols != ""
    status = (
        F.when(present_old & ~present_new, F.lit("removed"))
        .when(~present_old & present_new, F.lit("added"))
        .when(changed, F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(
            *keys,
            "status",
            F.when(F.col("status") == "changed", changed_cols)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Census of the diff: (status, n_rows) for added/removed/changed/
    unchanged — the same single join, reduced by a hash aggregate without
    ever materializing per-row diff output.
    """
    keys = list(keys)
    compare_cols = _resolve_compare_cols(old, new, keys, compare_cols)
    o = old.select(*keys, F.lit(1).alias("__mo"), *compare_cols).alias("o")
    n = new.select(*keys, F.lit(1).alias("__mn"), *compare_cols).alias("n")
    joined = o.join(n, on=keys, how="full_outer")
    present_old = F.col("o.__mo").isNotNull()
    present_new = F.col("n.__mn").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    status = (
        F.when(present_old & ~present_new, F.lit("removed"))
        .when(~present_old & present_new, F.lit("added"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_rows"))
    )


def canonical_row(rendered_cols: Sequence) -> F.Column:
    """Join pre-rendered string columns with the unit separator; the caller
    fixes each column's rendering (casts, printf formats, NULL markers) so
    the canonical string — and therefore the fingerprint — is engine-
    independent by construction.
    """
    return F.concat_ws(_US, *rendered_cols)


def table_fingerprint(
    df: DataFrame,
    by: Sequence[str],
    rendered: F.Column,
) -> DataFrame:
    """Per-group orderless content fingerprint: (by..., n_rows,
    fingerprint) with fingerprint = bit_xor over rows of the first 60 bits
    of sha256(rendered). ``rendered`` must be a non-NULL string column
    (build it with `canonical_row`).

    One scan + one map-side-combinable hash aggregate; no sort, no join.
    Equal groups ⇒ equal (n_rows, fingerprint); a mismatch localizes the
    damage to a group without comparing rows.
    """
    h = F.conv(F.substring(F.sha2(rendered, 256), 1, 15), 16, 10).cast("long")
    return (
        df.select(*by, h.alias("_h"))
        .groupBy(*by)
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(_h)").alias("fingerprint"),
        )
    )
