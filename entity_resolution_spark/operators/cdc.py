"""Changelog application (CDC upsert/delete merge) — warehouse MERGE INTO
semantics as a pure DataFrame plan.

The reference pipeline consolidates datasets by join-and-decide
(reference consolidation paths, e.g. data_consolidation.py); a standing
Iceberg-shaped table at 10^12-row scale is instead maintained by folding
CHANGE streams into the last-known snapshot: inserts/updates upsert, a
delete tombstone removes the key. ``apply_changelog`` is that fold as one
declarative plan:

* the changelog (delta-sized) is reduced to its LAST row per key with a
  single map-side-combinable hash aggregate — ``max(struct(seq...,
  payload))`` — no window sort, no shuffle of the base;
* the base (corpus-sized) is touched exactly once, by a left-anti join
  against the latest-key frame, which AQE turns into a broadcast anti
  join whenever the delta is small — the standing table is never
  shuffled, the same delta-proportional contract as
  plans/incremental.py's fold and similarity_search.append_ivf_index.

Determinism: ``seq_cols`` must be a total order within each key (include
a unique tiebreaker, e.g. a change id); with that, the struct-max picks a
unique last row and the result is exactly the snapshot a sequential
MERGE replay would produce.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def latest_changes(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Reduce a changelog to its last change per key: one hash aggregate
    (map-side partials merge per key — linear in the delta, no sort).
    Returns key columns + ``op_col`` + the changelog's payload columns.
    """
    key_cols = list(key_cols)
    seq_cols = list(seq_cols)
    payload = [
        c for c in changelog.columns if c not in set(key_cols) | {op_col} | set(seq_cols)
    ]
    packed = F.struct(
        *[F.col(c) for c in seq_cols],
        F.struct(
            F.col(op_col).alias(op_col),
            *[F.col(c).alias(c) for c in payload],
        ).alias("__payload"),
    )
    agg = changelog.groupBy(*key_cols).agg(F.max(packed).alias("__last"))
    return agg.select(
        *key_cols,
        F.col(f"__last.__payload.{op_col}").alias(op_col),
        *[F.col(f"__last.__payload.{c}").alias(c) for c in payload],
    )


def apply_changelog(
    base: DataFrame,
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Fold a CDC changelog into a base snapshot (MERGE semantics).

    The changelog carries ``key_cols`` + ``seq_cols`` (total order per
    key) + ``op_col`` + the base's non-key payload columns. The last
    change per key wins: a delete op removes the key, anything else
    upserts its payload. Keys absent from the changelog keep their base
    row unchanged.

    Returns a DataFrame with exactly the base's columns.

    Scale shape: O(|delta| log-free hash agg) + one anti join on the
    base; the base is never aggregated, windowed, or shuffled on its own
    account (with a small delta the anti join broadcasts under AQE).
    """
    key_cols = list(key_cols)
    value_cols = [c for c in base.columns if c not in key_cols]
    latest = latest_changes(changelog, key_cols, seq_cols, op_col)
    missing = [c for c in value_cols if c not in latest.columns]
    if missing:
        raise ValueError(
            f"changelog is missing base payload columns {missing}; "
            f"changelog columns: {changelog.columns}"
        )
    untouched = base.join(latest.select(*key_cols), key_cols, "left_anti")
    upserts = latest.filter(F.col(op_col) != delete_op).select(*base.columns)
    return untouched.unionByName(upserts)
