"""Slowly-changing-dimension (type 2) history construction.

Entity resolution feeds a dimension table; downstream warehouses almost
always want that dimension VERSIONED — "what did this entity look like
when the order shipped" — which is the classic SCD2 shape (Kimball):
one row per (key, attribute-state) episode with [valid_from, valid_to)
bounds, the open episode carrying valid_to = NULL. Paired with the as-of
join (operators/asof.py) this gives point-in-time entity lookup.

``scd2_from_events`` builds the full history from a raw change log in two
window passes over the key: change detection (lag — a row opens an
episode only when its tracked attributes differ from the previous state)
then bound assignment (lead over the surviving change rows). Both windows
partition by the entity key, so a 100 TB log shuffles once by key and
every key's history builds independently; no driver loops, no joins.

Determinism: simultaneous events (same key, same timestamp) are ordered
by the tracked attribute values themselves, so replays of an unordered
log produce identical histories.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_events(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """(key..., attr..., valid_from, valid_to, version) — one row per
    attribute-state episode per key; ``valid_to`` is NULL for the open
    episode, ``version`` numbers episodes 1..n per key in time order.
    Consecutive events with identical tracked attributes collapse into
    the earlier episode (NULL-safe comparison: NULL -> NULL is "no
    change", NULL -> value is a change)."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    if not keys or not attrs:
        raise ValueError("key_cols and attr_cols must be non-empty")
    order = [F.col(ts_col)] + [F.col(a) for a in attrs]
    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.struct(*[F.col(a) for a in attrs])
    changed = ~state.eqNullSafe(F.lag(state).over(w)) | F.lag(state).over(w).isNull()
    # lag(struct) is NULL only for the first row; eqNullSafe keeps the
    # comparison total, and the explicit isNull keeps row 1 an episode even
    # when its state equals the struct NULL would compare unequal to anyway
    ep = events.select(*keys, F.col(ts_col), *attrs).withColumn(
        "__chg", changed
    ).where(F.col("__chg"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return ep.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


def scd2_point_in_time(
    history: DataFrame,
    at_ts,
    key_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Snapshot of an SCD2 history at ``at_ts`` (a literal or Column):
    the episode with valid_from <= at_ts < valid_to (open episodes match
    any later timestamp). One filter — no window, no join."""
    ts = F.lit(at_ts) if not hasattr(at_ts, "_jc") else at_ts
    return history.where(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    )
