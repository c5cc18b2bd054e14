"""Ordered-funnel conversion analysis over an event stream.

The classic product-analytics question — of the users who did A, how
many went on to do B, then C, IN THAT ORDER — applied to any
(user, timestamp, type) event table. Each stage requires an event
STRICTLY after the user's earliest completion of the previous stage
(same-timestamp events do not chain; deterministic and the stricter,
safer reading).

Plan shape: one filtered min-aggregate per stage, each joined to the
previous stage's (user, ts) frame on the user key — k stages cost k
filtered scans + k key-partitioned joins of user-sized frames; the
summary is a k-row union with a lag window over k rows. Nothing is ever
pair-joined or windowed over the raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage_idx, stage, users_reached, conversion_from_prev round-6,
    conversion_overall round-6) — one row per funnel stage. Stage 1's
    conversions are 1.0 by definition; downstream rows divide by the
    previous (resp. first) stage's user count. An empty first stage
    yields zero rows reached everywhere and NULL-safe 0.0 conversions.
    """
    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("a funnel needs >= 2 stages")
    reached = events.where(F.col(type_col) == stages[0]).groupBy(
        F.col(user_col).alias("__u")
    ).agg(F.min(ts_col).alias("__t"))
    counts = [reached.agg(F.count(F.lit(1)).alias("users_reached"))]
    for st in stages[1:]:
        nxt = (
            events.where(F.col(type_col) == st)
            .select(F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts"))
            .join(reached.hint("shuffle_hash"), "__u")
            .where(F.col("__ts") > F.col("__t"))
            .groupBy("__u")
            .agg(F.min("__ts").alias("__t"))
        )
        counts.append(nxt.agg(F.count(F.lit(1)).alias("users_reached")))
        reached = nxt
    rows = counts[0].select(
        F.lit(1).alias("stage_idx"), F.lit(stages[0]).alias("stage"), "users_reached"
    )
    for i, c in enumerate(counts[1:], start=2):
        rows = rows.unionAll(
            c.select(
                F.lit(i).alias("stage_idx"),
                F.lit(stages[i - 1]).alias("stage"),
                "users_reached",
            )
        )
    w = Window.partitionBy().orderBy("stage_idx")
    prev = F.lag("users_reached").over(w)
    first = F.first("users_reached").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rows.select(
        "stage_idx",
        "stage",
        F.col("users_reached").cast("long"),
        F.round(
            F.when(prev.isNull(), F.lit(1.0))
            .when(prev > 0, F.col("users_reached") / prev)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("conversion_from_prev"),
        F.round(
            F.when(first > 0, F.col("users_reached") / first).otherwise(F.lit(0.0)),
            6,
        ).alias("conversion_overall"),
    )
