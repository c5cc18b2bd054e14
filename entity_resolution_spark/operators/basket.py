"""Market-basket co-occurrence mining (Agrawal & Srikant's association
rules, size-2 itemsets): which items appear in the same basket more
often than chance — support, confidence, and lift for every qualifying
ordered item pair.

The classic retail primitive, and the same arithmetic entity pipelines
use for co-mention signals. Pairs are generated WITHIN baskets by a
basket-keyed self-join, so the work is sum over baskets of C(items, 2) —
linear for bounded basket sizes, and the census/min-support filters run
before ratios. A corpus-wide hot item never explodes anything: items
pair only inside their own basket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 5,
    max_basket_size: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_baskets, support round-6, confidence round-6,
    lift round-6) — DIRECTED rules a->b over distinct (basket, item)
    incidences: support = P(a,b), confidence = P(b|a), lift =
    P(a,b)/(P(a)P(b)); pairs below ``min_support`` co-baskets drop before
    any ratio. Both directions of a pair are reported (confidence is
    asymmetric).

    ``max_basket_size`` is the 100 TB guard: the self-join emits C(items,
    2) pairs PER basket, so one 10^6-item basket (a crawler session, a
    catch-all order) costs 10^12 pairs. Capped baskets are excluded from
    the universe BEFORE pairing (support/lift renormalize over the kept
    baskets); the exclusions are not silent — `oversized_baskets` returns
    the dropped frame for the caller's metrics sink.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    inc = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket_size is not None:
        sizes = inc.groupBy("__b").agg(F.count(F.lit(1)).alias("__bs"))
        keep = sizes.where(F.col("__bs") <= max_basket_size).select("__b")
        inc = inc.join(keep.hint("shuffle_hash"), "__b")
    n_baskets = inc.select("__b").distinct().count()
    item_counts = inc.groupBy("__i").agg(F.count(F.lit(1)).alias("__ci"))
    a = inc.select("__b", F.col("__i").alias("item_a"))
    b = inc.select("__b", F.col("__i").alias("item_b"))
    pair_counts = (
        a.join(b, "__b")
        .where(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .where(F.col("n_baskets") >= min_support)
    )
    ca = item_counts.select(F.col("__i").alias("item_a"), F.col("__ci").alias("__ca"))
    cb = item_counts.select(F.col("__i").alias("item_b"), F.col("__ci").alias("__cb"))
    n = float(n_baskets)
    return (
        pair_counts.join(ca.hint("shuffle_hash"), "item_a")
        .join(cb.hint("shuffle_hash"), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_baskets",
            F.round(F.col("n_baskets") / F.lit(n), 6).alias("support"),
            F.round(F.col("n_baskets") / F.col("__ca"), 6).alias("confidence"),
            F.round(
                F.col("n_baskets") * F.lit(n) / (F.col("__ca") * F.col("__cb")), 6
            ).alias("lift"),
        )
    )


def oversized_baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int,
) -> DataFrame:
    """The companion audit frame for ``association_rules(...,
    max_basket_size=...)``: (basket, n_items) for every basket the cap
    excluded — no silent truncation, same convention as
    candidates.dropped_block_keys."""
    inc = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("__i")
    ).distinct()
    return (
        inc.groupBy("basket")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .where(F.col("n_items") > max_basket_size)
    )
