"""Association rules (operators/basket.py)."""

import pytest
from pyspark.sql import Row

from entity_resolution_spark.operators.basket import association_rules


def test_association_rules_hand_values(spark):
    baskets = {
        1: ["bread", "butter"],
        2: ["bread", "butter", "milk"],
        3: ["bread", "milk"],
        4: ["milk"],
        4.5: ["bread"],  # noise key types don't matter; see below
    }
    rows = [
        Row(basket=str(b), item=i) for b, items in baskets.items() for i in items
    ] + [Row(basket="2", item="milk")]  # duplicate incidence -> deduped
    df = spark.createDataFrame(rows).repartition(3)
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_baskets"],
            r["support"],
            r["confidence"],
            r["lift"],
        )
        for r in association_rules(df, "basket", "item", min_support=2).collect()
    }
    # n=5 baskets; bread in 4, butter in 2, milk in 3
    # (bread, butter): 2 -> support .4, conf 2/4=.5, lift 2*5/(4*2)=1.25
    assert got[("bread", "butter")] == (2, 0.4, 0.5, 1.25)
    assert got[("butter", "bread")] == (2, 0.4, 1.0, 1.25)
    assert got[("bread", "milk")] == (2, 0.4, 0.5, round(2 * 5 / 12, 6))
    assert ("milk", "butter") not in got  # co-count 1 < min_support
    with pytest.raises(ValueError):
        association_rules(df, "basket", "item", min_support=0)
