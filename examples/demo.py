#!/usr/bin/env python
"""End-to-end demo, mirroring the reference's example_usage.py flow
(/root/reference/src/entity_resolution/example_usage.py) on Spark, then
showing the row-level record-linkage pipeline the reference doesn't have.

Run:  python examples/demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_resolution_spark import get_spark
from entity_resolution_spark.compat import (
    ColumnMatchingWorkflow,
    EntityAssignment,
    SimilarColumnFinder,
)
from entity_resolution_spark.config import PipelineConfig
from entity_resolution_spark.datagen import generate_repo_files
from entity_resolution_spark.operators.consolidation import canonical_entities
from entity_resolution_spark.plans.pipeline import resolve


def column_matching_demo(spark):
    print("=" * 60)
    print("1. Column matching (reference-parity API)")
    print("=" * 60)
    df1 = spark.createDataFrame(
        [(1, "Alice", "2023-01-01"), (2, "Bob", "2023-01-02"), (3, "Charlie", "2023-01-03")],
        "cust_id int, name string, order_date string",
    )
    df2 = spark.createDataFrame(
        [(1, "Alice Smith", "2023-01-01"), (2, "Bob Jones", "2023-01-02"),
         (3, "Charlie Brown", "2023-01-03")],
        "customer_number int, full_name string, transaction_date string",
    )
    finder = SimilarColumnFinder()
    matches = finder.find_similar_columns(df1, df2, threshold=40)
    for c1, c2, score in matches:
        print(f"  {c1} <-> {c2} (confidence: {score:.0f}%)")

    validated = finder.validate_column_matches(df1, df2, matches)
    for v in validated[:3]:
        print(f"  validate {v['col1']}<->{v['col2']}: {v['overall_validation_score']}"
              f" -> {v['recommendation'][:40]}...")

    out, method, meta = EntityAssignment().consolidate_datasets_based_on_matches(
        df1, df2, matches, 0.7
    )
    print(f"  consolidation method: {method}; columns: {out.columns}")
    out.show(5, truncate=False)

    wf = ColumnMatchingWorkflow().create_column_matching_graph(df1, df2)
    print(f"  workflow: {len(wf.nodes)} nodes, {len(wf.edges)} edges")


def record_linkage_demo(spark):
    print("=" * 60)
    print("2. Record linkage at corpus scale (blocking -> scoring -> clustering)")
    print("=" * 60)
    files = generate_repo_files(spark, 200)
    res = resolve(files, PipelineConfig())
    res.metrics.orderBy("stage", "metric").show(30, truncate=False)
    ents = canonical_entities(res.clusters, res.features)
    print("  largest entities:")
    ents.orderBy(ents.n_members.desc()).show(5, truncate=False)


if __name__ == "__main__":
    spark = get_spark("demo", cores=4, shuffle_partitions=4)
    column_matching_demo(spark)
    record_linkage_demo(spark)
    spark.stop()
