"""Bucketed tables for co-located joins.

At 100 TB the features table is joined on ``file_id`` by every scoring
round and every incremental re-run. Persisting it bucketed by the join key
means those joins read pre-partitioned data and skip the exchange entirely
(SortMergeJoin with zero Exchange operators — asserted in
tests/test_bucketing.py by inspecting the physical plan).

Spark constraint: bucketing requires ``saveAsTable`` (a metastore entry),
not a bare path write; the sandbox uses the default in-place
``spark-warehouse``. ``spark.sql.sources.bucketing.enabled`` is on by
default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str = "file_id",
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Overwrite-save ``df`` as a bucketed (and bucket-sorted) table."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "file_id"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free.

    The merge hint matters: if the planner picks broadcast (as it will for
    a small side in tests) it ignores bucketing entirely ("Bucketed: false
    (disabled by query planner)"); at corpus scale both sides are huge and
    sort-merge over co-located buckets is the only sane plan — the hint
    makes the local plan match the at-scale plan.
    """
    return spark.table(left_table).join(spark.table(right_table).hint("merge"), key)
