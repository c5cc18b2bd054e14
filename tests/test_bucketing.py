"""Bucketed co-located joins: the physical plan must contain no Exchange."""

import contextlib
import io

from pyspark.sql import functions as F

from entity_resolution_spark.sources.bucketing import bucketed_join, save_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")
    a = spark.range(10_000).select(
        F.col("id").alias("file_id"), (F.col("id") % 7).alias("x")
    )
    b = spark.range(10_000).select(
        F.col("id").alias("file_id"), (F.col("id") % 13).alias("y")
    )
    save_bucketed(a, "t_bucket_a", n_buckets=8)
    save_bucketed(b, "t_bucket_b", n_buckets=8)
    joined = bucketed_join(spark, "t_bucket_a", "t_bucket_b")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan  # co-located: no shuffle
    assert joined.count() == 10_000
    # control: the same join over plain (unbucketed) frames DOES exchange
    control = a.join(b.hint("merge"), "file_id")
    assert "Exchange" in _plan(control)
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")
