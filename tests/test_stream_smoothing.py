"""Streaming running-EWMA (applyInPandasWithState): stream output must
equal the batch operator's for in-order delivery, including across
multiple micro-batches continuing from keyed state."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def _rows(n, offset=0):
    return [
        (offset + i, (offset + i) % 5, float(((offset + i) * 7) % 13) + 0.25)
        for i in range(n)
    ]


def test_ewma_stream_equals_batch(spark):
    from entity_resolution_spark.operators.timeseries import ewma_running
    from entity_resolution_spark.session import ensure_py_files
    from entity_resolution_spark.streaming.smoothing import ewma_stream

    ensure_py_files(spark)
    base = tempfile.mkdtemp()
    inp = os.path.join(base, "in")
    os.makedirs(inp)
    schema = "ts long, user_id long, value double"
    # two files = at least one batch boundary exercised under AvailableNow;
    # event time increases across files so delivery is in order
    spark.createDataFrame(_rows(40), schema).coalesce(1).write.parquet(
        os.path.join(inp, "p1")
    )
    spark.createDataFrame(_rows(40, 40), schema).coalesce(1).write.parquet(
        os.path.join(inp, "p2")
    )
    static = spark.read.parquet(os.path.join(inp, "p1"), os.path.join(inp, "p2"))
    try:
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(inp + "/p*")
        )
        out = ewma_stream(stream, "user_id", "ts", "value", alpha=0.4375)
        q = (
            out.writeStream.format("memory")
            .queryName("ewma_stream_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .start()
        )
        assert q.awaitTermination(240), f"query did not finish: {q.status}"
        got = sorted(
            map(tuple, spark.sql("select * from ewma_stream_t").collect())
        )
        want = sorted(
            map(
                tuple,
                ewma_running(
                    static, "user_id", "ts", "value", alpha=0.4375
                ).collect(),
            )
        )
        assert got == want
        assert len(got) == 80
    finally:
        shutil.rmtree(base)


def test_ewma_stream_validation(spark):
    import pytest

    from entity_resolution_spark.streaming.smoothing import ewma_stream

    df = spark.readStream.format("rate").load().select(
        F.col("value").alias("user_id"),
        F.col("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    with pytest.raises(ValueError):
        ewma_stream(df, "user_id", "ts", "value", alpha=0.0)
