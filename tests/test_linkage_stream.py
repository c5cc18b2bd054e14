"""Streaming FS scoring: candidate pairs arrive as a file stream, join the
static records, and are scored with a FROZEN model's literal expression —
stream results must equal the batch run over the same pairs.

fs_score is a pure map-side expression and comparison_vectors is a
stream-static equi-join, so the whole scorer is legal in Structured
Streaming append mode with no state store at all — the cheapest possible
continuous-linkage deployment (the EM fit stays a batch job; the stream
applies it).
"""

import os
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from entity_resolution_spark.operators.linkage import (
    comparison_vectors,
    fs_score,
    fs_train,
)

FIELDS = {"g_lang": "lang", "g_name": "name"}


@pytest.fixture(scope="module")
def records(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", name="acme corp"),
            Row(doc_id=2, lang="en", name="acme corp"),
            Row(doc_id=3, lang="de", name="beta gmbh"),
            Row(doc_id=4, lang="de", name="beta gmbh"),
            Row(doc_id=5, lang="fr", name="gamma sa"),
            Row(doc_id=6, lang="en", name="acme corp"),
        ]
    )


def test_stream_scoring_equals_batch(spark, records):
    ids = [1, 2, 3, 4, 5, 6]
    pairs = spark.createDataFrame(
        [Row(left_id=a, right_id=b) for a in ids for b in ids if a < b]
    )
    vec = comparison_vectors(pairs, records, FIELDS)
    model = fs_train(vec, list(FIELDS), iters=10)
    batch = {
        (r["left_id"], r["right_id"]): (r["match_weight"], r["posterior"])
        for r in fs_score(vec, model).collect()
    }

    base = tempfile.mkdtemp(prefix="ers_linkstream_")
    inp, out, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))
    os.makedirs(inp)
    # two drops -> two micro-batches
    pairs.where(F.col("left_id") % 2 == 0).repartition(1).write.mode(
        "append"
    ).parquet(inp)
    pairs.where(F.col("left_id") % 2 == 1).repartition(1).write.mode(
        "append"
    ).parquet(inp)

    stream = spark.readStream.schema("left_id long, right_id long").parquet(inp)
    scored = fs_score(comparison_vectors(stream, records, FIELDS), model)
    q = (
        scored.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["left_id"], r["right_id"]): (r["match_weight"], r["posterior"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == batch  # every pair scored once, bit-identical to batch
