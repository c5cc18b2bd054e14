"""streaming/dedup_gate.py — the ingestion gate admits each distinct
near-dup class exactly once across batches, keeps state on disk, and
passes empty docs through."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from entity_resolution_spark.streaming.dedup_gate import (
    accepted_corpus,
    corpus_sketches,
    run_dedup_gate,
)

_A = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a slow waltz in the evening light and the crowd watches quietly "
    "from the wooden benches near the river bank under the old bridge"
)
_B = (
    "distributed query engines shuffle partitions across executors "
    "with adaptive execution and broadcast joins for small dimension "
    "tables while large fact tables stay hash partitioned on the key"
)
_C = (
    "gardening tips for tomato plants in clay soil with drip "
    "irrigation and mulching schedules through the long dry summer "
    "months when the beds need shade cloth and steady deep watering"
)


def _drop(spark, rows, inp):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s") for i, t in rows]
    ).withColumn("event_time", F.timestamp_seconds(F.lit(1_700_000_000)))
    df.write.mode("append").parquet(inp)


def test_gate_admits_each_class_once_across_batches(spark, tmp_path):
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    os.makedirs(inp)

    # batch 1: A twice (within-batch dup) + B
    _drop(spark, [(0, _A), (1, _A + " extra tail"), (2, _B)], inp)
    run_dedup_gate(spark, inp, state, ckpt)
    got1 = sorted(r.doc_id for r in accepted_corpus(spark, state).collect())
    assert got1 == [0, 2]  # component-min rep of {0,1}, plus B

    # batch 2: A again (dup of standing corpus), C (novel)
    _drop(spark, [(10, _A), (11, _C)], inp)
    run_dedup_gate(spark, inp, state, ckpt)
    got2 = sorted(r.doc_id for r in accepted_corpus(spark, state).collect())
    assert got2 == [0, 2, 11]

    # sketches state tracks accepted ids
    assert sorted(r.id for r in corpus_sketches(spark, state).collect()) == [0, 2, 11]


def test_gate_replay_is_idempotent(spark, tmp_path):
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    os.makedirs(inp)
    _drop(spark, [(0, _A), (1, _B)], inp)
    run_dedup_gate(spark, inp, state, ckpt)
    # AvailableNow with the same checkpoint: nothing new -> state unchanged
    run_dedup_gate(spark, inp, state, ckpt)
    assert sorted(r.doc_id for r in accepted_corpus(spark, state).collect()) == [0, 1]


def test_gate_passes_empty_docs_through(spark, tmp_path):
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    os.makedirs(inp)
    _drop(spark, [(0, ""), (1, None), (2, _A)], inp)
    run_dedup_gate(spark, inp, state, ckpt)
    assert sorted(r.doc_id for r in accepted_corpus(spark, state).collect()) == [0, 1, 2]
