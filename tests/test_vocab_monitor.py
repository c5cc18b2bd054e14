"""streaming/vocab_monitor.py — HLL registers as streaming state: the
stream fold must equal the batch sketch over the full corpus, the series
must be monotone, and replays must be idempotent."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from entity_resolution_spark.operators.stats import hll_estimate, hll_registers
from entity_resolution_spark.streaming.vocab_monitor import (
    current_registers,
    run_vocab_monitor,
    vocab_series,
)


def _drop(spark, rows, inp):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s") for i, t in rows]
    ).withColumn("event_time", F.timestamp_seconds(F.lit(1_700_000_000)))
    df.write.mode("append").parquet(inp)


def _toks(df):
    return df.select(
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias("val")
    )


def test_stream_fold_equals_batch_sketch(spark, tmp_path):
    """After all drops, the folded register file is EXACTLY the batch
    register file of the concatenated corpus (max-merge property)."""
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    os.makedirs(inp)
    drops = [
        [(0, "alpha beta gamma delta epsilon"), (1, "zeta eta theta")],
        [(2, "alpha beta iota kappa"), (3, "lam mu nu xi omicron")],
        [(4, "pi rho sigma tau upsilon phi chi psi omega")],
    ]
    for rows in drops:
        _drop(spark, rows, inp)
    run_vocab_monitor(spark, inp, state, ckpt)

    all_rows = [r for batch in drops for r in batch]
    full = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in all_rows])
    want = {
        (r["bucket"], r["M"]) for r in hll_registers(_toks(full), "val").collect()
    }
    got = {(r["bucket"], r["M"]) for r in current_registers(spark, state).collect()}
    assert got == want
    est_stream = hll_estimate(current_registers(spark, state)).collect()[0]
    est_batch = hll_estimate(hll_registers(_toks(full), "val")).collect()[0]
    assert tuple(est_stream) == tuple(est_batch)


def test_series_monotone_and_flat_on_duplicate_drop(spark, tmp_path):
    """The estimate series never decreases, and a drop with NO new tokens
    leaves it exactly flat."""
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    os.makedirs(inp)
    _drop(spark, [(0, "alpha beta gamma delta")], inp)
    run_vocab_monitor(spark, inp, state, ckpt)
    _drop(spark, [(1, "epsilon zeta eta theta iota kappa")], inp)
    run_vocab_monitor(spark, inp, state, ckpt)
    _drop(spark, [(2, "alpha beta gamma delta")], inp)  # nothing new
    run_vocab_monitor(spark, inp, state, ckpt)
    series = [
        r["estimate"] for r in vocab_series(spark, state).orderBy("version").collect()
    ]
    assert len(series) == 3
    assert series[0] <= series[1] and abs(series[2] - series[1]) < 1e-9


def test_monitor_restart_resumes_from_state(spark, tmp_path):
    """A second run over an unchanged input dir processes nothing new and
    leaves the state identical (checkpointed exactly-once accounting)."""
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    os.makedirs(inp)
    _drop(spark, [(0, "alpha beta gamma")], inp)
    run_vocab_monitor(spark, inp, state, ckpt)
    before = {(r["bucket"], r["M"]) for r in current_registers(spark, state).collect()}
    run_vocab_monitor(spark, inp, state, ckpt)  # no new files
    after = {(r["bucket"], r["M"]) for r in current_registers(spark, state).collect()}
    assert after == before
