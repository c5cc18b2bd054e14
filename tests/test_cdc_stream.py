"""streaming/cdc_stream.py — a changelog drained in MULTIPLE micro-batches
must end at exactly the snapshot of one batch apply_changelog over the
whole changelog (and the versioned state must resume idempotently)."""

import os

from entity_resolution_spark.operators.cdc import apply_changelog
from entity_resolution_spark.streaming.cdc_stream import (
    latest_snapshot,
    run_cdc_stream,
)


def _changelog_rows():
    rows = []
    for i in range(120):
        k = i % 9
        op = "D" if i % 13 == 0 else "U"
        rows.append((k, i, op, f"s{i}", float(i)))
    return rows


def test_stream_fold_equals_batch_apply(spark, tmp_path):
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)

    schema = "k long, seq long, op string, state string, v double"
    base = spark.createDataFrame(
        [(k, "base", -1.0) for k in range(6)], "k long, state string, v double"
    )
    rows = _changelog_rows()
    # two arrival files split ON the seq order (earlier seqs arrive first),
    # forced into separate micro-batches via maxFilesPerTrigger=1
    spark.createDataFrame(rows[:70], schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    spark.createDataFrame(rows[70:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    run_cdc_stream(
        spark, inp, state, ckpt, base, ["k"], ["seq"], op_col="op",
        max_files_per_trigger=1,
    )
    snap = latest_snapshot(spark, state)
    assert snap is not None
    got = {r["k"]: (r["state"], r["v"]) for r in snap.collect()}

    full = spark.createDataFrame(rows, schema)
    want = {
        r["k"]: (r["state"], r["v"])
        for r in apply_changelog(base, full, ["k"], ["seq"], op_col="op").collect()
    }
    assert got == want
    # at least two committed versions (the stream really folded twice)
    versions = [d for d in os.listdir(state) if d.startswith("v")]
    assert len(versions) >= 2

    # rerunning with nothing new leaves the snapshot unchanged
    run_cdc_stream(
        spark, inp, state, ckpt, base, ["k"], ["seq"], op_col="op",
        max_files_per_trigger=1,
    )
    snap2 = latest_snapshot(spark, state)
    assert {r["k"]: (r["state"], r["v"]) for r in snap2.collect()} == want
