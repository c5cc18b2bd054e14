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


class _FakeState:
    """Deterministic stand-in for GroupState: real-clock ProcessingTime
    timeouts are unobservable in a fast test, so assert the contract at
    the group-function boundary instead (duration registered after every
    update; timed-out key removed without output)."""

    def __init__(self, existing=None, timed_out=False):
        self._val = existing
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_durations = []

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def remove(self):
        self.removed = True
        self._val = None

    def setTimeoutDuration(self, ms):
        self.timeout_durations.append(ms)


def _run_fn(fn, state, xs):
    import pandas as pd

    pdfs = [pd.DataFrame({"ts": range(len(xs)), "__x": xs})]
    return list(fn((7,), iter(pdfs), state))


def test_ewma_stream_ttl_registers_timeout():
    """state_ttl_ms must arm a per-key processing-time timeout on every
    update — previously a silent no-op (timeoutConf selected but no
    setTimeoutDuration call, so idle-key state never expired)."""
    from entity_resolution_spark.streaming.smoothing import _make_fn

    fn = _make_fn(0.5, ["ts"], 60_000)
    state = _FakeState()
    out = _run_fn(fn, state, [1.0, 3.0])
    assert state.timeout_durations == [60_000]
    assert state.get == (2, 2.0)
    assert len(out) == 1 and list(out[0]["rn"]) == [1, 2]

    # TTL unset -> no duration is registered (NoTimeout mode would throw)
    fn_nottl = _make_fn(0.5, ["ts"], None)
    state2 = _FakeState()
    _run_fn(fn_nottl, state2, [1.0])
    assert state2.timeout_durations == []


def test_ewma_stream_ttl_expires_idle_key():
    """A key arriving with hasTimedOut set is dropped: state removed, no
    rows emitted, and a later arrival restarts the recursion from rn=0."""
    from entity_resolution_spark.streaming.smoothing import _make_fn

    fn = _make_fn(0.5, ["ts"], 60_000)
    state = _FakeState(existing=(5, 2.5), timed_out=True)
    out = _run_fn(fn, state, [])
    assert out == [] and state.removed and not state.exists

    # fresh arrival after expiry starts over (rn==0 path -> e = x)
    state_fresh = _FakeState()
    out2 = _run_fn(fn, state_fresh, [9.0])
    assert state_fresh.get == (1, 9.0)
    assert list(out2[0]["__e_raw"]) == [9.0]


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
