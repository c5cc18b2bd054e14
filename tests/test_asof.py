"""As-of join semantics: nearest prior (<=) build row per key, null when
none precedes, exact-timestamp inclusive."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.asof import asof_join


def test_asof_basic(spark):
    probe = spark.createDataFrame(
        [(1, "2026-01-01 10:00:00", "e1"),
         (1, "2026-01-01 12:00:00", "e2"),
         (1, "2026-01-01 08:00:00", "e0"),   # before any build row
         (2, "2026-01-01 11:00:00", "e3")],
        "k long, ts string, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    build = spark.createDataFrame(
        [(1, "2026-01-01 09:00:00", 100.0),
         (1, "2026-01-01 11:30:00", 200.0),
         (2, "2026-01-01 11:00:00", 300.0)],  # exact-ts: inclusive
        "k long, bts string, price double",
    ).withColumn("bts", F.col("bts").cast("timestamp"))
    out = asof_join(probe, build, on="k", probe_ts="ts", build_ts="bts")
    got = {r.tag: r.price_asof for r in out.collect()}
    assert got == {"e0": None, "e1": 100.0, "e2": 200.0, "e3": 300.0}


def test_asof_no_key_match(spark):
    probe = spark.createDataFrame([(9, "2026-01-01 10:00:00")], "k long, ts string")
    probe = probe.withColumn("ts", F.col("ts").cast("timestamp"))
    build = spark.createDataFrame([(1, "2026-01-01 09:00:00", 1.0)], "k long, bts string, v double")
    build = build.withColumn("bts", F.col("bts").cast("timestamp"))
    out = asof_join(probe, build, on="k", probe_ts="ts", build_ts="bts").collect()
    assert len(out) == 1 and out[0].v_asof is None


def test_asof_null_build_attributes_not_backfilled(spark):
    # The matched build row has NULLs in some attributes: those NULLs must
    # survive — NOT be back-filled from an older build row (per-column
    # carry-forward would fabricate a row mixing attributes of different
    # build rows).
    probe = spark.createDataFrame(
        [(1, "2026-01-01 12:00:00", "e1")], "k long, ts string, tag string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    build = spark.createDataFrame(
        [(1, "2026-01-01 09:00:00", 100.0, "old"),
         (1, "2026-01-01 11:00:00", None, "new")],  # matched row, null price
        "k long, bts string, price double, label string",
    ).withColumn("bts", F.col("bts").cast("timestamp"))
    out = asof_join(probe, build, on="k", probe_ts="ts", build_ts="bts").collect()
    assert len(out) == 1
    r = out[0]
    # all attached attributes come from the SAME (matched) build row
    assert r.label_asof == "new" and r.price_asof is None


def test_asof_chunked_equals_single_window(spark):
    """The hot-key-safe segmented plan must produce exactly the single
    window plan's output, across chunk widths that split/straddle the
    data, including keys with no builds, probes before any build, and
    null build attributes."""
    import random

    rng = random.Random(7)
    probe_rows, build_rows = [], []
    for k in range(6):
        for i in range(60):
            probe_rows.append((k, f"2026-01-{rng.randint(1,27):02d} {rng.randint(0,23):02d}:{rng.randint(0,59):02d}:00", k * 1000 + i))
        if k != 3:  # key 3: probes only
            for i in range(25):
                price = None if i % 5 == 0 else float(i)
                build_rows.append((k, f"2026-01-{rng.randint(1,27):02d} {rng.randint(0,23):02d}:00:00", price, f"b{k}-{i}"))
    probe = spark.createDataFrame(probe_rows, "k long, ts string, pid long").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    build = spark.createDataFrame(build_rows, "k long, bts string, price double, label string").withColumn(
        "bts", F.col("bts").cast("timestamp"))
    base = sorted(map(str, asof_join(probe, build, on="k", probe_ts="ts", build_ts="bts").collect()))
    for chunk in (3600, 86_400, 7 * 86_400, 10**9):
        got = sorted(map(str, asof_join(
            probe, build, on="k", probe_ts="ts", build_ts="bts", chunk_seconds=chunk
        ).collect()))
        assert got == base, f"chunk_seconds={chunk}"


def test_asof_scales_without_range_explosion(spark):
    # 1 key, 5k builds, 5k probes: the union+window plan is O(n log n); a
    # naive theta-join would be 25M rows. Just assert correctness on a
    # sample and that it completes fast.
    build = spark.range(5000).select(
        F.lit(1).alias("k"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("id") * 10)).alias("bts"),
        F.col("id").cast("double").alias("v"),
    )
    probe = spark.range(5000).select(
        F.lit(1).alias("k"),
        (F.lit("2026-01-01 00:00:05").cast("timestamp") + F.make_interval(secs=F.col("id") * 10)).alias("ts"),
        F.col("id").alias("pid"),
    )
    out = asof_join(probe, build, on="k", probe_ts="ts", build_ts="bts")
    sample = {r.pid: r.v_asof for r in out.filter(F.col("pid").isin(0, 1, 4999)).collect()}
    # probe pid=i at t=10i+5 -> latest build at t=10i -> v=i
    assert sample == {0: 0.0, 1: 1.0, 4999: 4999.0}
