"""Multimodal plumbing + structured-streaming incremental dedup tests."""

import hashlib
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.multimodal import (
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image", fake=False)


def test_fake_decode_deterministic():
    a = decode_media(b"payload", "image", fake=True)
    b = decode_media(b"payload", "audio", fake=True)
    assert (a == b).all()  # feature depends only on bytes
    assert len(a) == 16


def test_extract_features_end_to_end(spark):
    media = synthesize_media(spark, 30)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    by_id = {r.media_id: r for r in rows}
    # invariant: payload_sha256 matches, identical payloads -> identical features
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, r in by_id.items():
        assert r.payload_sha256 == hashlib.sha256(src[mid]).hexdigest()
        assert r.n_bytes == len(src[mid])
    dup_ids = [m for m, p in src.items() if p == src[7]]
    assert len(dup_ids) > 1
    feats0 = by_id[dup_ids[0]].features
    assert all(by_id[m].features == feats0 for m in dup_ids)


def test_sample_frames(spark):
    media = synthesize_media(spark, 12)
    frames = sample_frames(media, every_ms=1000)
    vids = media.filter(F.col("kind") == "video").count()
    got = frames.groupBy("media_id").count().collect()
    assert len(got) == vids
    assert all(r["count"] == 5 for r in got)  # 5000ms / 1000ms


def test_streaming_incremental_dedup(spark):
    from entity_resolution_spark.streaming.incremental import run_available_now

    base = tempfile.mkdtemp()
    inp, outp, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))
    os.makedirs(inp)
    rows = [
        (1, "o/r", "a.py", "c" * 40, "python", "content one", "2026-01-01 00:00:00"),
        (2, "o/r", "b.py", "d" * 40, "python", "content one", "2026-01-01 00:00:01"),
        (3, "o/r", "c.py", "e" * 40, "python", "content two", "2026-01-01 00:00:02"),
    ]
    df = spark.createDataFrame(
        rows,
        "file_id long, repo string, path string, commit string, lang string, content string, event_time string",
    ).withColumn("event_time", F.col("event_time").cast("timestamp"))
    df.write.parquet(inp, mode="overwrite")
    try:
        run_available_now(spark, inp, outp, ckpt)
        out = spark.read.parquet(outp)
        assert out.count() == 2  # duplicate content deduped within watermark
        assert "content_sha256" in out.columns
        # resumability: re-running processes nothing new, output unchanged
        run_available_now(spark, inp, outp, ckpt)
        assert spark.read.parquet(outp).count() == 2
    finally:
        shutil.rmtree(base)
