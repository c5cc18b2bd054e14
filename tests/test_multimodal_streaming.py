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


class TestRealCodecs:
    def test_ppm_round_trip(self):
        import numpy as np

        from entity_resolution_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
        )

        rng = np.random.RandomState(3)
        px = rng.randint(0, 256, size=5 * 4 * 3).astype(np.uint8)
        w, h, maxval, got = decode_ppm(encode_ppm(5, 4, px))
        assert (w, h, maxval) == (5, 4, 255)
        assert (got == px).all()

    def test_ppm_header_grammar(self):
        import numpy as np

        from entity_resolution_spark.operators.multimodal import decode_ppm

        # comments and arbitrary whitespace in the header are legal netpbm
        raw = b"P6\n# a comment\n 2\t1 # trailing\n255\n" + bytes(range(6))
        w, h, maxval, px = decode_ppm(raw)
        assert (w, h, maxval) == (2, 1, 255)
        assert (px == np.arange(6)).all()
        import pytest

        with pytest.raises(ValueError, match="truncated PPM raster"):
            decode_ppm(b"P6\n2 2\n255\n\x00\x01")
        with pytest.raises(ValueError, match="not a P6"):
            decode_ppm(b"P3\n1 1\n255\n0 0 0")

    def test_wav_round_trip(self):
        import numpy as np

        from entity_resolution_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
        rate, n_ch, got = decode_wav(encode_wav(16000, s))
        assert (rate, n_ch) == (16000, 1)
        assert (got == s).all()

    def test_wav_rejects_non_pcm16(self):
        import pytest

        from entity_resolution_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        raw = bytearray(encode_wav(8000, [1, 2, 3]))
        raw[20] = 3  # audio_format = IEEE float
        with pytest.raises(ValueError, match="unsupported WAV encoding"):
            decode_wav(bytes(raw))
        with pytest.raises(ValueError, match="not a RIFF"):
            decode_wav(b"OggS....")

    def test_decode_media_real_dispatch_and_sha_invariant(self):
        import hashlib

        import numpy as np

        from entity_resolution_spark.operators.multimodal import (
            decode_media,
            synthesize_real_payload,
        )

        kind_i, img = synthesize_real_payload(4)
        kind_a, wav = synthesize_real_payload(7)
        assert (kind_i, kind_a) == ("image", "audio")
        fi = decode_media(img, kind_i)
        fa = decode_media(wav, kind_a)
        assert fi[0] == 1.0 and fa[0] == 2.0
        # every statistic is an integer (exact-in-float32 contract)
        assert all(float(v).is_integer() for v in fi.tolist())
        assert all(float(v).is_integer() for v in fa.tolist())
        # hand-checks on the generative formulas
        w, h = 4 + 4 % 5, 3 + 4 % 4  # media_id 4 -> 8x3
        assert (fi[1], fi[2], fi[4]) == (w, h, w * h)
        px = (4 * 31 + np.arange(w * h * 3) * 7) % 256
        assert fi[10] == px.sum()
        n = 32 + 7 % 64
        s = (7 * 131 + np.arange(n) * 17) % 65536 - 32768
        assert (fa[2], fa[3]) == (n, s.sum())
        assert fa[7] == ((s[1:] < 0) != (s[:-1] < 0)).sum()
        # payload sha256 invariant: same id -> byte-identical payload
        assert (
            hashlib.sha256(img).hexdigest()
            == hashlib.sha256(synthesize_real_payload(4)[1]).hexdigest()
        )

    def test_unknown_format_still_raises(self):
        from entity_resolution_spark.operators.multimodal import decode_media

        with pytest.raises(NotImplementedError, match="no image codec"):
            decode_media(b"\x89PNG\r\n\x1a\n....", "image")

    def test_extract_features_real_path_spark(self, spark):
        """mapInPandas with fake=False over real PPM/WAV payloads: bytes
        cross Arrow, decode worker-side, land with the declared schema."""
        import hashlib

        from entity_resolution_spark.operators.multimodal import (
            decode_media,
            extract_features,
            synthesize_real_payload,
            with_real_payloads,
        )
        from entity_resolution_spark.session import ensure_py_files

        ensure_py_files(spark)
        ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
        out = extract_features(with_real_payloads(ids), fake=False).collect()
        assert len(out) == 12
        for r in out:
            kind, payload = synthesize_real_payload(r["media_id"])
            assert r["kind"] == kind
            assert r["n_bytes"] == len(payload)
            assert r["payload_sha256"] == hashlib.sha256(payload).hexdigest()
            exp = decode_media(payload, kind).tolist()
            assert r["features"] == exp
