"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct; the
Spark-side machinery — schema, partition-friendly batching, Arrow UDF
signatures, frame sampling — is real and tested.

Two REAL dependency-free codecs are implemented header-to-samples in numpy
(no PIL/ffmpeg in this container, but these formats need none):

* PPM (P6 binary RGB, the netpbm image format): header parse (magic,
  width, height, maxval, comment lines) + raw pixel plane.
* WAV (RIFF PCM 16-bit mono/stereo): chunk walk (fmt/data), sample decode
  via little-endian int16 view.

``decode_media`` dispatches on the payload's magic bytes and returns an
integer-exact 16-slot feature vector (exact in float32 by construction —
every statistic is an integer < 2^24), so a SQL oracle can replicate the
decoded features bit-for-bit. Formats outside these two still raise
``NotImplementedError`` (honest failure, not silent garbage); pass
``fake=True`` for the sha256-derived deterministic test decoder.

Schema convention:

    media(media_id bigint, kind string, payload binary,
          meta struct<mime:string, width:int, height:int,
                      duration_ms:int, sample_rate:int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", META_TYPE),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real codec: features derived from the
    sha256 digest, so identical payloads give identical vectors."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    return (raw.astype("float64") / 2**32).astype("float32")


FEATURE_DIM = 16
_IMAGE_TAG, _AUDIO_TAG = 1.0, 2.0


def encode_ppm(width: int, height: int, pixels: np.ndarray, maxval: int = 255) -> bytes:
    """Binary PPM (P6): ASCII header + raw RGB bytes. ``pixels`` is a flat
    uint8 array of length width*height*3 (row-major, interleaved RGB)."""
    px = np.asarray(pixels, dtype=np.uint8).reshape(-1)
    if len(px) != width * height * 3:
        raise ValueError(
            f"pixels length {len(px)} != width*height*3 = {width * height * 3}"
        )
    return f"P6\n{width} {height}\n{maxval}\n".encode("ascii") + px.tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a binary PPM (P6): returns (width, height, maxval, flat
    uint8 pixel array of length w*h*3). Handles the netpbm header
    grammar — tokens separated by whitespace, ``#`` comment lines, a
    single whitespace byte after maxval before the raster."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: need 3 tokens after the magic (w, h, maxval)
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            pos = nl + 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    pos += 1  # exactly one whitespace byte separates maxval from the raster
    w, h, maxval = (int(t) for t in tokens)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    n = w * h * 3
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError(
            f"truncated PPM raster: expected {n} bytes, got {len(raster)}"
        )
    return w, h, maxval, np.frombuffer(raster, dtype=np.uint8)


def encode_wav(sample_rate: int, samples: np.ndarray, n_channels: int = 1) -> bytes:
    """RIFF/WAVE PCM 16-bit: canonical 44-byte header + LE int16 data."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    block_align = 2 * n_channels
    byte_rate = sample_rate * block_align

    def le32(v: int) -> bytes:
        return int(v).to_bytes(4, "little")

    def le16(v: int) -> bytes:
        return int(v).to_bytes(2, "little")

    return (
        b"RIFF" + le32(36 + len(data)) + b"WAVE"
        + b"fmt " + le32(16) + le16(1) + le16(n_channels)
        + le32(sample_rate) + le32(byte_rate) + le16(block_align) + le16(16)
        + b"data" + le32(len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE PCM-16 payload by walking its chunks: returns
    (sample_rate, n_channels, int16 sample array — interleaved if
    stereo). Rejects non-PCM or non-16-bit encodings explicitly."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV encoding (format={audio_format}, bits={bits}); "
            "only PCM 16-bit is implemented"
        )
    samples = np.frombuffer(data[: (len(data) // 2) * 2], dtype="<i2")
    return sample_rate, n_channels, samples


def _image_features(payload: bytes) -> np.ndarray:
    w, h, maxval, px = decode_ppm(payload)
    p = px.astype(np.int64)
    i = np.arange(len(p), dtype=np.int64)
    f = np.zeros(FEATURE_DIM, dtype=np.float64)
    f[0] = _IMAGE_TAG
    f[1], f[2], f[3], f[4] = w, h, maxval, w * h
    f[5] = p[i % 3 == 0].sum()  # R plane
    f[6] = p[i % 3 == 1].sum()  # G plane
    f[7] = p[i % 3 == 2].sum()  # B plane
    f[8], f[9], f[10] = p.min(), p.max(), p.sum()
    f[11] = int((p == 0).sum())
    f[12], f[13] = p[0], p[-1]
    f[14] = int((i * p).sum())  # position-weighted sum (orientation probe)
    return f.astype(np.float32)


def _audio_features(payload: bytes) -> np.ndarray:
    rate, n_ch, s16 = decode_wav(payload)
    s = s16.astype(np.int64)
    f = np.zeros(FEATURE_DIM, dtype=np.float64)
    f[0] = _AUDIO_TAG
    f[1], f[2] = rate, len(s)
    if len(s):
        f[3] = s.sum()
        f[4], f[5] = s.min(), s.max()
        f[6] = np.abs(s).sum()
        f[7] = int(((s[1:] < 0) != (s[:-1] < 0)).sum())  # zero crossings
        f[8], f[9] = s[0], s[-1]
        f[10] = int((s == 0).sum())
        f[11] = n_ch
    return f.astype(np.float32)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode real PPM/WAV payloads (magic-byte dispatch) into the
    integer-exact feature vector; ``fake=True`` keeps the sha256-derived
    deterministic test decoder. Every real-feature statistic is an
    integer, exactly representable in the float32 output whenever it is
    below 2^24 — true by construction for the bounded payloads the
    contract query generates, which is what lets the SQL oracle match
    bit-for-bit."""
    if fake:
        return _fake_decode(payload)
    if payload[:2] == b"P6":
        return _image_features(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _audio_features(payload)
    raise NotImplementedError(
        f"no {kind} codec for this payload (supported real formats: PPM "
        "P6 image, RIFF/WAVE PCM-16 audio); pass fake=True for the "
        "deterministic test decoder"
    )


def extract_features(media: DataFrame, fake: bool = True, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of (media_id, kind,
    payload) -> FEATURE_SCHEMA rows. Batch shape (not per-row calls) is
    what a GPU-backed decoder would need; ``batch_hint`` documents the
    intended decoder micro-batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise over the Arrow batch (no pandas iterrows): only
            # the codec call itself is per-payload — that is inherent to
            # decoding, and the batch shape is what a GPU decoder consumes
            payloads = [bytes(p) for p in pdf["payload"].to_numpy(dtype=object)]
            kinds = pdf["kind"].to_numpy(dtype=object)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": kinds,
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "n_bytes": np.fromiter(
                        (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
                    ),
                    "features": [
                        decode_media(p, k, fake=fake).tolist()
                        for p, k in zip(payloads, kinds)
                    ],
                },
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (JVM-side sequence; the decode of each frame is the stubbed
    step). Output: (media_id, frame_ts_ms)."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synthesize_real_payload(media_id: int) -> tuple[str, bytes]:
    """Deterministic REAL media payload for an id: a binary PPM image
    (even ids) or a PCM-16 WAV (odd ids), with sizes and sample values
    derived arithmetically from the id. The multimodal_real_decode
    DuckDB oracle mirrors these formulas term-for-term, so the decoded
    feature vectors are verifiable end-to-end without any media library.
    Sizes are bounded (w<=8, h<=6, n_samples<=95) so every feature
    statistic stays below 2^24 (exact in float32)."""
    mid = int(media_id)
    if mid % 2 == 0:
        w, h = 4 + mid % 5, 3 + mid % 4
        n = w * h * 3
        px = (mid * 31 + np.arange(n, dtype=np.int64) * 7) % 256
        return "image", encode_ppm(w, h, px.astype(np.uint8))
    rate, n = 8000, 32 + mid % 64
    s = ((mid * 131 + np.arange(n, dtype=np.int64) * 17) % 65536) - 32768
    return "audio", encode_wav(rate, s)


def with_real_payloads(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) -> (media_id, kind, payload) with REAL PPM/WAV bytes built
    worker-side in one Arrow pass — the generation stage of the real-
    codec contract path (bytes cross the Arrow boundary exactly as a
    user's real media columns would)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def payload_udf(ids_s: pd.Series) -> pd.Series:
        return pd.Series(
            [synthesize_real_payload(int(i))[1] for i in ids_s],
            dtype=object,
        )

    return ids.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.pmod(id_col, F.lit(2)) == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
        payload_udf(F.col(id_col)).alias("payload"),
    )


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=64 + (i % 5) * 32, dtype="int64").astype("uint8"))
        if i % 7 == 0 and i > 0:  # inject exact-duplicate payloads
            payload = bytes(rng.RandomState if False else b"DUPLICATE-PAYLOAD-BLOCK" * 8)
        meta = (
            "application/octet-stream",
            64 if kind == "image" else None,
            64 if kind == "image" else None,
            5000 if kind == "video" else None,
            16000 if kind == "audio" else None,
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
