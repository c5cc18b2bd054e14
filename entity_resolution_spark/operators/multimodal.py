"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct; the
Spark-side machinery — schema, partition-friendly batching, Arrow UDF
signatures, frame sampling — is real and tested. The codec step itself is
STUBBED (this container ships no image/audio libraries): ``decode_media``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder produces stable feature vectors from the bytes,
so pipelines and tests exercise the full data path end-to-end.

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


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """STUB: real decoding needs PIL/ffmpeg/torchaudio, not present in this
    environment. The Spark plumbing around this call is real."""
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        f"no {kind} codec available in this environment; pass fake=True for "
        "the deterministic test decoder"
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
