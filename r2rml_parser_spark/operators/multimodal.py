"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested — the actual codec decode is STUBBED
(image/audio libraries are not in this container): ``decode_media``
raises NotImplementedError unless ``fake=True``, which substitutes a
deterministic md5-driven byte expansion so tests exercise the full
pipeline shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("bytes", T.IntegerType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media_table(spans: DataFrame) -> DataFrame:
    """Deterministic opaque payloads for every media span: payload =
    unhex(md5(media_ref)) repeated; metadata derived from the ref hash.
    (Pure Catalyst — the binary column is real, the codec bytes fake.)"""
    m = spans.where(F.col("kind") != "text").select("media_ref", "kind")
    h = F.md5(F.col("media_ref"))
    payload = F.unhex(F.concat(h, h, h, h))  # 64 deterministic bytes
    nbytes = F.length(payload).cast("int")
    w = (F.ascii(F.substring(h, 1, 1)) % 8 * 64 + 64).cast("int")
    ht = (F.ascii(F.substring(h, 2, 1)) % 8 * 64 + 64).cast("int")
    dur = (F.ascii(F.substring(h, 3, 1)) * 100).cast("int")
    return m.select(
        "media_ref",
        "kind",
        payload.alias("payload"),
        F.struct(
            nbytes.alias("bytes"),
            F.when(F.col("kind") == "image", w).alias("width"),
            F.when(F.col("kind") == "image", ht).alias("height"),
            F.when(F.col("kind") != "image", dur).alias("duration_ms"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, kind: str, *, fake: bool = False) -> bytes:
    """Codec decode stub. Real decoders (PIL / soundfile / av) are not in
    this container; ``fake=True`` returns a deterministic expansion."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio codecs not present in this environment; "
            "pass fake=True for the deterministic test double"
        )
    out = bytearray()
    seed = payload or b""
    for i in range(4):
        seed = hashlib.md5(seed + bytes([i])).digest()
        out += seed
    return bytes(out)


def extract_features(media: DataFrame, *, fake_decode: bool = True,
                     frame_sample: int = 4, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, one pandas frame per
    partition batch. decode → frame-sample → pooled float feature.

    The batch shape is the real contract: payloads arrive as a
    ``bytes`` Series, features leave as list[float32] — swap the body
    for a real codec without touching the plan."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, frames = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = decode_media(payload, kind, fake=fake_decode)
                n = min(frame_sample, max(1, len(raw) // 16))
                step = max(1, len(raw) // (n * dim))
                vec = [
                    float(sum(raw[(f * dim + d) * step % len(raw)] for f in range(n)) / n) / 255.0
                    for d in range(dim)
                ]
                feats.append([round(v, 6) for v in vec])
                frames.append(n)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_frames": pd.array(frames, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.select("media_ref", "kind", "payload").mapInPandas(batches, FEATURE_SCHEMA)
