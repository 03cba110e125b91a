"""Multimodal column conventions + Arrow-batched processing plumbing.

Convention: media is an opaque ``binary`` column plus a typed
metadata struct — the same shape the reference used for its binary
file staging (xlsx/docx downloads, episode_stats_extract.py:55-59 /
confessional_extract.py:156-166), generalized:

    asset_id   bigint
    media      binary
    media_meta struct<mime: string, width: int, height: int,
                      duration_s: double>

Processing runs through ``mapInPandas`` — Arrow batches in, Arrow
batches out, parallel per partition; binary blobs never pass through
the driver.  Actual codecs (PIL/ffmpeg) are NOT in this container,
so decode bodies are stubbed: ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, in which case it
produces a deterministic fake decode (byte length + md5 + an 8-dim
feature vector from the digest) so the Spark-side plumbing — schema,
batching, partitioning — is fully exercised and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_s", DoubleType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_meta", MEDIA_META),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def text_as_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Adapter: treat a text column as a binary asset (utf-8), for
    exercising the media plumbing on the documents table."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("media_meta"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for asset_id, blob in zip(pdf["asset_id"], pdf["media"]):
        b = bytes(blob) if blob is not None else b""
        digest = hashlib.md5(b).hexdigest()
        # 8-dim deterministic pseudo-feature from the digest bytes
        raw = hashlib.md5(b).digest()
        feats = [raw[i] / 255.0 for i in range(8)]
        out.append((asset_id, len(b), digest, feats))
    return pd.DataFrame(out, columns=["asset_id", "n_bytes", "digest", "features"])


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract media blobs via mapInPandas.

    Real codec libraries (PIL, torchaudio, ffmpeg) are not available
    in this environment; with ``fake=False`` this raises at plan
    time rather than shipping a broken UDF to executors."""
    if not fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "pass fake=True for the deterministic stub decode"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_meta", MEDIA_META),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_s", DoubleType()),
        StructField("frame", BinaryType()),
    ]
)


def resize_media(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize image/video media to (width, height): binary→binary
    through mapInPandas, metadata struct updated in the same pass.
    Real resampling needs PIL/ffmpeg; the fake codec is a
    deterministic byte transform (truncate/cycle to w*h bytes) so
    schema, batching and meta propagation are fully exercised."""
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "pass fake=True for the deterministic stub resize"
        )
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, blob, meta in zip(
                pdf["asset_id"], pdf["media"], pdf["media_meta"]
            ):
                b = bytes(blob) if blob is not None else b""
                resized = (b * (target // max(len(b), 1) + 1))[:target]
                mime = meta["mime"] if meta is not None else None
                rows.append(
                    (
                        asset_id,
                        resized,
                        {
                            "mime": mime,
                            "width": width,
                            "height": height,
                            "duration_s": meta["duration_s"]
                            if meta is not None
                            else None,
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=["asset_id", "media", "media_meta"])

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_s: float = 1.0, fake: bool = False) -> DataFrame:
    """Video frame sampling: ONE media row → N frame rows (UDTF-style
    1→N emit through mapInPandas, SURVEY §2 M3).  Frames at t = 0,
    every_s, 2*every_s, … while t < media_meta.duration_s.  Real
    decoding needs ffmpeg; the fake codec derives each frame's bytes
    deterministically from (digest of the blob, frame_idx), so row
    multiplicity, ordering, and batch shape — the Spark-side
    semantics — are real and testable."""
    if not fake:
        raise NotImplementedError(
            "video codecs not available in this environment; "
            "pass fake=True for the deterministic stub sampler"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, blob, meta in zip(
                pdf["asset_id"], pdf["media"], pdf["media_meta"]
            ):
                dur = meta["duration_s"] if meta is not None else None
                if dur is None or dur <= 0:
                    continue
                b = bytes(blob) if blob is not None else b""
                base = hashlib.md5(b).digest()
                idx, t = 0, 0.0
                while t < dur:
                    frame = hashlib.md5(base + idx.to_bytes(4, "big")).digest()
                    rows.append((asset_id, idx, t, frame))
                    idx += 1
                    t = idx * every_s
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "ts_s", "frame"]
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
