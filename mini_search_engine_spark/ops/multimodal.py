"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker sees whole record batches (the shape
a real decoder wants). The decode step itself is STUBBED — the container
has no image/audio libraries — behind ``decoder=`` hooks: the default
"fake" decoder derives deterministic pseudo-features from the bytes so the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape) is
real and testable; pass a real decoder callable in production.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def real_decoder_stub(payload: bytes, media_type: str) -> list[float]:
    """Placeholder for a real decode+featurize step (PIL/librosa/ffmpeg are
    not in this container)."""
    raise NotImplementedError(
        "real media decoding requires image/audio libs not present here; "
        "pass decoder=fake_decoder or your own callable"
    )


def fake_decoder(payload: bytes, media_type: str) -> list[float]:
    """Deterministic pseudo-features: 8 floats from the payload sha256."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def synthesize_media(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Derive a deterministic media table from a text corpus (payload =
    utf-8 bytes; metadata from content length) — test stand-in for a real
    binary ingest."""
    c = F.col(content_col)
    return docs.select(
        "docid",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("docid") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(c, "UTF-8").alias("payload"),
        F.struct(
            (F.length(c) % 640).cast("int").alias("width"),
            (F.length(c) % 480).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.length(c) % 32).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resize: derives a byte buffer of
    the target 'pixel count' (÷64) from the payload digest — size-correct
    output without an image library."""
    target = max(1, (width * height) // 64)
    h = hashlib.sha256(payload).digest()
    reps = (target + len(h) - 1) // len(h)
    return (h * reps)[:target]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = fake_resizer,
) -> DataFrame:
    """Resize every IMAGE payload to (width, height) via an Arrow-batched
    mapInPandas; non-image rows pass through untouched. The transform is
    pluggable (pass a PIL-backed callable in production); metadata is
    rewritten to the new dimensions so downstream consumers see a
    consistent (payload, meta) pair."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            is_img = pdf["media_type"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "payload"] = [
                resizer(p, width, height) for p in pdf.loc[is_img, "payload"]
            ]
            pdf.loc[is_img, "meta"] = [
                {**(m or {}), "width": width, "height": height}
                for m in pdf.loc[is_img, "meta"]
            ]
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def fake_frame_extractor(payload: bytes, idx: int) -> bytes:
    return hashlib.sha256(payload + idx.to_bytes(4, "big")).digest()


def sample_frames(
    media: DataFrame,
    every_n: int = 4,
    extractor: Callable[[bytes, int], bytes] = fake_frame_extractor,
) -> DataFrame:
    """Sample every ``every_n``-th frame of VIDEO payloads → one row per
    sampled frame (docid, frame_idx, frame_payload). Row-expanding
    mapInPandas: one input batch yields a frame batch; the frame count
    comes from the typed metadata (``meta.n_frames``), so the plumbing is
    exactly what an ffmpeg-backed extractor would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            docids, idxs, frames = [], [], []
            vid = pdf[pdf["media_type"] == "video"]
            for _, r in vid.iterrows():
                n = (r["meta"] or {}).get("n_frames") or 0
                for i in range(0, int(n), every_n):
                    docids.append(r["docid"])
                    idxs.append(i)
                    frames.append(extractor(r["payload"], i))
            if docids:
                yield pd.DataFrame(
                    {"docid": docids, "frame_idx": idxs, "frame_payload": frames}
                )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = fake_decoder,
) -> DataFrame:
    """Arrow-batched decode/featurize over mapInPandas (the real plumbing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [decoder(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"],
                    "media_type": pdf["media_type"],
                    "payload_sha": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
