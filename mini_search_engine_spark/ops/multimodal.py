"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker sees whole record batches (the shape
a real decoder wants).

Decoding is REAL for the formats the Python stdlib can parse — binary PPM
(P6) images via a hand-rolled netpbm header parser and PCM WAV audio via
the ``wave`` module (``stdlib_decoder``, the default): width/height and
per-channel pixel statistics for images, sample-rate/RMS/zero-crossing
features for audio. Formats that genuinely need external codecs
(JPEG/PNG/MP3/MP4 — PIL/librosa/ffmpeg are not in this container) fall
back to ``fake_decoder`` (deterministic pseudo-features from the payload
digest) so the pipeline shape stays testable end-to-end; swap in a real
codec-backed callable via ``decoder=`` in production.
"""

from __future__ import annotations

import hashlib
import io
import math
import wave
from typing import Callable, Iterator

import numpy as np
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
    """Placeholder for a codec-backed decode+featurize step (JPEG/PNG/MP3
    need PIL/librosa/ffmpeg, which are not in this container). PPM images
    and PCM WAV audio decode for real via ``stdlib_decoder``."""
    raise NotImplementedError(
        "decoding this format requires image/audio libs not present here; "
        "use stdlib_decoder (PPM/WAV), fake_decoder, or your own callable"
    )


def fake_decoder(payload: bytes, media_type: str) -> list[float]:
    """Deterministic pseudo-features: 8 floats from the payload sha256."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def decode_ppm(payload: bytes) -> tuple[int, int, int, "np.ndarray"]:
    """Parse a binary netpbm P6 image → (width, height, maxval, HxWx3
    uint8/uint16 pixel array). Pure stdlib: the netpbm header is ASCII
    tokens (magic, width, height, maxval) separated by whitespace/comments,
    followed by raw big-endian samples — no image library required. The
    header's maxval is returned because it is the normalization basis: a
    legal P6 may use any maxval in [1, 65535] (e.g. 1023), and dividing by
    a dtype-guessed 255/65535 would mis-scale every channel statistic."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header tokenizer: skip whitespace and '#' comments
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw samples
    width, height, maxval = fields
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    n = width * height * 3
    raster = np.frombuffer(payload, dtype=dtype, count=n, offset=pos)
    return width, height, maxval, raster.reshape(height, width, 3)


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Parse a PCM WAV payload → (sample_rate, float64 samples in [-1, 1],
    channel-averaged). Stdlib ``wave`` handles the RIFF framing; 8/16/32-bit
    integer PCM widths are normalized here."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return sr, x


def stdlib_decoder(payload: bytes, media_type: str) -> list[float]:
    """REAL decode for stdlib-parsable formats, sniffed by magic bytes —
    8 features either way so downstream schemas are type-stable:

    * PPM (``P6``): [width/1e4, height/1e4, mean R, mean G, mean B,
      pixel std, min, max] — channel stats normalized to [0, 1].
    * WAV (``RIFF..WAVE``): [sample_rate/1e5, n_samples/1e6, RMS,
      zero-crossing rate, mean, |peak|, p05, p95].

    Anything else falls back to ``fake_decoder`` (documented stand-in for
    codec formats this container cannot decode)."""
    if payload.startswith(b"P6"):
        width, height, maxval, px = decode_ppm(payload)
        f = px.astype(np.float64) / float(maxval)
        return [
            width / 1e4,
            height / 1e4,
            float(f[..., 0].mean()),
            float(f[..., 1].mean()),
            float(f[..., 2].mean()),
            float(f.std()),
            float(f.min()),
            float(f.max()),
        ]
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        sr, x = decode_wav(payload)
        if len(x) == 0:
            return [sr / 1e5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        return [
            sr / 1e5,
            len(x) / 1e6,
            float(np.sqrt(np.mean(x * x))),
            zcr,
            float(x.mean()),
            float(np.abs(x).max()),
            float(np.quantile(x, 0.05)),
            float(np.quantile(x, 0.95)),
        ]
    return fake_decoder(payload, media_type)


def synthesize_ppm(seed: int, width: int = 16, height: int = 12) -> bytes:
    """A VALID binary PPM payload, deterministic in ``seed`` (linear
    congruential pixel stream — no RNG state, no image library)."""
    n = width * height * 3
    i = np.arange(n, dtype=np.uint64)
    px = ((np.uint64(seed * 2654435761 + 12345) + i * np.uint64(1103515245)) >> np.uint64(16)).astype(np.uint8)
    header = f"P6\n# synthetic seed={seed}\n{width} {height}\n255\n".encode()
    return header + px.tobytes()


def synthesize_wav(seed: int, sample_rate: int = 16000, n_samples: int = 1024) -> bytes:
    """A VALID 16-bit mono PCM WAV payload: a sine at a seed-derived
    frequency (deterministic, stdlib ``wave`` writer)."""
    freq = 110.0 * (1 + (seed % 32))
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    x = (np.sin(2 * math.pi * freq * t) * 0.5 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


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


def synthesize_real_media(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Derive a media table whose image/audio payloads are REAL decodable
    bytes — valid binary PPM and PCM WAV synthesized deterministically
    from the docid (video stays an opaque utf-8 payload: no stdlib video
    container writer exists). Same schema as ``synthesize_media``; binary
    generation needs Python, so this is one Arrow-batched mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            types, payloads, metas = [], [], []
            for docid, content in zip(pdf["docid"], pdf[content_col]):
                kind = ("image", "audio", "video")[int(docid) % 3]
                types.append(kind)
                if kind == "image":
                    w, h = 16 + int(docid) % 16, 12 + int(docid) % 8
                    payloads.append(synthesize_ppm(int(docid), w, h))
                    metas.append(
                        {"width": w, "height": h, "sample_rate": None, "n_frames": None}
                    )
                elif kind == "audio":
                    n = 512 + (int(docid) % 8) * 128
                    payloads.append(synthesize_wav(int(docid), 16000, n))
                    metas.append(
                        {"width": None, "height": None, "sample_rate": 16000, "n_frames": None}
                    )
                else:
                    payloads.append((content or "").encode("utf-8"))
                    metas.append(
                        {
                            "width": None,
                            "height": None,
                            "sample_rate": None,
                            "n_frames": len(content or "") % 32,
                        }
                    )
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"],
                    "media_type": types,
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return docs.select("docid", content_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


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
    decoder: Callable[[bytes, str], list[float]] = stdlib_decoder,
) -> DataFrame:
    """Arrow-batched decode/featurize over mapInPandas. The default
    ``stdlib_decoder`` REALLY decodes PPM images and PCM WAV audio (and
    falls back to digest pseudo-features for codec formats the container
    can't parse); pass ``fake_decoder`` for fully synthetic features or a
    codec-backed callable in production."""

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
