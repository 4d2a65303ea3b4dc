"""Real stdlib media decoding: PPM/WAV synthesis → decode → features,
end-to-end through the Arrow mapInPandas plumbing."""

import math

import numpy as np
import pytest

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.ops.multimodal import (
    decode_ppm,
    decode_wav,
    extract_features,
    real_decoder_stub,
    stdlib_decoder,
    synthesize_ppm,
    synthesize_real_media,
    synthesize_wav,
)


def test_ppm_roundtrip():
    p = synthesize_ppm(42, width=16, height=12)
    w, h, mv, px = decode_ppm(p)
    assert (w, h, mv) == (16, 12, 255)
    assert px.shape == (12, 16, 3) and px.dtype == np.uint8
    # deterministic in the seed, different across seeds
    assert synthesize_ppm(42, 16, 12) == p
    assert synthesize_ppm(43, 16, 12) != p
    # comment + multi-whitespace headers parse too
    manual = b"P6\n# c1\n# c2\n 4\t3\n255\n" + bytes(range(36))
    w2, h2, mv2, px2 = decode_ppm(manual)
    assert (w2, h2, mv2) == (4, 3, 255)
    assert px2[0, 0, 0] == 0 and px2[2, 3, 2] == 35
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_ppm_nonstandard_maxval_normalization():
    """Channel stats must normalize by the HEADER maxval, not a dtype
    guess: an all-maxval image scores mean 1.0 whatever maxval says."""
    from mini_search_engine_spark.ops import stdlib_decoder

    # maxval=15, one-byte samples, every pixel at full scale
    one = b"P6\n2 2\n15\n" + bytes([15] * 12)
    feats = stdlib_decoder(one, "image")
    assert feats[2] == feats[3] == feats[4] == 1.0  # mean R/G/B
    # maxval=1023, two-byte big-endian samples at full scale
    px = (1023).to_bytes(2, "big") * 12
    two = b"P6\n2 2\n1023\n" + px
    w, h, mv, arr = decode_ppm(two)
    assert (w, h, mv) == (2, 2, 1023) and arr.max() == 1023
    feats2 = stdlib_decoder(two, "image")
    assert feats2[2] == feats2[7] == 1.0  # mean R and max


def test_wav_roundtrip():
    p = synthesize_wav(7, sample_rate=16000, n_samples=800)
    sr, x = decode_wav(p)
    assert sr == 16000 and len(x) == 800
    freq = 110.0 * (1 + 7 % 32)
    ref = np.sin(2 * math.pi * freq * np.arange(800) / 16000) * 0.5
    assert np.abs(x - ref).max() < 1e-3  # 16-bit quantization error only
    # sine features: RMS ~ 0.5/sqrt(2), zero-mean
    f = stdlib_decoder(p, "audio")
    assert abs(f[2] - 0.5 / math.sqrt(2)) < 0.01
    assert abs(f[4]) < 1e-3
    assert f[0] == 16000 / 1e5 and f[1] == 800 / 1e6


def test_stdlib_decoder_dispatch():
    img = stdlib_decoder(synthesize_ppm(1), "image")  # default 16x12
    assert len(img) == 8 and img[0] == 16 / 1e4 and img[1] == 12 / 1e4
    assert 0.0 <= min(img[2:]) and max(img[2:]) <= 1.0
    # unknown format falls back to deterministic pseudo-features
    fb = stdlib_decoder(b"\x89PNG....", "image")
    assert len(fb) == 8 and fb == stdlib_decoder(b"\x89PNG....", "image")
    with pytest.raises(NotImplementedError):
        real_decoder_stub(b"\x89PNG....", "image")


def test_real_media_end_to_end(spark):
    rows = [(i, f"doc number {i} content", "en", "t", 20) for i in range(12)]
    docs = load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    media = synthesize_real_media(docs)
    rows_m = {r["docid"]: r for r in media.collect()}
    assert {r["media_type"] for r in rows_m.values()} == {"image", "audio", "video"}
    # payloads really decode, and meta agrees with the parsed header
    for d, r in rows_m.items():
        if r["media_type"] == "image":
            w, h, _, _ = decode_ppm(bytes(r["payload"]))
            assert (w, h) == (r["meta"]["width"], r["meta"]["height"])
        elif r["media_type"] == "audio":
            sr, x = decode_wav(bytes(r["payload"]))
            assert sr == r["meta"]["sample_rate"] == 16000
            assert len(x) == 512 + (d % 8) * 128

    feats = {r["docid"]: r for r in extract_features(media).collect()}
    for d, r in rows_m.items():
        got = feats[d]
        assert got["features"] == pytest.approx(
            stdlib_decoder(bytes(r["payload"]), r["media_type"]), abs=1e-6
        )
        assert got["payload_bytes"] == len(bytes(r["payload"]))
    # image features are REAL decode output: width/height channel present
    img_d = next(d for d, r in rows_m.items() if r["media_type"] == "image")
    assert feats[img_d]["features"][0] == pytest.approx(
        rows_m[img_d]["meta"]["width"] / 1e4
    )
