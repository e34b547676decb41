"""Real media decode kernels (operators/media_codecs.py) and their
Spark-side extractors: PPM/PGM/BMP via numpy, WAV via the stdlib —
actually-executing decode for every format that needs no external
library, with the injectable stub reserved for JPEG/PNG/MP4."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from ffi_export_etl_spark.operators.media_codecs import (
    audio_stats,
    decode_bmp,
    decode_pnm,
    decode_wav,
    encode_ppm,
    real_decode,
    resize_nearest,
    sniff,
)


def _img(h: int, w: int) -> np.ndarray:
    return (np.arange(h * w * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(
        (h, w, 3)
    )


def _bmp_bytes(arr: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BI_RGB BMP writer (test-side oracle)."""
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y][..., ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_bytes - len(row))
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return header + bytes(body)


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def test_pnm_roundtrip_and_ascii():
    arr = _img(5, 7)
    data = encode_ppm(arr)
    assert sniff(data) == "ppm"
    back = decode_pnm(data)
    assert np.array_equal(back, arr)
    # grayscale
    g = arr[..., 0]
    gb = decode_pnm(encode_ppm(g))
    assert np.array_equal(gb, g)
    # ASCII P2 with a header comment
    ascii_pgm = b"P2\n# comment\n3 2\n255\n" + " ".join(
        str(v) for v in range(6)
    ).encode()
    a = decode_pnm(ascii_pgm)
    assert a.shape == (2, 3) and a[1, 2] == 5


def test_bmp_decode_matches_source_pixels():
    arr = _img(4, 5)  # width 5 -> row padding exercised
    back = decode_bmp(_bmp_bytes(arr))
    assert np.array_equal(back, arr)


def test_wav_decode_and_stats():
    t = np.arange(8000)
    samples = (np.sin(2 * np.pi * 440 * t / 8000) * 1000).astype(np.int16)
    arr, rate = decode_wav(_wav_bytes(samples))
    assert rate == 8000 and arr.shape == (8000, 1)
    st = audio_stats(arr, rate)
    assert st["duration_s"] == 1.0
    assert 600 < st["rms"] < 800  # sine RMS ~ 707
    assert 0.1 < st["zero_crossing_rate"] < 0.12  # 440 Hz -> ~880 zc/s


def test_real_decode_dispatch_and_fallback():
    assert real_decode(encode_ppm(_img(3, 9)), "image") == {
        "width": 9, "height": 3,
    }
    assert real_decode(_wav_bytes(np.zeros(100)), "audio") == {
        "width": 100, "height": 8000,
    }
    assert real_decode(b"\x89PNG....", "image") is None  # needs PIL


def test_resize_nearest_bounds_and_noop():
    arr = _img(100, 40)
    small = resize_nearest(arr, 25)
    assert max(small.shape[:2]) == 25 and small.shape == (25, 10, 3)
    assert resize_nearest(small, 25) is small


def test_spark_extract_real_features_and_resize(spark):
    from ffi_export_etl_spark.operators.multimodal import (
        extract_real_features,
        resize_images,
    )

    img = encode_ppm(_img(64, 32))
    wav = _wav_bytes((np.ones(4000) * 500))
    rows = [
        (1, "image", bytearray(img), "image/x-portable-pixmap", len(img)),
        (2, "audio", bytearray(wav), "audio/wav", len(wav)),
        (3, "image", bytearray(b"\x89PNG123"), "image/png", 8),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id: long, kind: string, content: binary, mime: string, n_bytes: long",
    )
    feats = {r["media_id"]: r for r in extract_real_features(media).collect()}
    assert feats[1]["format"] == "ppm" and feats[1]["width"] == 32
    assert feats[1]["channels"] == 3 and feats[1]["mean_value"] is not None
    assert feats[2]["format"] == "wav" and feats[2]["duration_s"] == 0.5
    assert feats[3]["format"] == "unknown" and feats[3]["width"] is None

    resized = {r["media_id"]: r for r in resize_images(media, 16).collect()}
    out = decode_pnm(bytes(resized[1]["content"]))
    assert max(out.shape[:2]) == 16  # 64x32 -> 16x8
    assert bytes(resized[3]["content"]) == b"\x89PNG123"  # passthrough


def test_image_near_duplicates(spark):
    """dHash + chunk-banded join: re-encoded/slightly-edited copies pair
    up, structurally different images do not, undecodable bytes are
    ignored."""
    from ffi_export_etl_spark.operators.multimodal import image_near_duplicates

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (40, 60, 3)).astype(np.uint8)
    edited = base.copy()
    edited[:2, :2] = 0  # small local edit
    grad = np.tile(
        (np.arange(60, dtype=np.uint8) * 4).reshape(1, 60, 1), (40, 1, 3)
    )
    rows = [
        (1, "image", bytearray(encode_ppm(base)), "x", 0),
        (2, "image", bytearray(_bmp_bytes(base)), "x", 0),      # same pixels, other codec
        (3, "image", bytearray(encode_ppm(edited)), "x", 0),    # near-dup
        (4, "image", bytearray(encode_ppm(grad)), "x", 0),      # different
        (5, "image", bytearray(b"\x89PNGnope"), "x", 0),        # undecodable
    ]
    media = spark.createDataFrame(
        rows,
        "media_id: long, kind: string, content: binary, mime: string, n_bytes: long",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_duplicates(media, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0  # codec-independent
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_audio_near_duplicates(spark):
    """Spectral fingerprint + shared band join: a volume-scaled copy of
    a clip pairs with the original at hamming 0; a different melody does
    not pair; images in the same frame are ignored by the audio path."""
    from ffi_export_etl_spark.operators.multimodal import audio_near_duplicates

    t = np.arange(16000)
    a = (
        np.sin(2 * np.pi * 440 * t / 8000) * 1000
        + np.sin(2 * np.pi * 880 * t / 8000) * 300 * (t > 8000)
    ).astype(np.int16)
    quiet = (a * 0.8).astype(np.int16)
    other = (np.sin(2 * np.pi * 123 * t / 8000) * 900).astype(np.int16)
    rows = [
        (1, "audio", bytearray(_wav_bytes(a)), "audio/wav", 0),
        (2, "audio", bytearray(_wav_bytes(quiet)), "audio/wav", 0),
        (3, "audio", bytearray(_wav_bytes(other)), "audio/wav", 0),
        (4, "image", bytearray(encode_ppm(_img(8, 8))), "x", 0),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id: long, kind: string, content: binary, mime: string, n_bytes: long",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_duplicates(media).collect()
    }
    assert pairs == {(1, 2): 0}


def test_corrupt_blobs_degrade_not_crash(spark):
    """Magic-byte matches with malformed bodies must degrade (corrupt /
    null / passthrough), never abort the job; too-short audio must not
    fingerprint (None != a shared hash of 0)."""
    from ffi_export_etl_spark.operators.media_codecs import audio_hash64
    from ffi_export_etl_spark.operators.multimodal import (
        audio_fingerprints,
        extract_real_features,
        image_dhash,
        resize_images,
    )

    assert audio_hash64(np.zeros((5, 1))) is None

    bad = [
        (1, "image", bytearray(b"BM\x01\x02truncated"), "x", 0),
        (2, "image", bytearray(b"P6\n9999 9999\n255\nxx"), "x", 0),
        (3, "audio", bytearray(b"RIFF0000WAVEjunk"), "x", 0),
        (4, "audio", bytearray(_wav_bytes(np.zeros(4))), "x", 0),  # too short
    ]
    media = spark.createDataFrame(
        bad,
        "media_id: long, kind: string, content: binary, mime: string, n_bytes: long",
    )
    feats = {r["media_id"]: r for r in extract_real_features(media).collect()}
    assert feats[1]["format"] == "corrupt" and feats[1]["width"] is None
    assert feats[2]["format"] == "corrupt"
    assert feats[3]["format"] == "corrupt"
    assert all(r["dhash"] is None for r in image_dhash(media).collect())
    assert all(r["ahash"] is None for r in audio_fingerprints(media).collect())
    back = {r["media_id"]: bytes(r["content"]) for r in resize_images(media).collect()}
    assert back[1] == bytes(bad[0][2])  # passthrough unchanged
