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


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    import zlib

    body = ctype + payload
    return (
        struct.pack(">I", len(payload))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def _hand_filtered_png(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Independent PNG writer applying a CHOSEN filter type per scanline
    (the library encoder only emits filter 0, so decode coverage of
    Sub/Up/Average/Paeth needs its own filtering implementation)."""
    import zlib

    from ffi_export_etl_spark.operators.media_codecs import PNG_SIGNATURE

    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, ft in enumerate(ftypes):
        row = flat[y]
        left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if ft == 0:
            f = row
        elif ft == 1:
            f = row - left
        elif ft == 2:
            f = row - prev
        elif ft == 3:
            f = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            f = row - pred
        out.append(ft)
        out.extend((f % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_color_types():
    from ffi_export_etl_spark.operators.media_codecs import (
        decode_png,
        encode_png,
        real_decode,
        sniff,
    )

    rng = np.random.default_rng(11)
    for shape in [(5, 7), (4, 6, 3), (3, 5, 4), (2, 9, 2)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        png = encode_png(arr)
        assert sniff(png) == "png"
        back = decode_png(png)
        assert back.shape == arr.shape and np.array_equal(back, arr)
    assert real_decode(encode_png(rng.integers(0, 256, (3, 8), np.uint8)),
                       "image") == {"width": 8, "height": 3}


def test_png_decode_every_filter_type():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    from ffi_export_etl_spark.operators.media_codecs import decode_png

    png = _hand_filtered_png(img, [0, 1, 2, 3, 4, 4])
    assert np.array_equal(decode_png(png), img)
    # gradient images exercise the Paeth predictor's three branches
    grad = np.add.outer(np.arange(8) * 20, np.arange(6) * 10)[..., None]
    grad = np.broadcast_to(grad % 256, (8, 6, 3)).astype(np.uint8)
    png = _hand_filtered_png(grad, [4] * 8)
    assert np.array_equal(decode_png(png), grad)


def test_png_palette_and_malformed():
    import zlib

    import pytest

    from ffi_export_etl_spark.operators.media_codecs import (
        PNG_SIGNATURE,
        decode_png,
    )

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(3, 4), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    png = (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), pal[idx])
    # malformed streams raise (and so degrade to 'corrupt' in the
    # mapInPandas kernels): truncation, wrong depth, missing IEND
    with pytest.raises(ValueError):
        decode_png(png[:40])
    bad_depth = struct.pack(">IIBBBBB", 4, 3, 16, 3, 0, 0, 0)
    with pytest.raises(ValueError):
        decode_png(PNG_SIGNATURE + _png_chunk(b"IHDR", bad_depth)
                   + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr))


def test_png_through_spark_features_resize_and_dhash(spark):
    """PNG blobs flow through all three mapInPandas surfaces: feature
    extraction reports real dims/channels, resize re-encodes AS PNG
    (alpha survives), and dhash matches the same pixels fed as PPM."""
    from ffi_export_etl_spark.operators.media_codecs import (
        decode_png,
        encode_png,
        encode_ppm,
    )
    from ffi_export_etl_spark.operators.multimodal import (
        extract_real_features,
        image_dhash,
        resize_images,
    )

    rng = np.random.default_rng(14)
    rgb = rng.integers(0, 256, size=(40, 30, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, size=(10, 8, 4), dtype=np.uint8)
    blobs = {1: encode_png(rgb), 2: encode_png(rgba), 3: encode_ppm(rgb)}
    mimes = {1: "image/png", 2: "image/png", 3: "image/x-portable-pixmap"}
    rows = [
        (mid, "image", bytearray(b), mimes[mid], len(b))
        for mid, b in blobs.items()
    ]
    media = spark.createDataFrame(
        rows,
        "media_id: long, kind: string, content: binary, mime: string, "
        "n_bytes: long",
    )

    feats = {r.media_id: r for r in extract_real_features(media).collect()}
    assert feats[1].format == "png" and feats[1].width == 30
    assert feats[2].channels == 4
    assert feats[1].mean_value == feats[3].mean_value  # same pixels

    resized = {r.media_id: bytes(r.content)
               for r in resize_images(media, max_px=16).collect()}
    out1 = decode_png(resized[1])
    assert resized[1][:4] == b"\x89PNG" and max(out1.shape[:2]) <= 16
    assert decode_png(resized[2]).shape[2] == 4  # alpha survived

    hashes = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    assert hashes[1] == hashes[3]  # same pixels, format-independent
    assert hashes[2] is not None
