"""Composed media-curation pipeline (plans/media_curation.py): decode
-> structural filter -> perceptual near-dup keeper -> resize, end to
end on a mixed-format corpus."""

from __future__ import annotations

import pytest

import numpy as np

from ffi_export_etl_spark.operators.media_codecs import (
    decode_gif,
    decode_jpeg,
    decode_png,
    encode_gif,
    encode_jpeg,
    encode_png,
    encode_ppm,
)
from tests.test_media_codecs import _flac_bytes, _wav_bytes

# r12 suite split: end-to-end/property sweep module — runs with SPARK_GRAFT_SLOW_TESTS=1
pytestmark = pytest.mark.slow_tail


def _media_df(spark, rows):
    return spark.createDataFrame(
        [
            (mid, kind, bytearray(b), mime, len(b))
            for mid, kind, b, mime in rows
        ],
        "media_id: long, kind: string, content: binary, mime: string, "
        "n_bytes: long",
    )


def test_curate_media_end_to_end(spark):
    from ffi_export_etl_spark.plans.media_curation import curate_media

    rng = np.random.default_rng(41)
    big = rng.integers(0, 256, (80, 120, 3), dtype=np.uint8)
    big_edit = big.copy()
    big_edit[:2, :2] = 0  # perceptual near-dup of `big`
    tiny = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    other = np.tile(
        (np.arange(120, dtype=np.uint8)).reshape(1, 120, 1), (80, 1, 3)
    )
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    gif = encode_gif(
        [pal[rng.integers(0, 8, (60, 90), dtype=np.uint8)]] * 2, [10, 10]
    )

    t = np.arange(16000)
    tone = (np.sin(2 * np.pi * 440 * t / 8000) * 1000).astype(np.int16)
    tone_quiet = (tone * 0.8).astype(np.int16)
    blip = (np.sin(2 * np.pi * 999 * np.arange(800) / 8000) * 900).astype(
        np.int16
    )  # 0.1 s: below min duration

    rows = [
        (1, "image", encode_png(big), "image/png"),
        (2, "image", encode_jpeg(big_edit, quality=95), "image/jpeg"),
        (3, "image", encode_ppm(tiny), "image/x-portable-pixmap"),
        (4, "image", encode_ppm(other), "image/x-portable-pixmap"),
        (5, "video", gif, "image/gif"),
        (6, "audio", _wav_bytes(tone), "audio/wav"),
        (7, "audio", _wav_bytes(tone_quiet), "audio/wav"),
        (8, "audio", _wav_bytes(blip), "audio/wav"),
        (9, "audio", _flac_bytes(total=441000), "audio/flac"),
        (10, "image", b"\x89PNGcorrupt!", "image/png"),
    ]
    out = curate_media(
        _media_df(spark, rows),
        min_width=32,
        min_height=32,
        min_duration_s=0.5,
        resize_max_px=48,
    )
    got = {r.media_id: r for r in out.collect()}

    # near-dup pairs collapse to the min-id keeper: 2 loses to 1,
    # 7 loses to 6; 3 is too small; 8 too short; 10 corrupt
    assert set(got) == {1, 4, 5, 6, 9}
    assert got[1].cluster_id == 1 and got[4].cluster_id == 4
    assert got[6].cluster_id == 6

    # resize applied and format preserved per codec
    img1 = decode_png(bytes(got[1].content))
    assert max(img1.shape[:2]) <= 48
    frames, _ = decode_gif(bytes(got[5].content))
    assert len(frames) == 2 and max(frames[0].shape[:2]) <= 48
    assert bytes(got[6].content)[:4] == b"RIFF"  # audio untouched

    # feature metadata rides along
    assert got[9].format == "flac" and got[9].duration_s == 10.0
    assert got[4].width == 120  # pre-resize structural width


def test_curate_media_stage_functions_standalone(spark):
    from ffi_export_etl_spark.operators.multimodal import image_dhash
    from ffi_export_etl_spark.plans.media_curation import near_dup_keepers

    rng = np.random.default_rng(42)
    a = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    b = a.copy()
    b[0, 0] = 0
    c = np.tile((np.arange(40, dtype=np.uint8) * 6).reshape(1, 40, 1),
                (40, 1, 3))
    media = _media_df(
        spark,
        [
            (1, "image", encode_ppm(a), "x"),
            (2, "image", encode_ppm(b), "x"),
            (3, "image", encode_ppm(c), "x"),
        ],
    )
    keep = {
        r.media_id: r
        for r in near_dup_keepers(image_dhash(media), "dhash").collect()
    }
    assert keep[1].is_keeper and not keep[2].is_keeper
    assert keep[2].cluster_id == 1
    assert keep[3].is_keeper and keep[3].cluster_id == 3
