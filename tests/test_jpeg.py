"""Baseline JPEG codec (operators/jpeg.py): transform/table pins against
the T.81 spec, lossy roundtrips across subsampling and restart layouts,
malformed-stream degradation, and the Spark multimodal surfaces."""

from __future__ import annotations

import numpy as np
import pytest

from ffi_export_etl_spark.operators.jpeg import (
    K_DC_LUMA,
    ZIGZAG,
    build_huffman_codes,
    dct2_blocks,
    decode_jpeg,
    encode_jpeg,
    idct2_blocks,
)


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                128 + 100 * np.sin(yy / 9) * np.cos(xx / 11),
                128 + 80 * np.cos(yy / 7),
                128 + 60 * np.sin(xx / 13),
            ],
            axis=-1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


def test_dct_spec_pins():
    # constant block -> only the DC coefficient (orthonormal: x * 8)
    c = dct2_blocks(np.full((1, 8, 8), 7.0))
    assert abs(c[0, 0, 0] - 56.0) < 1e-9
    assert np.abs(c).sum() - abs(c[0, 0, 0]) < 1e-9
    # a pure horizontal cosine lands on exactly one AC coefficient
    x = np.cos((2 * np.arange(8) + 1) * 3 * np.pi / 16)
    blk = np.tile(x, (8, 1))[None]
    c = dct2_blocks(blk)
    mask = np.zeros((8, 8), dtype=bool)
    mask[0, 3] = True
    assert np.abs(c[0][~mask]).max() < 1e-9
    # perfect inverse
    rng = np.random.default_rng(5)
    r = rng.normal(size=(10, 8, 8))
    assert np.allclose(idct2_blocks(dct2_blocks(r)), r, atol=1e-10)


def test_zigzag_and_huffman_spec_pins():
    # T.81 figure A.6 spot values
    assert ZIGZAG[0] == (0, 0)
    assert ZIGZAG[1] == (0, 1) and ZIGZAG[2] == (1, 0)
    assert ZIGZAG[35] == (7, 0) and ZIGZAG[63] == (7, 7)
    # canonical code assignment for the Annex K DC luminance table:
    # category 0 -> 00 (2 bits), category 1 -> 010 (3 bits)
    codes = build_huffman_codes(*K_DC_LUMA)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[11] == (0b111111110, 9)
    # prefix-free: no code is a prefix of a longer one
    as_bits = {
        format(code, f"0{ln}b") for code, ln in codes.values()
    }
    for a in as_bits:
        for b in as_bits:
            assert a == b or not b.startswith(a)


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 3])
def test_jpeg_roundtrip_color(subsampling, restart):
    img = _smooth(37, 53)  # non-multiple-of-16 dims exercise padding
    back = decode_jpeg(
        encode_jpeg(
            img, quality=92, subsampling=subsampling,
            restart_interval=restart,
        )
    )
    assert back.shape == img.shape
    err = np.abs(back.astype(int) - img.astype(int)).mean()
    assert err < 5.0, (subsampling, restart, err)


def test_jpeg_roundtrip_gray_and_quality_ladder():
    yy, xx = np.mgrid[0:24, 0:40]
    g = (yy * 4 + xx * 2).astype(np.uint8)
    errs = []
    for q in (95, 75, 40):
        back = decode_jpeg(encode_jpeg(g, quality=q))
        assert back.shape == g.shape and back.ndim == 2
        errs.append(np.abs(back.astype(int) - g.astype(int)).mean())
    assert errs[0] < 1.0
    assert errs == sorted(errs)  # lower quality -> no better fidelity


def test_jpeg_malformed_and_unsupported():
    img = _smooth(16, 16)
    good = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"notajpeg")
    with pytest.raises(ValueError):
        decode_jpeg(good[:2])  # SOI only: no scan
    # flip SOF0 -> SOF2 (progressive): explicit unsupported error
    progressive = bytearray(good)
    idx = progressive.index(b"\xff\xc0")
    progressive[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(progressive))


def test_jpeg_through_spark_surfaces(spark):
    from ffi_export_etl_spark.operators.media_codecs import encode_ppm
    from ffi_export_etl_spark.operators.multimodal import (
        extract_real_features,
        image_dhash,
        resize_images,
    )

    img = _smooth(48, 64)
    jb = encode_jpeg(img, quality=95)
    rows = [
        (1, "image", bytearray(jb), "image/jpeg", len(jb)),
        (2, "image", bytearray(encode_ppm(img)), "image/x-portable-pixmap", 0),
        (3, "image", bytearray(b"\xff\xd8\xff\xe0junk"), "image/jpeg", 8),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id: long, kind: string, content: binary, mime: string, "
        "n_bytes: long",
    )
    feats = {r.media_id: r for r in extract_real_features(media).collect()}
    assert feats[1].format == "jpeg"
    assert feats[1].width == 64 and feats[1].channels == 3
    assert abs(feats[1].mean_value - feats[2].mean_value) < 2.0
    assert feats[3].format == "corrupt"

    resized = {r.media_id: bytes(r.content)
               for r in resize_images(media, max_px=16).collect()}
    assert resized[1][:3] == b"\xff\xd8\xff"  # stays JPEG
    assert max(decode_jpeg(resized[1]).shape[:2]) <= 16

    # perceptual hash survives the lossy codec: distance to the same
    # pixels delivered losslessly is a few gradient bits at most
    hashes = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    ham = bin((hashes[1] ^ hashes[2]) & ((1 << 64) - 1)).count("1")
    assert ham <= 4, ham
    assert hashes[3] is None
