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
    # flip SOF0 -> SOF3 (lossless): explicit unsupported error
    lossless = bytearray(good)
    idx = lossless.index(b"\xff\xc0")
    lossless[idx + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(bytes(lossless))


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


def test_progressive_matches_baseline_reconstruction():
    """The progressive encoder transmits the SAME quantized coefficients
    as the baseline encoder, so both decodes must be bit-identical —
    across gradient (sparse bands), noise (dense bands), and flat
    (maximum EOB runs) content, gray and color."""
    from ffi_export_etl_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(31)
    cases = [
        (_smooth(37, 53), 92),
        (rng.integers(0, 256, (40, 24, 3), dtype=np.uint8), 30),
        (np.full((64, 48), 130, np.uint8), 85),
        ((np.add.outer(np.arange(24) * 3, np.arange(40))).astype(np.uint8), 90),
    ]
    for img, q in cases:
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        base = decode_jpeg(encode_jpeg(img, quality=q))
        assert np.array_equal(prog, base), (img.shape, q)


def test_progressive_ac_successive_approximation_refinement():
    """Hand-built two-stage AC stream (the one path the library encoder
    does not emit): first scan at Al=1, then a refinement scan at Ah=1
    whose correction/newly-nonzero bits are encoded here independently,
    following T.81 G.1.2.3. Decoded coefficients must equal the
    originals exactly."""
    import struct as st

    from ffi_export_etl_spark.operators import jpeg as J

    # coefficient plan over zig-zag 1..63: covers first-scan-visible
    # values (|v|>=2, incl. one needing a correction bit), refinement
    # newly-nonzero (+1/-1), zero runs, and an EOB tail with a pending
    # correction bit after the last newly-nonzero position
    v = np.zeros(64, dtype=np.int32)
    v[1] = 5    # first scan 2, correction bit 1
    v[2] = -2   # first scan -1, correction bit 0
    v[5] = 1    # newly nonzero in refinement (+)
    v[9] = -1   # newly nonzero in refinement (-)
    v[12] = 4   # first scan 2, correction bit 0
    v[20] = -3  # first scan -1, correction bit 1

    spec = J.PROG_AC_SPEC
    ac = J.build_huffman_codes(*spec)
    dc = J.build_huffman_codes(*J.K_DC_LUMA)

    def seg(marker, payload):
        return b"\xff" + bytes([marker]) + st.pack(">H", len(payload) + 2) + payload

    q_id = np.ones((8, 8), dtype=np.int32)  # identity quantization
    dqt = bytes([0]) + bytes(
        int(q_id[r, c]) for r, c in J.ZIGZAG
    )
    sof = st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(J.K_DC_LUMA[0]) + bytes(J.K_DC_LUMA[1])
    dht_ac = bytes([0x10]) + bytes(spec[0]) + bytes(spec[1])

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, dqt) + seg(0xC2, sof) + seg(0xC4, dht_dc) + seg(0xC4, dht_ac)

    # scan 1: DC first (Al=0), value 0
    out += seg(0xDA, bytes([1, 1, 0x00]) + bytes([0, 0, 0x00]))
    w = J._BitWriter()
    w.write(dc[0][0], dc[0][1])  # diff category 0
    w.flush()
    out += w.out

    # scan 2: AC first, Ss=1 Se=63, Al=1 -> magnitudes >> 1, sign kept
    out += seg(0xDA, bytes([1, 1, 0x00]) + bytes([1, 63, 0x01]))
    w = J._BitWriter()
    run = 0
    last_nz = 0
    for k in range(1, 64):
        mag = abs(int(v[k])) >> 1
        if mag == 0:
            run += 1
            continue
        t, code = J._mag_bits(mag if v[k] > 0 else -mag)
        while run > 15:
            w.write(ac[0xF0][0], ac[0xF0][1])
            run -= 16
        w.write(ac[(run << 4) | t][0], ac[(run << 4) | t][1])
        w.write(code, t)
        run = 0
        last_nz = k
    if last_nz < 63:
        w.write(ac[0x00][0], ac[0x00][1])  # EOB0
    w.flush()
    out += w.out

    # scan 3: AC refinement, Ah=1 Al=0 (independent spec-following coder)
    out += seg(0xDA, bytes([1, 1, 0x00]) + bytes([1, 63, 0x10]))
    w = J._BitWriter()
    pending: list[int] = []
    run = 0
    for k in range(1, 64):
        mag = abs(int(v[k]))
        if mag >> 1 != 0:  # history nonzero: correction bit
            pending.append(mag & 1)
        elif mag == 0:
            run += 1
        else:  # newly nonzero: emit (run, 1) + sign, then pending bits
            while run > 15:
                w.write(ac[0xF0][0], ac[0xF0][1])
                for b in pending:
                    w.write(b, 1)
                pending = []
                run -= 16
            w.write(ac[(run << 4) | 1][0], ac[(run << 4) | 1][1])
            w.write(1 if v[k] > 0 else 0, 1)
            for b in pending:
                w.write(b, 1)
            pending = []
            run = 0
    # tail: end the band with EOB1, then the still-pending corrections
    w.write(ac[0x00][0], ac[0x00][1])
    for b in pending:
        w.write(b, 1)
    w.flush()
    out += w.out
    out += b"\xff\xd9"

    # verify at the COEFFICIENT level (pixel output rounds to uint8,
    # which would blur the exact comparison): capture the store the
    # decoder hands to reconstruction
    captured = {}
    orig = J._reconstruct

    def capture(frame, coef, qt):
        captured.update({k: c.copy() for k, c in coef.items()})
        return orig(frame, coef, qt)

    J._reconstruct = capture
    try:
        J.decode_jpeg(bytes(out))
    finally:
        J._reconstruct = orig
    got = captured[1][0, 0]
    assert np.array_equal(got[1:], v[1:]), (got[:24], v[:24])
