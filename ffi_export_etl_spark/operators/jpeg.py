"""JPEG codec in pure numpy + stdlib — no PIL, no libjpeg.

Decoder: baseline (SOF0) AND progressive (SOF2) sequential DCT, 8-bit,
grayscale or YCbCr with any standard chroma subsampling (4:4:4, 4:2:2,
4:2:0), restart markers, Huffman entropy coding. Progressive streams
accumulate coefficients across the scan script — DC first/refinement,
AC spectral-selection bands with EOB runs, AC successive-approximation
refinement (the libjpeg jdphuff correction-bit algorithm) — and
reconstruct once at EOI. Arithmetic coding and lossless/hierarchical
frames raise — route those through the injectable kernel
(operators/multimodal.set_decoder).

Encoders: baseline grayscale/YCbCr (4:4:4 or 4:2:0, optional restart
intervals) with the ITU T.81 Annex K example quantization + Huffman
tables (scaled by a quality factor, the libjpeg convention), plus a
progressive encoder with a fixed DC-first/DC-refine/AC-band scan script
— so decode(encode(x)) reconstructs x within normal lossy error and
the progressive decode paths have self-contained roundtrips.

Performance shape: this is a correctness kernel for the Arrow batch
surface (operators/multimodal.py), not a SIMD codec. All block math
(DCT, quantization, color transform, upsampling) is vectorized numpy
over every block of a component at once; only the entropy coder walks
bit-by-bit, and it walks a numpy-preprocessed byte stream. At cluster
scale you'd swap the injectable kernel for a native library; the point
here is that the full pipeline executes and is testable with zero
external dependencies.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# zig-zag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])

# ITU T.81 Annex K.1 example quantization tables (luminance, chrominance)
K_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
K_CHROMA_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K.3 example Huffman specs: (bits[1..16], huffval)
K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


# ---------------------------------------------------------------------------
# Huffman table machinery
# ---------------------------------------------------------------------------


def build_huffman_codes(
    bits: list[int], huffval: list[int]
) -> dict[int, tuple[int, int]]:
    """JPEG canonical code assignment: {symbol: (code, length)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(
    bits: list[int], huffval: list[int]
) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} — the decoder's inverse view."""
    return {
        (length, code): sym
        for sym, (code, length) in build_huffman_codes(bits, huffval).items()
    }


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 byte stuffing removed up
    front (one numpy pass), restart markers surfaced to the caller."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else 0xD9
                )
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: stop fill
                    return
                else:  # EOI or next segment
                    return
                b = 0xFF
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0  # pad past the end (spec: fill with 1s/0s)
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Drop to a byte boundary and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# DCT (vectorized over all blocks of a component at once)
# ---------------------------------------------------------------------------

_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)  # _C[u, x]: orthonormal DCT-II basis


def idct2_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks -> (n, 8, 8) spatial samples."""
    return np.einsum("ux,nuv,vy->nxy", _C, coefs, _C, optimize=True)


def dct2_blocks(samples: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _C, samples, _C, optimize=True)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG -> (h, w) grayscale or (h, w, 3) RGB uint8.

    Baseline (SOF0) and progressive (SOF2) sequential DCT: progressive
    streams accumulate coefficients across their scan script — DC
    first/refinement, AC spectral-selection bands with EOB runs, AC
    successive-approximation refinement — and reconstruct once at EOI.
    Arithmetic coding and hierarchical/lossless frames raise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame: dict | None = None
    progressive = False
    restart_interval = 0
    coef: dict[int, np.ndarray] = {}  # cid -> (blocks_y, blocks_x, 64)
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, i)
        seg = data[i + 2 : i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq:
                    vals = np.frombuffer(seg, ">u2", 64, j).astype(np.int32)
                    j += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, j).astype(np.int32)
                    j += 64
                table = np.zeros((8, 8), dtype=np.int32)
                table[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = table
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                j += 17 + n
                table = _build_decode_map(bits, vals)
                (huff_ac if tc else huff_dc)[th] = table
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, sampling, tq = struct.unpack_from(">BBB", seg, 6 + c * 3)
                comps.append(
                    {"id": cid, "h": sampling >> 4, "v": sampling & 0x0F,
                     "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame = {
                "h": h, "w": w, "comps": comps,
                "hmax": hmax, "vmax": vmax,
                "mcus_x": -(-w // (8 * hmax)),
                "mcus_y": -(-h // (8 * vmax)),
            }
            for c in comps:
                by = frame["mcus_y"] * c["v"]
                bx = frame["mcus_x"] * c["h"]
                coef[c["id"]] = np.zeros((by, bx, 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = seg[1 + c * 2], seg[2 + c * 2]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan_comps.append(
                    {**comp, "dc": tables >> 4, "ac": tables & 0x0F}
                )
            ss, se, a = seg[1 + ns * 2 : 4 + ns * 2]
            ah, al = a >> 4, a & 0x0F
            reader = _BitReader(data[i:])
            _run_scan(
                reader, frame, scan_comps, coef, huff_dc, huff_ac,
                ss, se, ah, al, progressive, restart_interval,
            )
            i += reader.pos  # continue marker parse after entropy data
    if frame is None or not coef:
        raise ValueError("JPEG has no scan data")
    return _reconstruct(frame, coef, qt)


def _run_scan(
    reader: "_BitReader",
    frame: dict,
    scan_comps: list[dict],
    coef: dict[int, np.ndarray],
    huff_dc: dict,
    huff_ac: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    progressive: bool,
    restart_interval: int,
) -> None:
    """Decode one entropy-coded scan into the coefficient store.

    Interleaved scans (ns > 1, or any baseline scan) walk the MCU grid;
    progressive non-interleaved scans walk the single component's own
    ceil-sized block grid (T.81 A.2.2). State (DC predictors, EOB run)
    resets at restart markers."""
    pred = {c["id"]: 0 for c in scan_comps}
    eobrun = 0
    interleaved = len(scan_comps) > 1

    def units():
        if interleaved:
            for _my in range(frame["mcus_y"]):
                for _mx in range(frame["mcus_x"]):
                    yield [
                        (c, (_my * c["v"] + by), (_mx * c["h"] + bx))
                        for c in scan_comps
                        for by in range(c["v"])
                        for bx in range(c["h"])
                    ]
        else:
            c = scan_comps[0]
            bw = -(-(frame["w"] * c["h"]) // (8 * frame["hmax"]))
            bh = -(-(frame["h"] * c["v"]) // (8 * frame["vmax"]))
            for by in range(bh):
                for bx in range(bw):
                    yield [(c, by, bx)]

    count = 0
    for unit in units():
        if restart_interval and count and count % restart_interval == 0:
            reader.sync_restart()
            pred = {c["id"]: 0 for c in scan_comps}
            eobrun = 0
        for c, by, bx in unit:
            zz = coef[c["id"]][by, bx]
            if not progressive:
                _block_baseline(
                    reader, zz, c, pred, huff_dc[c["dc"]], huff_ac[c["ac"]]
                )
            elif ss == 0:
                if ah == 0:  # DC first
                    t = _decode_symbol(reader, huff_dc[c["dc"]])
                    diff = _extend(reader.read_bits(t), t)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]] << al
                else:  # DC refinement: one bit per block
                    if reader.read_bit():
                        zz[0] |= 1 << al
            else:
                eobrun = _block_ac_progressive(
                    reader, zz, ss, se, ah, al, eobrun, huff_ac[c["ac"]]
                )
        count += 1


def _block_baseline(
    reader: "_BitReader",
    zz: np.ndarray,
    c: dict,
    pred: dict,
    dc_tab: dict,
    ac_tab: dict,
) -> None:
    t = _decode_symbol(reader, dc_tab)
    diff = _extend(reader.read_bits(t), t)
    pred[c["id"]] += diff
    zz[0] = pred[c["id"]]
    k = 1
    while k < 64:
        rs = _decode_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overflow")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1


def _block_ac_progressive(
    reader: "_BitReader",
    zz: np.ndarray,
    ss: int,
    se: int,
    ah: int,
    al: int,
    eobrun: int,
    ac_tab: dict,
) -> int:
    """One block of an AC progressive scan; returns the new EOB run."""
    if ah == 0:  # first scan for this band
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _decode_symbol(reader, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn: run of end-of-bands
                    return ((1 << r) - 1) + reader.read_bits(r)
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC band overflow")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        return 0
    # refinement scan (T.81 G.1.2.3 / libjpeg jdphuff): correction bits.
    # ``eobrun`` carries the number of ADDITIONAL whole blocks whose
    # bands are already ended — those blocks still consume one
    # correction bit per nonzero-history coefficient.
    p1, m1 = 1 << al, -(1 << al)

    def correct(k: int) -> None:
        if reader.read_bit() and not (zz[k] & p1):
            zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if eobrun > 0:  # block inside a pending EOB run: sweep-only
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        return eobrun - 1
    band_ended = False
    while k <= se:
        rs = _decode_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        newval = 0
        if s == 0:
            if r < 15:  # EOBn ends THIS block's band too
                eobrun = ((1 << r) - 1) + reader.read_bits(r)
                band_ended = True
                break
            # r == 15 (ZRL): skip 16 zero-history positions
        else:
            if s != 1:
                raise ValueError("invalid refinement magnitude")
            newval = p1 if reader.read_bit() else m1
        while k <= se:
            if zz[k] != 0:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            zz[k] = newval
        k += 1
    if band_ended:  # current block's tail: refine remaining nonzeros
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
    return eobrun


def _reconstruct(
    frame: dict, coef: dict[int, np.ndarray], qt: dict[int, np.ndarray]
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = {}
    for c in comps:
        grid = coef[c["id"]]
        by, bx, _ = grid.shape
        zz = grid.reshape(-1, 64)
        coefs = np.zeros((len(zz), 8, 8), dtype=np.float64)
        coefs[:, _ZZ_ROWS, _ZZ_COLS] = zz
        coefs *= qt[c["tq"]][None, :, :]
        spatial = idct2_blocks(coefs) + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes[c["id"]] = plane[:h, :w]
    if len(comps) == 1:
        return np.clip(planes[comps[0]["id"]].round(), 0, 255).astype(
            np.uint8
        )
    y, cb, cr = (planes[c["id"]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.stack([r, g, b], axis=-1).round(), 0, 255
    ).astype(np.uint8)

# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _mag_bits(v: int) -> tuple[int, int]:
    """(category t, t-bit magnitude code) for a signed coefficient."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _scaled_q(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (1..100)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JPEG.

    ``subsampling``: '444' (one block per component per MCU) or '420'
    (2x2 luma blocks share one 2x2-averaged chroma block — the standard
    web-photo layout). ``restart_interval`` > 0 emits a DRI segment and
    an RSTn marker (with DC-predictor reset) every n MCUs — the error
    recovery structure parallel decoders rely on."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qy = _scaled_q(K_LUMA_Q, quality)
    qc = _scaled_q(K_CHROMA_Q, quality)
    arr_f = arr.astype(np.float64)
    if gray:
        planes = [arr_f]
        factors = [(1, 1)]
    else:
        r, g, b = arr_f[..., 0], arr_f[..., 1], arr_f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "444":
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            ph = h + (h & 1)
            pw = w + (w & 1)

            def down(p: np.ndarray) -> np.ndarray:
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return (
                    p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )

            planes = [y, down(cb), down(cr)]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    def plane_blocks(
        plane: np.ndarray, q: np.ndarray, fh: int, fv: int
    ) -> np.ndarray:
        """(block_rows, block_cols, 64) quantized zig-zag blocks, the
        plane padded (edge-replicated) to the MCU grid."""
        bh = mcus_y * fv * 8
        bw = mcus_x * fh * 8
        padded = np.pad(
            plane,
            ((0, bh - plane.shape[0]), (0, bw - plane.shape[1])),
            mode="edge",
        )
        tiles = (
            padded.reshape(bh // 8, 8, bw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coefs = dct2_blocks(tiles - 128.0)
        quant = np.round(coefs / q[None, :, :]).astype(np.int32)
        return quant[:, _ZZ_ROWS, _ZZ_COLS].reshape(bh // 8, bw // 8, 64)

    grids = [
        plane_blocks(p, qy if ci == 0 else qc, *factors[ci])
        for ci, p in enumerate(planes)
    ]

    dc_tabs = [build_huffman_codes(*K_DC_LUMA)] + [
        build_huffman_codes(*K_DC_CHROMA)
    ] * (len(planes) - 1)
    ac_tabs = [build_huffman_codes(*K_AC_LUMA)] + [
        build_huffman_codes(*K_AC_CHROMA)
    ] * (len(planes) - 1)

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    segment(
        0xDB, bytes([0]) + bytes(int(v) for v in qy[_ZZ_ROWS, _ZZ_COLS])
    )
    if not gray:
        segment(
            0xDB, bytes([1]) + bytes(int(v) for v in qc[_ZZ_ROWS, _ZZ_COLS])
        )
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    segment(0xC0, sof)
    segment(0xC4, bytes([0x00]) + bytes(K_DC_LUMA[0]) + bytes(K_DC_LUMA[1]))
    segment(0xC4, bytes([0x10]) + bytes(K_AC_LUMA[0]) + bytes(K_AC_LUMA[1]))
    if not gray:
        segment(
            0xC4, bytes([0x01]) + bytes(K_DC_CHROMA[0]) + bytes(K_DC_CHROMA[1])
        )
        segment(
            0xC4, bytes([0x11]) + bytes(K_AC_CHROMA[0]) + bytes(K_AC_CHROMA[1])
        )
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    segment(0xDA, sos)

    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.flush()
                out.extend(writer.out)
                writer = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                preds = [0] * len(planes)
            for ci in range(len(planes)):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        zz = grids[ci][my * fv + by, mx * fh + bx]
                        preds[ci] = _entropy_block(
                            writer, zz, preds[ci], dc_tabs[ci], ac_tabs[ci]
                        )
            mcu_count += 1
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def _entropy_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-code one zig-zag block; returns the new DC predictor."""
    diff = int(zz[0]) - pred
    t, code = _mag_bits(diff)
    writer.write(dc_codes[t][0], dc_codes[t][1])
    if t:
        writer.write(code, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            writer.write(ac_codes[0xF0][0], ac_codes[0xF0][1])
            run -= 16
        t, code = _mag_bits(v)
        writer.write(ac_codes[(run << 4) | t][0], ac_codes[(run << 4) | t][1])
        writer.write(code, t)
        run = 0
    if run:
        writer.write(ac_codes[0x00][0], ac_codes[0x00][1])  # EOB
    return int(zz[0])


# Progressive AC scans need EOBn symbols (0x10..0xE0) the Annex K
# tables do not define. This flat custom table assigns every AC symbol
# an 8-bit code (176 symbols < 256: canonical and prefix-free by
# construction) — poor compression, simple and valid; emitted via a
# per-scan DHT.
PROG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        {(run << 4) | size for run in range(16) for size in range(1, 11)}
        | {r << 4 for r in range(15)}  # EOBn (incl. EOB0)
        | {0xF0}  # ZRL
    ),
)


def _eobn_flush(writer: _BitWriter, ac_codes: dict, run: int) -> None:
    """Emit an EOBn code for a pending end-of-band run (1 <= run <=
    0x7FFF). The coded value COUNTS the block in which the decoder
    meets the EOBn (it ends that block's band): symbol r = high bit of
    run, then the r low bits — the decoder resumes skipping run-1
    further whole blocks."""
    r = run.bit_length() - 1
    writer.write(ac_codes[r << 4][0], ac_codes[r << 4][1])
    if r:
        writer.write(run - (1 << r), r)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85
) -> bytes:
    """Progressive (SOF2) encoder with a fixed 4-stage scan script:
    interleaved DC first at Al=1, DC refinement, then per-component AC
    bands 1-5 and 6-63 with accumulated EOB runs. Exists so the
    progressive DECODE paths (spectral selection, successive DC
    approximation, EOBn) have a real self-contained roundtrip; color is
    4:4:4."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qy = _scaled_q(K_LUMA_Q, quality)
    qc = _scaled_q(K_CHROMA_Q, quality)
    arr_f = arr.astype(np.float64)
    if gray:
        planes = [arr_f]
    else:
        r_, g_, b_ = arr_f[..., 0], arr_f[..., 1], arr_f[..., 2]
        planes = [
            0.299 * r_ + 0.587 * g_ + 0.114 * b_,
            -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0,
            0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0,
        ]

    def plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        bh = -(-h // 8) * 8
        bw = -(-w // 8) * 8
        padded = np.pad(
            plane, ((0, bh - h), (0, bw - w)), mode="edge"
        )
        tiles = (
            padded.reshape(bh // 8, 8, bw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coefs = dct2_blocks(tiles - 128.0)
        return np.round(coefs / q[None, :, :]).astype(np.int32)[
            :, _ZZ_ROWS, _ZZ_COLS
        ]

    grids = [
        plane_blocks(p, qy if ci == 0 else qc) for ci, p in enumerate(planes)
    ]
    dc_tabs = [build_huffman_codes(*K_DC_LUMA)] + [
        build_huffman_codes(*K_DC_CHROMA)
    ] * (len(planes) - 1)
    ac_tabs = [build_huffman_codes(*K_AC_LUMA)] + [
        build_huffman_codes(*K_AC_CHROMA)
    ] * (len(planes) - 1)

    out = bytearray(b"\xff\xd8")

    def segment(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    segment(0xDB, bytes([0]) + bytes(int(v) for v in qy[_ZZ_ROWS, _ZZ_COLS]))
    if not gray:
        segment(
            0xDB, bytes([1]) + bytes(int(v) for v in qc[_ZZ_ROWS, _ZZ_COLS])
        )
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    segment(0xC2, sof)  # SOF2: progressive
    segment(0xC4, bytes([0x00]) + bytes(K_DC_LUMA[0]) + bytes(K_DC_LUMA[1]))
    segment(0xC4, bytes([0x10]) + bytes(K_AC_LUMA[0]) + bytes(K_AC_LUMA[1]))
    if not gray:
        segment(
            0xC4, bytes([0x01]) + bytes(K_DC_CHROMA[0]) + bytes(K_DC_CHROMA[1])
        )
        segment(
            0xC4, bytes([0x11]) + bytes(K_AC_CHROMA[0]) + bytes(K_AC_CHROMA[1])
        )

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            dc_t = 0 if cid == 1 else 1
            ac_t = 0 if cid == 1 else 1
            sos += bytes([cid, (dc_t << 4) | ac_t])
        sos += bytes([ss, se, (ah << 4) | al])
        segment(0xDA, sos)

    # scan 1: interleaved DC first, Al=1
    all_ids = list(range(1, len(planes) + 1))
    sos_header(all_ids, 0, 0, 0, 1)
    writer = _BitWriter()
    preds = [0] * len(planes)
    n_blocks = grids[0].shape[0]
    for bi in range(n_blocks):  # 4:4:4 -> same grid for all comps
        for ci in range(len(planes)):
            dcv = int(grids[ci][bi, 0]) >> 1
            diff = dcv - preds[ci]
            preds[ci] = dcv
            t, code = _mag_bits(diff)
            writer.write(dc_tabs[ci][t][0], dc_tabs[ci][t][1])
            if t:
                writer.write(code, t)
    writer.flush()
    out.extend(writer.out)

    # scan 2: DC refinement (Ah=1, Al=0): the dropped low bit
    sos_header(all_ids, 0, 0, 1, 0)
    writer = _BitWriter()
    for bi in range(n_blocks):
        for ci in range(len(planes)):
            writer.write(int(grids[ci][bi, 0]) & 1, 1)
    writer.flush()
    out.extend(writer.out)

    # scans 3+: per-component AC bands with EOB-run accumulation,
    # using the flat custom AC table (EOBn symbols) in slot (1, ci&1)
    prog_ac = build_huffman_codes(*PROG_AC_SPEC)
    for ci in range(len(planes)):
        slot = 0 if ci == 0 else 1
        segment(
            0xC4,
            bytes([(1 << 4) | slot])
            + bytes(PROG_AC_SPEC[0])
            + bytes(PROG_AC_SPEC[1]),
        )
        for ss, se in ((1, 5), (6, 63)):
            sos_header([ci + 1], ss, se, 0, 0)
            writer = _BitWriter()
            ac = prog_ac
            eobrun = 0
            for bi in range(n_blocks):
                band = grids[ci][bi, ss : se + 1]
                nz = np.nonzero(band)[0]
                if len(nz) == 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:  # spec max
                        _eobn_flush(writer, ac, eobrun)
                        eobrun = 0
                    continue
                if eobrun:
                    _eobn_flush(writer, ac, eobrun)
                    eobrun = 0
                run = 0
                last = int(nz[-1])
                for k in range(len(band)):
                    v = int(band[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        writer.write(ac[0xF0][0], ac[0xF0][1])
                        run -= 16
                    t, code = _mag_bits(v)
                    writer.write(ac[(run << 4) | t][0], ac[(run << 4) | t][1])
                    writer.write(code, t)
                    run = 0
                if last < len(band) - 1:
                    eobrun += 1  # trailing zeros end this band early
                    if eobrun == 0x7FFF:
                        _eobn_flush(writer, ac, eobrun)
                        eobrun = 0
            if eobrun:
                _eobn_flush(writer, ac, eobrun)
            writer.flush()
            out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
