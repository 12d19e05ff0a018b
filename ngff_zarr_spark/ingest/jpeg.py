"""Minimal baseline JPEG codec (stdlib + numpy only) for CLI ingest
breadth (S11): the reference converts ``.jpg``/``.jpeg`` through
itk-wasm/imageio (cli_input_to_ngff_image.py:49-73); in a bare
environment this module decodes baseline JPEGs natively, following the
same pattern as the PNG/TIFF codecs in this package.

Scope (public ITU-T T.81 spec):

- decode: baseline DCT (SOF0/1) AND progressive DCT (SOF2, r8 —
  spectral selection + successive approximation per Annex G), Huffman
  entropy coding, 8-bit samples, 1 component (grayscale) or 3
  components (JFIF YCbCr) with sampling factors 1-2 per axis (covers
  4:4:4, 4:2:2, 4:2:0), restart markers, multiple DQT/DHT segments,
  APPn/COM skip.
- encode: same subset (graysale or RGB 4:4:4 / 4:2:0) with the Annex K
  example quantization + Huffman tables — enough to generate test
  fixtures and to round-trip the ingest path without a library;
  ``jpeg_encode_progressive`` emits a libjpeg-style multi-scan SOF2
  stream carrying the identical quantized coefficients, which is how
  the progressive decoder is pinned bit-exact against the baseline
  path.

Determinism contract (both directions, so tests and the driver gate are
bit-stable across platforms):

- forward DCT via a precomputed float64 cosine matrix; quantization
  rounds HALF AWAY FROM ZERO (``trunc(x/q ± 0.5)``);
- inverse DCT likewise matrix-form float64; final samples use
  ``floor(x + 0.5)`` (half-up) then clip to [0, 255];
- color conversions use the JFIF formulas with ``floor(x + 0.5)``.

A per-8×8-block-constant grayscale image encoded with a quantization
table whose DC step divides 8 round-trips EXACTLY (all AC coefficients
quantize to zero, and the DC path is integer all the way) — that is the
property the driver gate uses to get a hash-exact oracle for a lossy
codec. General images round-trip within quantization error only, which
pytest checks with tolerance bounds.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zz[i] = (row, col) of the i-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# Annex K.1 example quantization tables (luminance, chrominance)
STD_LUMA_QUANT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
STD_CHROMA_QUANT = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

# Annex K.3 example Huffman tables: (BITS counts per code length 1-16,
# HUFFVAL symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
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
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
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

# 8x8 DCT-II basis matrix: M[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_N = 8
_DCT_M = np.zeros((_N, _N), dtype=np.float64)
for _u in range(_N):
    _c = np.sqrt(1.0 / _N) if _u == 0 else np.sqrt(2.0 / _N)
    for _x in range(_N):
        _DCT_M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / (2 * _N))


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coef @ _DCT_M


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.trunc(x + np.copysign(0.5, x)).astype(np.int64)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5).astype(np.int64)


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical Huffman per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical-Huffman decode table: (length, code) -> symbol."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 byte unstuffing;
    stops at any marker (0xFF followed by non-zero)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    # marker reached: missing bits read as zero padding
                    self.pos -= 1
                    self.bitbuf = 0
                    self.nbits = 8
                    b = 0
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Discard bits, skip to the next marker, return its second byte."""
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("expected marker in JPEG stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category, magnitude bits) for encoding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self):
        while self.nacc:
            self.write(1, 1)  # pad with 1s per spec


def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    return _round_half_away(coef / q)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder


def jpeg_encode(
    arr: np.ndarray,
    luma_quant: np.ndarray | None = None,
    chroma_quant: np.ndarray | None = None,
    subsample: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG with the Annex K tables (or caller-provided
    quantization tables). ``subsample=True`` uses 4:2:0 chroma;
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (resynchronization points, T.81 §B.2.4.4)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"jpeg_encode needs uint8, got {arr.dtype}")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported JPEG array shape {arr.shape}")
    h, w = arr.shape[:2]
    lq = STD_LUMA_QUANT if luma_quant is None else np.asarray(luma_quant, dtype=np.int64)
    cq = (
        STD_CHROMA_QUANT if chroma_quant is None else np.asarray(chroma_quant, dtype=np.int64)
    )

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def _dqt(tid: int, table: np.ndarray) -> bytes:
        zz = bytes(int(table[_ZZ_ROWS[i], _ZZ_COLS[i]]) for i in range(64))
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz

    out += _dqt(0, lq)
    if not gray:
        out += _dqt(1, cq)

    hs = 2 if (not gray and subsample) else 1
    comps = (
        [(1, 1, 1, 0)]
        if gray
        else [(1, hs, hs, 0), (2, 1, 1, 1), (3, 1, 1, 1)]  # (id, h, v, qtab)
    )
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, qt in comps:
        sof += bytes([cid, (ch << 4) | cv, qt])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def _dht(cls: int, tid: int, spec) -> bytes:
        bits, values = spec
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += _dht(0, 0, _DC_LUMA) + _dht(1, 0, _AC_LUMA)
    if not gray:
        out += _dht(0, 1, _DC_CHROMA) + _dht(1, 1, _AC_CHROMA)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        tid = 0 if cid == 1 else 1
        sos += bytes([cid, (tid << 4) | tid])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # component planes at their subsampled resolution
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., 0].astype(np.float64)]
        for ci in (1, 2):
            p = ycc[..., ci].astype(np.float64)
            if hs == 2:
                # pad to even, then 2x2 mean with half-up rounding
                pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                p = _round_half_up(
                    (pe[0::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0
                ).astype(np.float64)
            planes.append(p)

    mcu_h, mcu_w = 8 * (comps[0][2]), 8 * (comps[0][1])
    mcus_y = (h + mcu_h - 1) // mcu_h
    mcus_x = (w + mcu_w - 1) // mcu_w

    # Edge-pad every plane to its MCU-aligned extent up front. With 2x1
    # subsampling the last MCU row/column of the LUMA plane can contain a
    # block that starts at or past the image edge (h or w mod 16 in 1..8),
    # and a per-block pad cannot extend a zero-size slice.
    for ci, (_cid, ch, cv, _qt) in enumerate(comps):
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        p = planes[ci]
        if p.shape != (ph, pw):
            planes[ci] = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
            )

    dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
    ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]
    writer = _BitWriter()
    pred = [0] * len(comps)

    def _encode_block(plane: np.ndarray, by: int, bx: int, q: np.ndarray, tid: int, ci: int):
        y0, x0 = by * 8, bx * 8
        # planes are MCU-aligned above, so the slice is always full 8x8
        block = plane[y0: y0 + 8, x0: x0 + 8]
        coef = _quantize(_fdct(block - 128.0), q)
        zz = coef[_ZZ_ROWS, _ZZ_COLS]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t, bits = _magnitude(diff)
        code, length = dc_codes[tid][t]
        writer.write(code, length)
        if t:
            writer.write(bits, t)
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        for i in range(1, last + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[tid][0xF0]
                writer.write(code, length)
                run -= 16
            t, bits = _magnitude(v)
            code, length = ac_codes[tid][(run << 4) | t]
            writer.write(code, length)
            writer.write(bits, t)
            run = 0
        if last < 63:
            code, length = ac_codes[tid][0x00]
            writer.write(code, length)

    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8])
                writer = _BitWriter()
                pred = [0] * len(comps)
            for ci, (cid, ch, cv, qt) in enumerate(comps):
                q = lq if qt == 0 else cq
                tid = 0 if cid == 1 else 1
                for v_ in range(cv):
                    for h_ in range(ch):
                        _encode_block(planes[ci], my * cv + v_, mx * ch + h_, q, tid, ci)
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to (h, w)
    uint8 grayscale or (h, w, 3) uint8 RGB. Raises ValueError for
    lossless/arithmetic/hierarchical/12-bit streams (outside the DCT
    subset)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, ch, cv, qtab)])

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos: pos + 2])[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                prec = seg[p] >> 4
                tid = seg[p] & 0x0F
                p += 1
                n = 64 * (2 if prec else 1)
                vals = (
                    np.frombuffer(seg[p: p + n], dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(seg[p: p + 64], dtype=np.uint8).astype(np.int64)
                )
                q = np.zeros((8, 8), dtype=np.int64)
                q[_ZZ_ROWS, _ZZ_COLS] = vals
                quant[tid] = q
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls = seg[p] >> 4
                tid = seg[p] & 0x0F
                p += 1
                bits = list(seg[p: p + 16])
                p += 16
                nv = sum(bits)
                values = list(seg[p: p + nv])
                p += nv
                (huff_ac if cls else huff_dc)[tid] = _HuffDecoder(bits, values)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError(f"unsupported JPEG sample precision {precision}")
            comps = []
            for i in range(nc):
                cid, hv, qt = seg[6 + 3 * i: 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, qt))
            frame = (fh, fw, comps)
        elif marker == 0xC2:  # SOF2: progressive DCT — dedicated parser
            return _decode_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/1) and progressive (SOF2) JPEG are supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                tabs = seg[2 + 2 * i]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, quant, huff_dc, huff_ac, restart_interval
            )
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac, restart_interval):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    mcus_y = (fh + mcu_h - 1) // mcu_h
    mcus_x = (fw + mcu_w - 1) // mcu_w

    by_id = {cid: (ch, cv, qt) for cid, ch, cv, qt in comps}
    planes = {}
    for cid, ch, cv, qt in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)

    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RST marker, got {m:#x}")
                for cid in pred:
                    pred[cid] = 0
            for cid, dc_t, ac_t in scan:
                ch, cv, qt = by_id[cid]
                q = quant[qt]
                for v_ in range(cv):
                    for h_ in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        t = huff_dc[dc_t].decode(reader)
                        diff = _extend(reader.receive(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = huff_ac[ac_t].decode(reader)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coef = np.zeros((8, 8), dtype=np.float64)
                        coef[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
                        block = _idct(coef) + 128.0
                        y0 = (my * cv + v_) * 8
                        x0 = (mx * ch + h_) * 8
                        planes[cid][y0: y0 + 8, x0: x0 + 8] = block
            mcu_count += 1

    return _planes_to_image(comps, planes, fh, fw, hmax, vmax)


def _planes_to_image(comps, planes, fh, fw, hmax, vmax) -> np.ndarray:
    """Shared decoder tail: crop/upsample component planes to frame
    resolution, round, and color-convert."""
    out_planes = []
    for cid, ch, cv, qt in comps:
        p = planes[cid]
        # upsample to full frame resolution by pixel replication
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:fh, :fw])
    samples = np.clip(
        _round_half_up(np.stack(out_planes, axis=-1)), 0, 255
    ).astype(np.uint8)
    if len(comps) == 1:
        return samples[..., 0]
    if len(comps) == 3:
        return _ycbcr_to_rgb(samples)
    raise ValueError(f"unsupported JPEG component count {len(comps)}")


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2) — T.81 Annex G.1/G.2: spectral selection +
# successive approximation. The decoder accumulates quantized
# coefficients across scans (DC first/refine interleaved; AC scans are
# per-component, EOB-run coded) and runs dequant+IDCT once at EOI. The
# encoder exists so tests can roundtrip the SAME quantized coefficients
# through a multi-scan stream and pin progressive-decode ==
# baseline-decode bit-for-bit. Reference parity: the reference converts
# progressive files via imageio/itk (cli_input_to_ngff_image.py:63-73);
# this is the bare-environment native path.

# flat canonical tables covering every progressive symbol: DC sizes
# 0..11 at 4 bits (all-ones code unused), AC (run, size) for size 0..10
# incl. EOBn (size 0, run<15) and ZRL at 8 bits (176 of 256 codes)
_DC_PROG = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


def _noninterleaved_dims(fh, fw, ch, cv, hmax, vmax):
    """Block grid of a SINGLE-component (non-interleaved) scan: the
    component's own sample extent, NOT the MCU-padded grid (G.1 — the
    padded dummy blocks exist only in interleaved scans)."""
    cw = -(-fw * ch // hmax)
    chh = -(-fh * cv // vmax)
    return -(-chh // 8), -(-cw // 8)


def _scan_order(scan_cids, by_id, mcus_y, mcus_x, fh, fw, hmax, vmax):
    """Yield (cid, by, bx) in T.81 data-unit order: component raster
    for a 1-component scan, MCU-interleaved otherwise."""
    if len(scan_cids) == 1:
        cid = scan_cids[0]
        ch, cv = by_id[cid][0], by_id[cid][1]
        bh, bw = _noninterleaved_dims(fh, fw, ch, cv, hmax, vmax)
        for by in range(bh):
            for bx in range(bw):
                yield cid, by, bx
    else:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid in scan_cids:
                    ch, cv = by_id[cid][0], by_id[cid][1]
                    for v_ in range(cv):
                        for h_ in range(ch):
                            yield cid, my * cv + v_, mx * ch + h_


def jpeg_encode_progressive(
    arr: np.ndarray,
    luma_quant: np.ndarray | None = None,
    chroma_quant: np.ndarray | None = None,
    subsample: bool = True,
) -> bytes:
    """Encode as a progressive (SOF2) JPEG with a libjpeg-style scan
    script exercising both spectral selection and successive
    approximation: DC at Al=1 then refined; AC bands 1-5 and 6-63 at
    Al=2, refined to 1, then 0. The quantized coefficients are
    IDENTICAL to :func:`jpeg_encode`'s, so decoding both streams yields
    bit-identical pixels."""
    if arr.dtype != np.uint8:
        raise ValueError(f"jpeg_encode_progressive needs uint8, got {arr.dtype}")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported JPEG array shape {arr.shape}")
    h, w = arr.shape[:2]
    lq = STD_LUMA_QUANT if luma_quant is None else np.asarray(luma_quant, dtype=np.int64)
    cq = (
        STD_CHROMA_QUANT if chroma_quant is None else np.asarray(chroma_quant, dtype=np.int64)
    )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def _dqt(tid, table):
        zz = bytes(int(table[_ZZ_ROWS[i], _ZZ_COLS[i]]) for i in range(64))
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz

    out += _dqt(0, lq)
    if not gray:
        out += _dqt(1, cq)

    hs = 2 if (not gray and subsample) else 1
    comps = (
        [(1, 1, 1, 0)]
        if gray
        else [(1, hs, hs, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    )
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, qt in comps:
        sof += bytes([cid, (ch << 4) | cv, qt])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def _dht(cls, tid, spec):
        bits, values = spec
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += _dht(0, 0, _DC_PROG) + _dht(1, 0, _AC_PROG)

    # component planes + MCU alignment: identical to jpeg_encode
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., 0].astype(np.float64)]
        for ci in (1, 2):
            p = ycc[..., ci].astype(np.float64)
            if hs == 2:
                pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                p = _round_half_up(
                    (pe[0::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0
                ).astype(np.float64)
            planes.append(p)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    for ci, (_cid, ch, cv, _qt) in enumerate(comps):
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        p = planes[ci]
        if p.shape != (ph, pw):
            planes[ci] = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
            )

    by_id = {cid: (ch, cv, qt) for cid, ch, cv, qt in comps}
    coefs: dict[int, np.ndarray] = {}
    for ci, (cid, ch, cv, qt) in enumerate(comps):
        q = lq if qt == 0 else cq
        nby, nbx = mcus_y * cv, mcus_x * ch
        c = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                blk = planes[ci][by * 8: by * 8 + 8, bx * 8: bx * 8 + 8]
                cf = _quantize(_fdct(blk - 128.0), q)
                c[by, bx] = cf[_ZZ_ROWS, _ZZ_COLS]
        coefs[cid] = c

    dc_codes = _build_codes(*_DC_PROG)
    ac_codes = _build_codes(*_AC_PROG)
    all_cids = [c[0] for c in comps]

    def _sos(scan_cids, ss, se, ah, al):
        hdr = bytes([len(scan_cids)])
        for cid in scan_cids:
            hdr += bytes([cid, 0x00])  # DC table 0 / AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr

    def emit_dc_first(scan_cids, al):
        nonlocal out
        out += _sos(scan_cids, 0, 0, 0, al)
        wtr = _BitWriter()
        pred = {cid: 0 for cid in scan_cids}
        for cid, by, bx in _scan_order(scan_cids, by_id, mcus_y, mcus_x, h, w, hmax, vmax):
            val = int(coefs[cid][by, bx, 0]) >> al
            diff = val - pred[cid]
            pred[cid] = val
            t, bits = _magnitude(diff)
            code, length = dc_codes[t]
            wtr.write(code, length)
            if t:
                wtr.write(bits, t)
        wtr.flush()
        out += wtr.out

    def emit_dc_refine(scan_cids, al):
        nonlocal out
        out += _sos(scan_cids, 0, 0, al + 1, al)
        wtr = _BitWriter()
        for cid, by, bx in _scan_order(scan_cids, by_id, mcus_y, mcus_x, h, w, hmax, vmax):
            wtr.write((int(coefs[cid][by, bx, 0]) >> al) & 1, 1)
        wtr.flush()
        out += wtr.out

    def emit_ac_first(cid, ss, se, al):
        nonlocal out
        out += _sos([cid], ss, se, 0, al)
        wtr = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                code, length = ac_codes[nbits << 4]
                wtr.write(code, length)
                if nbits:
                    wtr.write(eobrun - (1 << nbits), nbits)
                eobrun = 0

        for _cid, by, bx in _scan_order([cid], by_id, mcus_y, mcus_x, h, w, hmax, vmax):
            band = coefs[cid][by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(band[k])
                av = abs(v) >> al
                if av == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    code, length = ac_codes[0xF0]
                    wtr.write(code, length)
                    r -= 16
                t, bits = _magnitude(av if v >= 0 else -av)
                code, length = ac_codes[(r << 4) | t]
                wtr.write(code, length)
                wtr.write(bits, t)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        wtr.flush()
        out += wtr.out

    def emit_ac_refine(cid, ss, se, al):
        nonlocal out
        out += _sos([cid], ss, se, al + 1, al)
        wtr = _BitWriter()
        eobrun = 0
        buffered: list[int] = []  # correction bits pending the next symbol

        def flush_eob():
            nonlocal eobrun, buffered
            if eobrun:
                nbits = eobrun.bit_length() - 1
                code, length = ac_codes[nbits << 4]
                wtr.write(code, length)
                if nbits:
                    wtr.write(eobrun - (1 << nbits), nbits)
                eobrun = 0
            for b in buffered:
                wtr.write(b, 1)
            buffered = []

        for _cid, by, bx in _scan_order([cid], by_id, mcus_y, mcus_x, h, w, hmax, vmax):
            band = coefs[cid][by, bx]
            absv = [abs(int(band[k])) >> al for k in range(ss, se + 1)]
            eob = -1  # index (into band coords) of last NEWLY nonzero coef
            for i, t in enumerate(absv):
                if t == 1:
                    eob = ss + i
            r = 0
            block_bits: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    flush_eob()
                    code, length = ac_codes[0xF0]
                    wtr.write(code, length)
                    r -= 16
                    for b in block_bits:
                        wtr.write(b, 1)
                    block_bits = []
                if t > 1:
                    block_bits.append(t & 1)
                    continue
                flush_eob()
                code, length = ac_codes[(r << 4) | 1]
                wtr.write(code, length)
                wtr.write(1 if int(band[k]) >= 0 else 0, 1)
                for b in block_bits:
                    wtr.write(b, 1)
                block_bits = []
                r = 0
            if r > 0 or block_bits:
                eobrun += 1
                buffered.extend(block_bits)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        wtr.flush()
        out += wtr.out

    # libjpeg-style script: DC at Al=1, AC bands at Al=2, then refine
    emit_dc_first(all_cids, 1)
    for cid in all_cids:
        emit_ac_first(cid, 1, 5, 2)
        emit_ac_first(cid, 6, 63, 2)
    emit_dc_refine(all_cids, 0)
    for cid in all_cids:
        emit_ac_refine(cid, 1, 5, 1)
        emit_ac_refine(cid, 6, 63, 1)
    for cid in all_cids:
        emit_ac_refine(cid, 1, 5, 0)
        emit_ac_refine(cid, 6, 63, 0)

    out += b"\xff\xd9"
    return bytes(out)


def _decode_progressive(data: bytes) -> np.ndarray:
    """Full progressive parse: walk every marker, decode each SOS into
    the per-component coefficient store, dequant+IDCT at EOI."""
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    coefs: dict[int, np.ndarray] = {}
    dc_pred_bits: dict[int, int] = {}

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos: pos + 2])[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                prec = seg[p] >> 4
                tid = seg[p] & 0x0F
                p += 1
                n = 64 * (2 if prec else 1)
                vals = (
                    np.frombuffer(seg[p: p + n], dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(seg[p: p + 64], dtype=np.uint8).astype(np.int64)
                )
                q = np.zeros((8, 8), dtype=np.int64)
                q[_ZZ_ROWS, _ZZ_COLS] = vals
                quant[tid] = q
                p += n
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls = seg[p] >> 4
                tid = seg[p] & 0x0F
                p += 1
                bits = list(seg[p: p + 16])
                p += 16
                nv = sum(bits)
                values = list(seg[p: p + nv])
                p += nv
                (huff_ac if cls else huff_dc)[tid] = _HuffDecoder(bits, values)
        elif marker == 0xC2:
            precision, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError(f"unsupported JPEG sample precision {precision}")
            comps = []
            for i in range(nc):
                cid, hv, qt = seg[6 + 3 * i: 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, qt))
            frame = (fh, fw, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
            mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
            for cid, ch, cv, qt in comps:
                coefs[cid] = np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported SOF in progressive stream")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                tabs = seg[2 + 2 * i]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos += seglen
            pos = _decode_prog_scan(
                data, pos, frame, scan, ss, se, ah, al,
                coefs, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += seglen

    if frame is None:
        raise ValueError("progressive stream has no SOF2 frame")
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, ch, cv, qt in comps:
        q = quant[qt]
        cgrid = coefs[cid]
        nby, nbx = cgrid.shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                coef = np.zeros((8, 8), dtype=np.float64)
                coef[_ZZ_ROWS, _ZZ_COLS] = cgrid[by, bx] * q[_ZZ_ROWS, _ZZ_COLS]
                plane[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8] = _idct(coef) + 128.0
        planes[cid] = plane
    return _planes_to_image(comps, planes, fh, fw, hmax, vmax)


def _decode_prog_scan(
    data, pos, frame, scan, ss, se, ah, al, coefs, huff_dc, huff_ac, restart_interval
):
    """One progressive SOS: DC first/refine (interleaved allowed) or AC
    first/refine (single component, EOB-run coded, G.1.2.2-3 /
    G.2). Mutates ``coefs``; returns the offset of the next marker."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    by_id = {cid: (ch, cv, qt) for cid, ch, cv, qt in comps}
    scan_cids = [c[0] for c in scan]
    tabs = {cid: (dc_t, ac_t) for cid, dc_t, ac_t in scan}
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive scan mixes DC and AC bands (Ss=0, Se!=0)")
    if not is_dc and len(scan) != 1:
        raise ValueError("progressive AC scan must have exactly one component")

    reader = _BitReader(data, pos)
    order = list(_scan_order(scan_cids, by_id, mcus_y, mcus_x, fh, fw, hmax, vmax))
    # restart intervals count MCUs; for a non-interleaved scan the MCU
    # is one block, and _scan_order yields exactly one tuple per MCU in
    # the interleaved case only when grouped — recover MCU boundaries
    # by counting blocks per MCU
    blocks_per_mcu = 1
    if len(scan_cids) > 1:
        blocks_per_mcu = sum(
            by_id[cid][0] * by_id[cid][1] for cid in scan_cids
        )

    pred = {cid: 0 for cid in scan_cids}
    eobrun = 0
    p1 = 1 << al

    def maybe_restart(block_i):
        nonlocal eobrun
        if not restart_interval:
            return
        mcu_i = block_i // blocks_per_mcu
        if block_i % blocks_per_mcu == 0 and mcu_i and mcu_i % restart_interval == 0:
            m = reader.align_to_marker()
            if not (0xD0 <= m <= 0xD7):
                raise ValueError(f"expected RST marker, got {m:#x}")
            for cid in pred:
                pred[cid] = 0
            eobrun = 0

    if is_dc and ah == 0:
        for i, (cid, by, bx) in enumerate(order):
            maybe_restart(i)
            t = huff_dc[tabs[cid][0]].decode(reader)
            diff = _extend(reader.receive(t), t)
            pred[cid] += diff
            coefs[cid][by, bx, 0] = pred[cid] << al
    elif is_dc:
        for i, (cid, by, bx) in enumerate(order):
            maybe_restart(i)
            if reader.read_bit():
                coefs[cid][by, bx, 0] |= p1
    elif ah == 0:
        cid = scan_cids[0]
        ac = huff_ac[tabs[cid][1]]
        for i, (_cid, by, bx) in enumerate(order):
            maybe_restart(i)
            band = coefs[cid][by, bx]
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = ac.decode(reader)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += 16
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run overflows band")
                band[k] = _extend(reader.receive(s), s) << al
                k += 1
    else:
        cid = scan_cids[0]
        ac = huff_ac[tabs[cid][1]]
        m1 = -p1
        for i, (_cid, by, bx) in enumerate(order):
            maybe_restart(i)
            band = coefs[cid][by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = ac.decode(reader)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        # r == 15 (ZRL): skip 16 zero-history coefs
                    else:
                        if s != 1:
                            raise ValueError("AC refinement size must be 1")
                        newval = p1 if reader.read_bit() else m1
                    while k <= se:
                        c = int(band[k])
                        if c != 0:
                            if reader.read_bit():
                                if (c & p1) == 0:
                                    band[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                if newval:
                                    band[k] = newval
                                break
                            r -= 1
                        k += 1
                    k += 1
            if eobrun > 0:
                while k <= se:
                    c = int(band[k])
                    if c != 0:
                        if reader.read_bit():
                            if (c & p1) == 0:
                                band[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1

    # advance to the next marker after the entropy segment
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,):
            return p
        p += 1
    return len(data)
