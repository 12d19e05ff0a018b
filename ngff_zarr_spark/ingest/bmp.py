"""Minimal BMP codec (stdlib struct only) for CLI ingest breadth (S11).

The reference routes ``.bmp`` through itk-wasm/itk
(detect_cli_io_backend.py extension tables); in a bare environment this
decodes the uncompressed Windows formats natively: BITMAPINFOHEADER
(and the larger V4/V5 headers, which extend it compatibly), 8-bit
paletted and 24/32-bit BGR(A), bottom-up or top-down row order, rows
padded to 4 bytes, BI_RGB (no compression) only. An 8-bit image whose
palette is the identity gray ramp decodes to (h, w) grayscale;
everything else decodes to (h, w, 3) RGB.
"""

from __future__ import annotations

import struct

import numpy as np


def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode (h, w) uint8 grayscale (8-bit + gray palette) or
    (h, w, 3) uint8 RGB (24-bit) as a bottom-up BI_RGB BMP."""
    if arr.dtype != np.uint8:
        raise ValueError(f"bmp_encode needs uint8, got {arr.dtype}")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported BMP array shape {arr.shape}")
    h, w = arr.shape[:2]
    bpp = 8 if gray else 24
    row_bytes = (w * (bpp // 8) + 3) & ~3
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256)) if gray else b""
    offset = 14 + 40 + len(palette)
    size = offset + row_bytes * h
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, row_bytes * h, 2835, 2835,
                       256 if gray else 0, 0)
    out += palette
    pad = b"\x00" * (row_bytes - w * (bpp // 8))
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y] if gray else arr[y, :, ::-1]  # RGB -> BGR
        out += row.tobytes() + pad
    return bytes(out)


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode an uncompressed BMP to (h, w) uint8 gray or (h, w, 3)
    uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} (OS/2 core?)")
    w, h_signed, _planes, bpp, compression = struct.unpack_from("<iiHHI", data, 18)
    if compression not in (0, 3):  # BI_RGB; BI_BITFIELDS tolerated for 32-bit
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    n_colors = struct.unpack_from("<I", data, 46)[0]
    if bpp == 8:
        if n_colors == 0:
            n_colors = 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, dtype=np.uint8, count=n_colors * 4, offset=pal_off)
        pal = pal.reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX -> RGB
    row_bytes = (w * (bpp // 8) + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=offset)
    rows = raw.reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :w]
        gray_pal = np.arange(pal.shape[0], dtype=np.uint8)
        if (pal[:, 0] == gray_pal).all() and (pal == pal[:, :1]).all():
            return np.ascontiguousarray(idx)
        return np.ascontiguousarray(pal[idx])
    nch = bpp // 8
    px = rows[:, : w * nch].reshape(h, w, nch)
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) -> RGB
