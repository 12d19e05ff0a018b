"""Minimal PNG codec (stdlib zlib only) for series ingest (S13) and the
multimodal documents pipeline.

Supports grayscale (color type 0) and RGB (color type 2) at bit depths
8 and 16 — enough to read/write the series fixtures the test suite
generates. Decode implements all five PNG scanline filters per the
public PNG spec so externally-written baseline PNGs also decode. The
imageio path the reference uses (cli_input_to_ngff_image.py:74-95)
slots in behind the same functions when the library is present.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8/uint16 array."""
    if arr.ndim == 2:
        color_type, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported PNG array shape {arr.shape}")
    if arr.dtype == np.uint8:
        depth = 8
    elif arr.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"unsupported PNG dtype {arr.dtype}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    big = arr.astype(arr.dtype.newbyteorder(">"))
    rows = big.reshape(h, -1).view(np.uint8).reshape(h, w * channels * (depth // 8))
    raw = b"".join(b"\x00" + rows[i].tobytes() for i in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for row in range(h):
        ftype = int(raw[pos])
        line = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[row - 1].astype(np.int32) if row > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) // 2
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"unknown PNG filter {ftype}")
                cur[i] = (line[i] + pred) & 0xFF
        out[row] = cur.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise ValueError("not a PNG file")
    pos = 8
    idat = b""
    ihdr = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3}.get(color_type)
    if channels is None or depth not in (8, 16):
        raise ValueError(f"unsupported PNG color type {color_type}/depth {depth}")
    stride = w * channels * (depth // 8)
    bpp = max(1, channels * (depth // 8))
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    # exact structural check BEFORE the h-sized unfilter allocation
    # (r18 fuzz finding: a bit-flipped IHDR dimension drove a
    # multi-gigabyte MemoryError instead of a parse error): every PNG
    # row is exactly 1 filter byte + stride pixel bytes
    if raw.size != h * (stride + 1):
        raise ValueError(
            f"PNG pixel data length {raw.size} != {h * (stride + 1)} "
            f"expected for {w}x{h}/{channels}ch/{depth}-bit"
        )
    rows = _unfilter(raw, h, stride, bpp)
    if depth == 16:
        arr = rows.reshape(h, w, channels, 2)
        arr = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
    else:
        arr = rows.reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr
