"""Minimal baseline-TIFF codec (S11's tifffile backend stand-in).

Reads/writes single-image baseline TIFF: II/MM byte order, IFD tag
walk, uncompressed strips, grayscale 8/16-bit or RGB 8-bit — the
standard microscopy export shape. tifffile (when installed) replaces
this behind cli_input_to_ngff_image; the binary layout implemented here
is the public TIFF 6.0 spec.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0)
WIDTH, LENGTH, BITS, COMPRESSION, PHOTOMETRIC = 256, 257, 258, 259, 262
STRIP_OFFSETS, SAMPLES_PER_PIXEL, ROWS_PER_STRIP, STRIP_BYTE_COUNTS = 273, 277, 278, 279

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def tiff_encode(arr: np.ndarray) -> bytes:
    """Encode (h, w) uint8/uint16 grayscale or (h, w, 3) uint8 RGB as a
    single-strip little-endian baseline TIFF."""
    if arr.ndim == 2:
        spp = 1
    elif arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
        spp = 3
    else:
        raise ValueError(f"unsupported TIFF array {arr.shape}/{arr.dtype}")
    if arr.dtype not in (np.dtype("uint8"), np.dtype("uint16")):
        raise ValueError(f"unsupported TIFF dtype {arr.dtype}")
    h, w = arr.shape[:2]
    bits = arr.dtype.itemsize * 8
    data = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
    header = struct.pack("<2sHI", b"II", 42, 8)

    entries = []

    def entry(tag, typ, count, value):
        entries.append(struct.pack("<HHI4s", tag, typ, count, value))

    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    data_offset = 8 + ifd_size
    entry(WIDTH, 4, 1, struct.pack("<I", w))
    entry(LENGTH, 4, 1, struct.pack("<I", h))
    if spp == 3:
        # BitsPerSample for 3 samples needs an external array — RGB here
        # is always 8-bit, for which SHORT (8,8,8) fits via offset
        bits_off = data_offset + len(data)
        entry(BITS, 3, 3, struct.pack("<I", bits_off))
    else:
        entry(BITS, 3, 1, struct.pack("<HH", bits, 0))
    entry(COMPRESSION, 3, 1, struct.pack("<HH", 1, 0))
    entry(PHOTOMETRIC, 3, 1, struct.pack("<HH", 2 if spp == 3 else 1, 0))
    entry(STRIP_OFFSETS, 4, 1, struct.pack("<I", data_offset))
    entry(SAMPLES_PER_PIXEL, 3, 1, struct.pack("<HH", spp, 0))
    entry(ROWS_PER_STRIP, 4, 1, struct.pack("<I", h))
    entry(STRIP_BYTE_COUNTS, 4, 1, struct.pack("<I", len(data)))
    ifd = struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0)
    out = header + ifd + data
    if spp == 3:
        out += struct.pack("<3H", 8, 8, 8)
    return out


def _read_value(buf, endian, typ, count, raw):
    size = _TYPE_SIZES.get(typ, 1) * count
    if size <= 4:
        data = raw[:size]
    else:
        (off,) = struct.unpack(f"{endian}I", raw)
        data = buf[off : off + size]
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        return None
    vals = struct.unpack(f"{endian}{count}{fmt}", data)
    return list(vals)


def tiff_decode(data: bytes) -> np.ndarray:
    order = data[:2]
    if order == b"II":
        endian = "<"
    elif order == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF file")
    magic, ifd_off = struct.unpack_from(f"{endian}HI", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF file (bad magic)")
    (n,) = struct.unpack_from(f"{endian}H", data, ifd_off)
    tags = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from(f"{endian}HHI", data, ifd_off + 2 + i * 12)
        raw = data[ifd_off + 2 + i * 12 + 8 : ifd_off + 2 + i * 12 + 12]
        tags[tag] = _read_value(data, endian, typ, count, raw)
    w = tags[WIDTH][0]
    h = tags[LENGTH][0]
    bits = tags.get(BITS, [8])[0]
    spp = tags.get(SAMPLES_PER_PIXEL, [1])[0]
    compression = tags.get(COMPRESSION, [1])[0]
    if compression != 1:
        raise ValueError(f"unsupported TIFF compression {compression}")
    offsets = tags[STRIP_OFFSETS]
    counts = tags[STRIP_BYTE_COUNTS]
    payload = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    dtype = np.dtype(f"{endian}u{bits // 8}")
    arr = np.frombuffer(payload, dtype=dtype, count=h * w * spp)
    arr = arr.reshape((h, w) if spp == 1 else (h, w, spp))
    return arr.astype(arr.dtype.newbyteorder("="))


def tiff_to_ngff_image(spark, path, name: str = "image"):
    """S11 tifffile-backend equivalent: TIFF file → NgffImage pixel
    table with default dims/scale (reference cli_input_to_ngff_image.py:62-73
    + to_ngff_image defaulting)."""
    from ..model import to_ngff_image
    from .nifti import array_to_pixel_df

    arr = tiff_decode(open(path, "rb").read())
    dims = ["y", "x"] if arr.ndim == 2 else ["y", "x", "c"]
    df = array_to_pixel_df(spark, arr, dims)
    img = to_ngff_image(
        df, dims=dims, shape={d: int(s) for d, s in zip(dims, arr.shape)}, name=name
    )
    img.dtype = arr.dtype.name
    return img
