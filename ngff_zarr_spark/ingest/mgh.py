"""Minimal FreeSurfer MGH/MGZ codec (stdlib + numpy) for CLI ingest
breadth (S11).

The reference routes ``.mgh``/``.mgz`` through itk/itk-wasm
(detect_cli_io_backend.py extension tables); in a bare environment
this parses the published MGH format natively: big-endian fixed
284-byte header (version 1), UCHAR/INT/FLOAT/SHORT voxel types, the
goodRASflag geometry block (spacing, direction cosines Mdc, center
Pxyz_c), gzip container for ``.mgz``. Data is x-fastest
(x, y, z, frames), like the published spec.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np

# MGH type codes (FreeSurfer mghformat: MRI_UCHAR=0, MRI_INT=1,
# MRI_FLOAT=3, MRI_SHORT=4)
_TYPES = {0: np.uint8, 1: np.dtype(">i4"), 3: np.dtype(">f4"), 4: np.dtype(">i2")}
_TYPE_OF = {np.uint8: 0, np.int32: 1, np.float32: 3, np.int16: 4}
_DATA_OFFSET = 284


def mgh_encode(arr: np.ndarray, spacing=(1.0, 1.0, 1.0)) -> bytes:
    """Encode a (z, y, x) volume as MGH version 1 with an identity
    direction matrix. Data is stored x-fastest, so the (z, y, x) numpy
    array serializes directly in C order reversed per-axis mapping:
    MGH's (width, height, depth) = (x, y, z)."""
    kind = arr.dtype.type
    if kind not in _TYPE_OF:
        raise ValueError(f"unsupported MGH dtype {arr.dtype}")
    nz, ny, nx = arr.shape
    out = bytearray()
    out += struct.pack(">iiiii", 1, nx, ny, nz, 1)      # version, w, h, d, nframes
    out += struct.pack(">ii", _TYPE_OF[kind], 0)        # type, dof
    out += struct.pack(">h", 1)                          # goodRASflag
    out += struct.pack(">fff", spacing[2], spacing[1], spacing[0])  # xsize..zsize
    # Mdc (x/y/z direction cosines, column-major) = identity; Pxyz_c = 0
    out += struct.pack(">fffffffff", 1, 0, 0, 0, 1, 0, 0, 0, 1)
    out += struct.pack(">fff", 0.0, 0.0, 0.0)
    out += b"\x00" * (_DATA_OFFSET - len(out))
    # x-fastest: MGH index order is (frame, z, y, x) slowest→fastest,
    # which is exactly the C order of the (z, y, x) array
    be = arr.astype(_TYPES[_TYPE_OF[kind]], copy=False)
    out += be.tobytes()
    return bytes(out)


def mgh_decode(data: bytes):
    """Decode MGH/MGZ → ((z, y, x[, frames]) array, spacing dict)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    version, nx, ny, nz, nframes = struct.unpack_from(">iiiii", data, 0)
    if version != 1:
        raise ValueError(f"unsupported MGH version {version}")
    type_code, _dof = struct.unpack_from(">ii", data, 20)
    if type_code not in _TYPES:
        raise ValueError(f"unsupported MGH type {type_code}")
    good_ras = struct.unpack_from(">h", data, 28)[0]
    if good_ras == 1:
        xs, ys, zs = struct.unpack_from(">fff", data, 30)
    else:
        xs = ys = zs = 1.0
    dt = _TYPES[type_code]
    n = nx * ny * nz * nframes
    vox = np.frombuffer(data, dtype=dt, count=n, offset=_DATA_OFFSET)
    # (frames, z, y, x) slowest→fastest
    arr = vox.reshape(nframes, nz, ny, nx)
    if nframes == 1:
        arr = arr[0]
    native = arr.astype(arr.dtype.newbyteorder("="), copy=False)
    return np.ascontiguousarray(native), {"z": float(zs), "y": float(ys), "x": float(xs)}


def mgh_to_ngff_image(spark, path: str):
    """MGH/MGZ → NgffImage: spacing → scale on (z, y, x)."""
    from ..model import to_ngff_image
    from .nifti import array_to_pixel_df

    arr, spacing = mgh_decode(open(path, "rb").read())
    if arr.ndim == 4:  # frames → t axis
        dims = ["t", "z", "y", "x"]
    else:
        dims = ["z", "y", "x"]
    df = array_to_pixel_df(spark, arr, dims)
    img = to_ngff_image(
        df,
        dims=dims,
        shape={d: int(s) for d, s in zip(dims, arr.shape)},
        scale=spacing,
    )
    img.dtype = arr.dtype.name
    return img
