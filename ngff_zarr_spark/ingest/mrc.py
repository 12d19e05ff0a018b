"""Minimal MRC2014 codec (stdlib + numpy) for CLI ingest breadth (S11).

The reference routes ``.mrc`` through itk/itk-wasm
(detect_cli_io_backend.py extension tables); in a bare environment
this parses the published MRC2014 format natively: 1024-byte header
(NX/NY/NZ, MODE, MX/MY/MZ, CELLA, NSYMBT extended-header skip, the
'MAP ' magic at word 53 and the machine stamp at word 54 for
endianness), modes 0 (int8), 1 (int16), 2 (float32), 6 (uint16).
Data is x-fastest (column), then y (row), then z (section); voxel
size = CELLA / (MX, MY, MZ).
"""

from __future__ import annotations

import struct

import numpy as np

_MODES = {0: "i1", 1: "i2", 2: "f4", 6: "u2"}
_MODE_OF = {np.int8: 0, np.int16: 1, np.float32: 2, np.uint16: 6}


def mrc_encode(arr: np.ndarray, voxel_size=(1.0, 1.0, 1.0)) -> bytes:
    """Encode a (z, y, x) volume as little-endian MRC2014.
    ``voxel_size`` is (z, y, x) in Å."""
    kind = arr.dtype.type
    if kind not in _MODE_OF:
        raise ValueError(f"unsupported MRC dtype {arr.dtype}")
    nz, ny, nx = arr.shape
    hdr = bytearray(1024)
    struct.pack_into("<iii", hdr, 0, nx, ny, nz)
    struct.pack_into("<i", hdr, 12, _MODE_OF[kind])
    struct.pack_into("<iii", hdr, 28, nx, ny, nz)  # MX, MY, MZ
    struct.pack_into(
        "<fff", hdr, 40,
        voxel_size[2] * nx, voxel_size[1] * ny, voxel_size[0] * nz,  # CELLA
    )
    struct.pack_into("<fff", hdr, 52, 90.0, 90.0, 90.0)  # CELLB
    struct.pack_into("<iii", hdr, 64, 1, 2, 3)  # MAPC/MAPR/MAPS = x,y,z
    a = arr.astype(np.float64)
    struct.pack_into("<fff", hdr, 76, float(a.min()), float(a.max()), float(a.mean()))
    struct.pack_into("<i", hdr, 92, 0)  # NSYMBT
    hdr[208:212] = b"MAP "
    hdr[212:216] = b"\x44\x44\x00\x00"  # little-endian machine stamp
    struct.pack_into("<f", hdr, 216, float(a.std()))
    struct.pack_into("<i", hdr, 220, 0)  # NLABL
    le = arr.astype(np.dtype("<" + _MODES[_MODE_OF[kind]]), copy=False)
    return bytes(hdr) + le.tobytes()


def mrc_decode(data: bytes):
    """Decode MRC2014 → ((z, y, x) array, voxel size dict in Å)."""
    if data[208:212] != b"MAP " and data[208:211] != b"MAP":
        raise ValueError("not an MRC2014 file (missing MAP magic)")
    big = data[212] == 0x11  # machine stamp 0x11 0x11 = big-endian
    bo = ">" if big else "<"
    nx, ny, nz = struct.unpack_from(f"{bo}iii", data, 0)
    mode = struct.unpack_from(f"{bo}i", data, 12)[0]
    if mode not in _MODES:
        raise ValueError(f"unsupported MRC mode {mode}")
    mx, my, mz = struct.unpack_from(f"{bo}iii", data, 28)
    ca = struct.unpack_from(f"{bo}fff", data, 40)
    nsymbt = struct.unpack_from(f"{bo}i", data, 92)[0]
    dt = np.dtype(bo + _MODES[mode])
    vox = np.frombuffer(data, dtype=dt, count=nx * ny * nz, offset=1024 + nsymbt)
    arr = vox.reshape(nz, ny, nx)  # section, row, column
    native = arr.astype(arr.dtype.newbyteorder("="), copy=False)
    spacing = {
        "z": float(ca[2] / mz) if mz else 1.0,
        "y": float(ca[1] / my) if my else 1.0,
        "x": float(ca[0] / mx) if mx else 1.0,
    }
    return np.ascontiguousarray(native), spacing


def mrc_to_ngff_image(spark, path: str):
    """MRC → NgffImage: CELLA/M voxel size → scale on (z, y, x)."""
    from ..model import to_ngff_image
    from .nifti import array_to_pixel_df

    arr, spacing = mrc_decode(open(path, "rb").read())
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
