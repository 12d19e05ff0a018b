"""Minimal MetaImage (.mha) reader/writer for CLI ingest breadth
(S11): the reference routes ``.mha``/``.mhd`` through itk-wasm/itk
(detect_cli_io_backend.py tables); this parses the public MetaIO header
format natively, following the NRRD module's pattern.

Supported subset: single-file .mha (``ElementDataFile = LOCAL``),
``MET_(U)CHAR/SHORT/INT/LONG_LONG``, ``MET_FLOAT/DOUBLE``, NDims 1-3,
``CompressedData`` (zlib), ``BinaryDataByteOrderMSB``, ``ElementSpacing``
→ scale and ``Offset``/``Origin`` → translation. Per the MetaIO spec,
``DimSize`` is fastest-first (x y z), so the numpy array shape is
``reversed(DimSize)`` (C order). Detached .mhd + .raw pairs are not
supported."""

from __future__ import annotations

import zlib

import numpy as np

_TYPES = {
    "MET_CHAR": "i1", "MET_UCHAR": "u1",
    "MET_SHORT": "i2", "MET_USHORT": "u2",
    "MET_INT": "i4", "MET_UINT": "u4",
    "MET_LONG_LONG": "i8", "MET_ULONG_LONG": "u8",
    "MET_FLOAT": "f4", "MET_DOUBLE": "f8",
}
_INV_TYPES = {v: k for k, v in _TYPES.items()}


def mha_read(data: bytes) -> tuple[np.ndarray, dict]:
    """Parse a single-file .mha. Returns (C-order array — slowest axis
    first — and a header dict with ``spacing``/``origin`` lists in the
    same reversed axis order when present)."""
    # header is ASCII lines 'Key = Value' terminated by the
    # ElementDataFile line; binary payload follows immediately
    fields: dict[str, str] = {}
    pos = 0
    while True:
        nl = data.find(b"\n", pos)
        if nl == -1:
            raise ValueError("MetaImage header not terminated by ElementDataFile")
        line = data[pos:nl].decode("ascii", errors="replace").strip()
        pos = nl + 1
        if not line:
            continue
        key, _, val = line.partition("=")
        fields[key.strip().lower()] = val.strip()
        if key.strip().lower() == "elementdatafile":
            break
    if fields.get("objecttype", "Image").lower() != "image":
        raise ValueError(f"unsupported MetaImage ObjectType {fields.get('objecttype')!r}")
    if fields["elementdatafile"].upper() != "LOCAL":
        raise ValueError("detached MetaImage data files are not supported (.mha LOCAL only)")
    et = fields.get("elementtype", "MET_UCHAR").upper()
    code = _TYPES.get(et)
    if code is None:
        raise ValueError(f"unsupported MetaImage ElementType {et!r}")
    sizes = [int(s) for s in fields["dimsize"].split()]
    ndims = int(fields.get("ndims", len(sizes)))
    if ndims != len(sizes):
        raise ValueError("MetaImage NDims does not match DimSize")
    msb = fields.get("binarydatabyteordermsb", "False").lower() == "true"
    dt = np.dtype((">" if msb else "<") + code)
    n = int(np.prod(sizes))
    payload = data[pos:]
    if fields.get("compresseddata", "False").lower() == "true":
        payload = zlib.decompress(payload)
    buf = payload[: n * dt.itemsize]
    if len(buf) < n * dt.itemsize:
        raise ValueError("MetaImage payload shorter than DimSize promise")
    arr = np.frombuffer(buf, dtype=dt).reshape(tuple(reversed(sizes)))

    header: dict = {"sizes": sizes, "type": et}
    if "elementspacing" in fields:
        header["spacing"] = list(reversed([float(x) for x in fields["elementspacing"].split()]))
    off = fields.get("offset") or fields.get("origin") or fields.get("position")
    if off:
        header["origin"] = list(reversed([float(x) for x in off.split()]))
    return np.ascontiguousarray(arr.astype(dt.newbyteorder("="))), header


def mha_write(
    arr: np.ndarray,
    spacing: list[float] | None = None,
    origin: list[float] | None = None,
    compressed: bool = True,
) -> bytes:
    """Write a single-file .mha from a C-order array (slowest axis
    first). ``spacing``/``origin`` are in array-axis order."""
    code = arr.dtype.newbyteorder("=").str.lstrip("<>=|")
    if code not in _INV_TYPES:
        raise ValueError(f"unsupported dtype {arr.dtype} for MetaImage")
    sizes = list(reversed(arr.shape))
    lines = [
        "ObjectType = Image",
        f"NDims = {arr.ndim}",
        "BinaryData = True",
        "BinaryDataByteOrderMSB = False",
        f"CompressedData = {'True' if compressed else 'False'}",
        f"DimSize = {' '.join(str(s) for s in sizes)}",
        f"ElementType = {_INV_TYPES[code]}",
    ]
    if spacing is not None:
        lines.append(
            "ElementSpacing = " + " ".join(repr(float(s)) for s in reversed(spacing))
        )
    if origin is not None:
        lines.append("Offset = " + " ".join(repr(float(o)) for o in reversed(origin)))
    lines.append("ElementDataFile = LOCAL")
    raw = np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("<"))).tobytes()
    body = zlib.compress(raw, 6) if compressed else raw
    return ("\n".join(lines) + "\n").encode("ascii") + body


def mha_to_ngff_image(spark, path: str):
    """MetaImage → NgffImage with spacing→scale and offset→translation
    on the spatial dims (trailing (z, y, x) order)."""
    from ..model import to_ngff_image
    from .nifti import array_to_pixel_df

    arr, header = mha_read(open(path, "rb").read())
    if arr.ndim > 3:
        raise ValueError(f"MetaImage ingest supports <=3 spatial dims, got {arr.ndim}")
    dims = ["z", "y", "x"][3 - arr.ndim:]
    df = array_to_pixel_df(spark, arr, dims)
    scale = {d: float(s) for d, s in zip(dims, header.get("spacing", []))} or None
    translation = {d: float(o) for d, o in zip(dims, header.get("origin", []))} or None
    img = to_ngff_image(
        df,
        dims=dims,
        shape={d: int(s) for d, s in zip(dims, arr.shape)},
        scale=scale,
        translation=translation,
    )
    img.dtype = arr.dtype.name
    return img
