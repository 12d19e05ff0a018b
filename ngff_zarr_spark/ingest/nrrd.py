"""Minimal NRRD reader/writer (stdlib + numpy) for CLI ingest breadth
(S11): the reference routes ``.nrrd``/``.nhdr`` through itk-wasm/itk
(detect_cli_io_backend.py tables); this parses the public NRRD format
specification natively — enough for the medical-imaging volumes the
reference's users convert.

Supported subset: NRRD000x magic, ``type`` (u)int 8/16/32/64 + float
32/64, ``dimension`` 1-5, ``sizes``, ``encoding`` raw | gzip (gz),
``endian``, ``spacings`` or diagonal ``space directions`` (→ per-axis
scale), ``space origin`` (→ translation). Per the spec, the FIRST axis
is the FASTEST varying, so the numpy array shape is ``reversed(sizes)``
(C order). Detached headers (.nhdr + data file) are not supported —
single-file .nrrd only.
"""

from __future__ import annotations

import gzip as _gzip
import re
import zlib

import numpy as np

_TYPES = {
    "signed char": "i1", "int8": "i1", "int8_t": "i1",
    "uchar": "u1", "unsigned char": "u1", "uint8": "u1", "uint8_t": "u1",
    "short": "i2", "short int": "i2", "signed short": "i2", "int16": "i2", "int16_t": "i2",
    "ushort": "u2", "unsigned short": "u2", "uint16": "u2", "uint16_t": "u2",
    "int": "i4", "signed int": "i4", "int32": "i4", "int32_t": "i4",
    "uint": "u4", "unsigned int": "u4", "uint32": "u4", "uint32_t": "u4",
    "longlong": "i8", "long long": "i8", "int64": "i8", "int64_t": "i8",
    "ulonglong": "u8", "unsigned long long": "u8", "uint64": "u8", "uint64_t": "u8",
    "float": "f4", "double": "f8",
}
_INV_TYPES = {"u1": "uint8", "i1": "int8", "u2": "uint16", "i2": "int16",
              "u4": "uint32", "i4": "int32", "u8": "uint64", "i8": "int64",
              "f4": "float", "f8": "double"}


def _parse_vector(text: str) -> list[float]:
    return [float(x) for x in re.findall(r"[-+0-9.eE]+", text)]


def nrrd_read(data: bytes) -> tuple[np.ndarray, dict]:
    """Parse a single-file NRRD. Returns (array in C order — slowest
    axis first, i.e. reversed ``sizes`` — and a header dict with
    ``spacings``/``origin`` lists in the same reversed axis order when
    present)."""
    if not data.startswith(b"NRRD"):
        raise ValueError("not a NRRD file (missing magic)")
    end = data.find(b"\n\n")
    sep = 2
    if end == -1:
        end = data.find(b"\r\n\r\n")
        sep = 4
        if end == -1:
            raise ValueError("NRRD header terminator (blank line) not found")
    header_text = data[:end].decode("ascii", errors="replace")
    payload = data[end + sep:]

    fields: dict[str, str] = {}
    for line in header_text.splitlines()[1:]:
        if not line or line.startswith("#"):
            continue
        if ":=" in line:  # key-value metadata, not a field
            continue
        key, _, val = line.partition(":")
        fields[key.strip().lower()] = val.strip()

    if "type" not in fields or "sizes" not in fields:
        raise ValueError("NRRD header missing required type/sizes fields")
    code = _TYPES.get(fields["type"].lower())
    if code is None:
        raise ValueError(f"unsupported NRRD type {fields['type']!r}")
    sizes = [int(s) for s in fields["sizes"].split()]
    ndim = int(fields.get("dimension", len(sizes)))
    if ndim != len(sizes):
        raise ValueError("NRRD dimension does not match sizes")
    endian = fields.get("endian", "little")
    dt = np.dtype(("<" if endian == "little" else ">") + code)

    encoding = fields.get("encoding", "raw").lower()
    n = int(np.prod(sizes))
    if encoding == "raw":
        buf = payload[: n * dt.itemsize]
    elif encoding in ("gzip", "gz"):
        try:
            buf = _gzip.decompress(payload)
        except Exception:
            buf = zlib.decompress(payload)
        buf = buf[: n * dt.itemsize]
    else:
        raise ValueError(f"unsupported NRRD encoding {encoding!r}")
    if len(buf) < n * dt.itemsize:
        raise ValueError("NRRD payload shorter than sizes promise")
    # first axis fastest -> numpy C-order shape is reversed(sizes)
    arr = np.frombuffer(buf, dtype=dt).reshape(tuple(reversed(sizes)))

    header: dict = {"sizes": sizes, "type": fields["type"], "encoding": encoding}
    if "spacings" in fields:
        sp = _parse_vector(fields["spacings"])
        header["spacings"] = list(reversed(sp))
    elif "space directions" in fields:
        # accept diagonal direction vectors: ith vector (0,..,d_i,..,0)
        vecs = re.findall(r"\(([^)]*)\)", fields["space directions"])
        diag = []
        ok = True
        for i, v in enumerate(vecs):
            comps = _parse_vector(v)
            for j, c in enumerate(comps):
                if j != i and abs(c) > 0:
                    ok = False
            if i < len(comps):
                diag.append(comps[i])
        if ok and len(diag) == len(vecs):
            header["spacings"] = list(reversed(diag))
    if "space origin" in fields:
        header["origin"] = list(reversed(_parse_vector(fields["space origin"])))
    return np.ascontiguousarray(arr.astype(dt.newbyteorder("="))), header


def nrrd_write(
    arr: np.ndarray,
    spacings: list[float] | None = None,
    origin: list[float] | None = None,
    encoding: str = "gzip",
) -> bytes:
    """Write a single-file NRRD from a C-order array (slowest axis
    first; ``sizes`` comes out reversed per the spec's fastest-first
    rule). ``spacings``/``origin`` are in array-axis order."""
    code = arr.dtype.newbyteorder("=").str.lstrip("<>=|")
    if code not in _INV_TYPES:
        raise ValueError(f"unsupported dtype {arr.dtype} for NRRD")
    sizes = list(reversed(arr.shape))
    lines = [
        "NRRD0004",
        "# generated by ngff_zarr_spark",
        f"type: {_INV_TYPES[code]}",
        f"dimension: {arr.ndim}",
        f"sizes: {' '.join(str(s) for s in sizes)}",
        f"encoding: {'gzip' if encoding in ('gzip', 'gz') else 'raw'}",
        "endian: little",
    ]
    if spacings is not None:
        lines.append(
            "spacings: " + " ".join(repr(float(s)) for s in reversed(spacings))
        )
    if origin is not None:
        lines.append(
            "space origin: ("
            + ",".join(repr(float(o)) for o in reversed(origin))
            + ")"
        )
    raw = np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("<"))).tobytes()
    body = _gzip.compress(raw, 6) if encoding in ("gzip", "gz") else raw
    return ("\n".join(lines) + "\n\n").encode("ascii") + body


def nrrd_to_ngff_image(spark, path: str):
    """NRRD → NgffImage with spacings→scale and origin→translation on
    the spatial dims (reference converts these via itk; axis order
    mapped to trailing (z, y, x))."""
    from ..model import to_ngff_image
    from .nifti import array_to_pixel_df

    arr, header = nrrd_read(open(path, "rb").read())
    if arr.ndim > 3:
        raise ValueError(
            f"NRRD ingest supports <=3 spatial dims, got {arr.ndim}"
        )
    dims = ["z", "y", "x"][3 - arr.ndim:]
    df = array_to_pixel_df(spark, arr, dims)
    scale = {d: float(s) for d, s in zip(dims, header.get("spacings", []))} or None
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
