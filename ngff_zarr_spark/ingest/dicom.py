"""Minimal DICOM (PS3.10) reader/writer (stdlib + numpy) for CLI
ingest breadth (S11) and DICOM z-series assembly (S13).

The reference routes ``.dcm`` through itk-wasm/itk
(cli_input_to_ngff_image.py:49-61, detect_cli_io_backend.py tables);
in a bare environment those libraries are absent, so this parses the
public DICOM standard natively — the subset a secondary-capture /
CT-like series needs:

* Part 10 file header: 128-byte preamble + ``DICM`` + File Meta
  Information group (0002,xxxx), always Explicit VR Little Endian.
* Dataset transfer syntaxes: Explicit VR LE (1.2.840.10008.1.2.1) and
  Implicit VR LE (1.2.840.10008.1.2). Compressed / encapsulated pixel
  data raises ``ValueError`` (route those through real itk).
* Native (uncompressed) PixelData, MONOCHROME1/2, SamplesPerPixel 1,
  BitsAllocated 8/16, signed or unsigned, single- or multi-frame.
* Geometry: PixelSpacing (row\\col = y\\x), SliceThickness,
  SpacingBetweenSlices, ImagePositionPatient, InstanceNumber.
* Sequences (SQ) are structurally skipped — defined or undefined
  length, with nested-item walking — so real-world headers parse.

Series assembly is Spark-first (the S13 shape): ``binaryFile`` lists
and reads the files on executors; a light header pass builds the tiny
(path → InstanceNumber) table, a window over that FILE LIST (one row
per file, never pixels) assigns z by instance order, and an Arrow
``mapInPandas`` decode turns each file into pixel rows — the decode
never touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# transfer syntaxes this module decodes
TS_IMPLICIT_LE = "1.2.840.10008.1.2"
TS_EXPLICIT_LE = "1.2.840.10008.1.2.1"

# VRs that use the 4-byte length form in explicit VR (PS3.5 §7.1.2)
_LONG_VRS = {b"OB", b"OW", b"OF", b"OL", b"OD", b"OV", b"SQ", b"UC", b"UR", b"UT", b"UN"}

_UID_SC = "1.2.840.10008.5.1.4.1.1.7"  # Secondary Capture SOP class
_UID_ROOT = "1.2.826.0.1.3680043.8.498"  # public example org root


class _Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def u16(self) -> int:
        v = struct.unpack_from("<H", self.d, self.p)[0]
        self.p += 2
        return v

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.d, self.p)[0]
        self.p += 4
        return v

    def take(self, n: int) -> bytes:
        v = self.d[self.p: self.p + n]
        self.p += n
        return v

    def eof(self) -> bool:
        return self.p >= len(self.d)


def _skip_undefined_sq(r: _Reader) -> None:
    """Skip an undefined-length sequence body up to and including its
    Sequence Delimitation Item, walking nested undefined items."""
    while not r.eof():
        group, elem = r.u16(), r.u16()
        length = r.u32()
        if (group, elem) == (0xFFFE, 0xE0DD):  # sequence delimiter
            return
        if (group, elem) == (0xFFFE, 0xE000):  # item
            if length == 0xFFFFFFFF:
                # undefined-length item: walk to item delimiter,
                # recursing through nested undefined sequences
                while not r.eof():
                    g2, e2 = r.u16(), r.u16()
                    l2 = r.u32()
                    if (g2, e2) == (0xFFFE, 0xE00D):
                        break
                    if l2 == 0xFFFFFFFF:
                        _skip_undefined_sq(r)
                    else:
                        r.take(l2)
            else:
                r.take(length)
        else:
            raise ValueError(
                f"malformed sequence: tag ({group:04x},{elem:04x}) inside SQ"
            )
    raise ValueError("unterminated undefined-length sequence")


def _read_element(r: _Reader, explicit: bool):
    """One data element → (group, elem, vr, value bytes). SQ bodies are
    skipped and returned as empty values."""
    group, elem = r.u16(), r.u16()
    if group == 0xFFFE:  # item/delimiter at dataset level: length-only
        length = r.u32()
        return group, elem, b"--", b""
    if explicit:
        vr = r.take(2)
        if vr in _LONG_VRS:
            r.take(2)
            length = r.u32()
        else:
            length = r.u16()
    else:
        vr = b"UN"
        length = r.u32()
    if vr == b"SQ" or (not explicit and length == 0xFFFFFFFF and (group, elem) != (0x7FE0, 0x0010)):
        if length == 0xFFFFFFFF:
            _skip_undefined_sq(r)
        else:
            r.take(length)
        return group, elem, vr, b""
    if length == 0xFFFFFFFF:
        raise ValueError(
            f"undefined-length element ({group:04x},{elem:04x}) outside SQ "
            "(encapsulated/compressed pixel data is outside the native subset)"
        )
    return group, elem, vr, r.take(length)


def _ascii(v: bytes) -> str:
    return v.decode("ascii", errors="replace").strip("\x00 ")


def _ds_list(v: bytes) -> list[float]:
    s = _ascii(v)
    return [float(x) for x in s.split("\\")] if s else []


def dicom_read(data: bytes) -> tuple[np.ndarray, dict]:
    """Parse a Part 10 DICOM file. Returns (pixel array — (rows, cols)
    or (frames, rows, cols) — and a metadata dict with ``spacing``
    (y, x), ``slice_thickness``, ``spacing_between_slices``,
    ``position`` (x, y, z), ``instance`` and ``photometric``)."""
    if len(data) < 132 + 8 or data[128:132] != b"DICM":
        raise ValueError("not a Part 10 DICOM file (missing DICM magic)")
    r = _Reader(data, 132)

    # file meta group: always explicit VR LE; (0002,0000) UL group
    # length bounds it exactly
    group, elem, vr, val = _read_element(r, explicit=True)
    if (group, elem) != (0x0002, 0x0000):
        raise ValueError("file meta must start with (0002,0000) group length")
    meta_end = r.p + struct.unpack("<I", val)[0]
    ts = TS_EXPLICIT_LE
    while r.p < meta_end:
        group, elem, vr, val = _read_element(r, explicit=True)
        if (group, elem) == (0x0002, 0x0010):
            ts = _ascii(val)
    if ts not in (TS_EXPLICIT_LE, TS_IMPLICIT_LE):
        raise ValueError(
            f"transfer syntax {ts} outside the native subset (explicit/"
            "implicit VR little endian; compressed syntaxes need itk)"
        )
    explicit = ts == TS_EXPLICIT_LE

    tags: dict[tuple[int, int], bytes] = {}
    pixel = None
    while not r.eof():
        group, elem, vr, val = _read_element(r, explicit)
        if (group, elem) == (0x7FE0, 0x0010):
            pixel = val
            break  # PixelData is last in the subset we write/read
        tags[(group, elem)] = val
    if pixel is None:
        raise ValueError("no PixelData (7FE0,0010) element")

    def us(tag, default=None):
        v = tags.get(tag)
        if v is None or len(v) < 2:
            return default
        return struct.unpack("<H", v[:2])[0]

    rows, cols = us((0x0028, 0x0010)), us((0x0028, 0x0011))
    if rows is None or cols is None:
        raise ValueError("missing Rows/Columns")
    samples = us((0x0028, 0x0002), 1)
    if samples != 1:
        raise ValueError(f"SamplesPerPixel={samples} unsupported (MONOCHROME only)")
    bits = us((0x0028, 0x0100), 16)
    signed = us((0x0028, 0x0103), 0) == 1
    if bits not in (8, 16):
        raise ValueError(f"BitsAllocated={bits} unsupported")
    dt = np.dtype(("i" if signed else "u") + ("1" if bits == 8 else "2")).newbyteorder("<")

    n_frames = 1
    nf_raw = tags.get((0x0028, 0x0008))
    if nf_raw:
        n_frames = int(_ascii(nf_raw) or "1")
    need = rows * cols * n_frames * dt.itemsize
    if len(pixel) < need:
        raise ValueError(f"PixelData too short: {len(pixel)} < {need}")
    arr = np.frombuffer(pixel[:need], dtype=dt)
    arr = arr.reshape((n_frames, rows, cols) if n_frames > 1 else (rows, cols))

    meta: dict = {"photometric": _ascii(tags.get((0x0028, 0x0004), b"MONOCHROME2"))}
    sp = _ds_list(tags.get((0x0028, 0x0030), b""))
    if len(sp) == 2:
        meta["spacing"] = (sp[0], sp[1])  # row spacing = y, col = x
    st = _ds_list(tags.get((0x0018, 0x0050), b""))
    if st:
        meta["slice_thickness"] = st[0]
    sb = _ds_list(tags.get((0x0018, 0x0088), b""))
    if sb:
        meta["spacing_between_slices"] = sb[0]
    pos = _ds_list(tags.get((0x0020, 0x0032), b""))
    if len(pos) == 3:
        meta["position"] = tuple(pos)
    inst = tags.get((0x0020, 0x0013))
    if inst:
        meta["instance"] = int(_ascii(inst) or "0")
    return np.ascontiguousarray(arr.astype(dt.newbyteorder("="))), meta


def _elem(group: int, elem: int, vr: bytes, val: bytes) -> bytes:
    if len(val) % 2:
        val += b"\x00" if vr in (b"UI", b"OB") else b" "
    head = struct.pack("<HH", group, elem) + vr
    if vr in _LONG_VRS:
        return head + b"\x00\x00" + struct.pack("<I", len(val)) + val
    return head + struct.pack("<H", len(val)) + val


def dicom_write(
    arr: np.ndarray,
    spacing: tuple[float, float] = (1.0, 1.0),
    slice_thickness: float = 1.0,
    instance: int = 1,
    position: tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> bytes:
    """Write a single-frame (rows, cols) secondary-capture DICOM in
    Explicit VR Little Endian. ``spacing`` is (row/y, col/x) like
    PixelSpacing; deterministic UIDs derive from ``instance``."""
    if arr.ndim != 2:
        raise ValueError(f"dicom_write expects a 2-D slice, got {arr.shape}")
    dt = arr.dtype.newbyteorder("=")
    kinds = {"uint8": (8, 0), "uint16": (16, 0), "int16": (16, 1)}
    if dt.name not in kinds:
        raise ValueError(f"unsupported dtype {arr.dtype} for DICOM write")
    bits, pixrep = kinds[dt.name]
    rows, cols = arr.shape
    sop_uid = f"{_UID_ROOT}.{instance}"

    def ui(s: str) -> bytes:
        return s.encode("ascii")

    def ds(*vals: float) -> bytes:
        return "\\".join(repr(float(v)) for v in vals).encode("ascii")

    meta = b"".join(
        [
            _elem(0x0002, 0x0001, b"OB", b"\x00\x01"),
            _elem(0x0002, 0x0002, b"UI", ui(_UID_SC)),
            _elem(0x0002, 0x0003, b"UI", ui(sop_uid)),
            _elem(0x0002, 0x0010, b"UI", ui(TS_EXPLICIT_LE)),
            _elem(0x0002, 0x0012, b"UI", ui(_UID_ROOT + ".1")),
        ]
    )
    body = b"".join(
        [
            _elem(0x0008, 0x0016, b"UI", ui(_UID_SC)),
            _elem(0x0008, 0x0018, b"UI", ui(sop_uid)),
            _elem(0x0018, 0x0050, b"DS", ds(slice_thickness)),
            _elem(0x0020, 0x0013, b"IS", str(instance).encode("ascii")),
            _elem(0x0020, 0x0032, b"DS", ds(*position)),
            _elem(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
            _elem(0x0028, 0x0004, b"CS", b"MONOCHROME2"),
            _elem(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
            _elem(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
            _elem(0x0028, 0x0030, b"DS", ds(spacing[0], spacing[1])),
            _elem(0x0028, 0x0100, b"US", struct.pack("<H", bits)),
            _elem(0x0028, 0x0101, b"US", struct.pack("<H", bits)),
            _elem(0x0028, 0x0102, b"US", struct.pack("<H", bits - 1)),
            _elem(0x0028, 0x0103, b"US", struct.pack("<H", pixrep)),
            _elem(
                0x7FE0,
                0x0010,
                b"OW",
                np.ascontiguousarray(arr.astype(dt.newbyteorder("<"))).tobytes(),
            ),
        ]
    )
    return (
        b"\x00" * 128
        + b"DICM"
        + _elem(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta)))
        + meta
        + body
    )


def dicom_to_ngff_image(spark, path: str):
    """Single-file DICOM (incl. multi-frame) → NgffImage: PixelSpacing
    → y/x scale, SpacingBetweenSlices (fallback SliceThickness) → z
    scale, ImagePositionPatient → translation."""
    from ..model import to_ngff_image
    from .nifti import array_to_pixel_df

    arr, meta = dicom_read(open(path, "rb").read())
    dims = ["z", "y", "x"][3 - arr.ndim:]
    df = array_to_pixel_df(spark, arr, dims)
    sy, sx = meta.get("spacing", (1.0, 1.0))
    scale = {"y": float(sy), "x": float(sx)}
    if "z" in dims:
        scale["z"] = float(
            meta.get("spacing_between_slices", meta.get("slice_thickness", 1.0))
        )
    translation = None
    if "position" in meta:
        px, py, pz = meta["position"]
        translation = {"y": float(py), "x": float(px)}
        if "z" in dims:
            translation["z"] = float(pz)
    img = to_ngff_image(
        df,
        dims=dims,
        shape={d: int(s) for d, s in zip(dims, arr.shape)},
        scale={d: scale[d] for d in dims},
        translation={d: translation[d] for d in dims} if translation else None,
    )
    img.dtype = arr.dtype.name
    return img


def dicom_series_to_pixel_df(spark, glob: str):
    """A glob of single-frame DICOM files → one (z, y, x) pixel table,
    z ordered by InstanceNumber (ties: path) — NOT by filename, which
    is the classic DICOM series trap (IM_9 sorts after IM_10).

    Plan: two ``binaryFile`` passes. Pass 1 maps each file to ONE
    header row (path, instance) via Arrow; the z index is a window
    over that file list (one row per file — never pixel data). Pass 2
    decodes pixels on executors and joins the BROADCAST path→z map.
    """
    from typing import Iterator

    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .series import PIXEL_SCHEMA

    files = spark.read.format("binaryFile").load(glob)

    def header_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                _, meta = dicom_read(bytes(row["content"]))
                out.append((row["path"], int(meta.get("instance", 0))))
            yield pd.DataFrame(out, columns=["path", "instance"])

    headers = files.select("path", "content").mapInPandas(
        header_rows, "path string, instance long"
    )
    # one row per FILE (bounded by the series size); the non-foldable
    # constant-zero partition silences WindowExec's "No Partition
    # Defined" warning
    w = Window.partitionBy(
        F.col("instance") - F.col("instance")
    ).orderBy("instance", "path")
    z_map = headers.select(
        "path", (F.row_number().over(w) - 1).alias("z")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                arr, _ = dicom_read(bytes(row["content"]))
                if arr.ndim != 2:
                    raise ValueError(
                        f"series slice {row['path']} must be single-frame 2-D"
                    )
                h, wd = arr.shape
                yy, xx = np.divmod(np.arange(arr.size, dtype=np.int64), wd)
                yield pd.DataFrame(
                    {
                        "t": np.zeros(arr.size, dtype=np.int64),
                        "c": np.zeros(arr.size, dtype=np.int64),
                        "z": np.full(arr.size, row["z"], dtype=np.int64),
                        "y": yy,
                        "x": xx,
                        "v": arr.reshape(-1).astype(np.float64),
                    }
                )

    indexed = files.join(F.broadcast(z_map), "path").select("path", "content", "z")
    return indexed.mapInPandas(decode_batches, PIXEL_SCHEMA)


def dicom_series_to_ngff_image(spark, glob: str, name: str = "dicom_series"):
    """S13-for-DICOM complete: header-ordered z-stack → NgffImage with
    geometry from the first instance's tags (spacing, position) and z
    scale from SpacingBetweenSlices/SliceThickness."""
    from ..model import NgffImage

    files = spark.read.format("binaryFile").load(glob)
    n_files = files.count()
    sample = files.orderBy("path").limit(1).collect()[0]
    arr, meta = dicom_read(bytes(sample["content"]))
    sy, sx = meta.get("spacing", (1.0, 1.0))
    sz = float(meta.get("spacing_between_slices", meta.get("slice_thickness", 1.0)))
    df = dicom_series_to_pixel_df(spark, glob)
    dims = ["z", "y", "x"]
    shape = {"z": int(n_files), "y": int(arr.shape[0]), "x": int(arr.shape[1])}
    translation = {d: 0.0 for d in dims}
    if "position" in meta:
        px, py, pz = meta["position"]
        translation = {"z": float(pz), "y": float(py), "x": float(px)}
    return NgffImage(
        data=df,
        dims=dims,
        shape=shape,
        scale={"z": sz, "y": float(sy), "x": float(sx)},
        translation=translation,
        name=name,
        dtype=arr.dtype.name,
    )
