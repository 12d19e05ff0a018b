"""Native DICOM (PS3.10) parser: write/read roundtrips, implicit-VR
and sequence handling, rejection of out-of-subset streams, and the
header-ordered Spark series assembly (instance order, not filename
order — the IM_9 > IM_10 trap)."""

import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.ingest.dicom import (
    TS_IMPLICIT_LE,
    dicom_read,
    dicom_series_to_ngff_image,
    dicom_to_ngff_image,
    dicom_write,
)


def _grad(h, w, dtype="uint16"):
    yy, xx = np.indices((h, w))
    return ((yy * 179 + xx * 283) % 251).astype(dtype)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16"])
def test_roundtrip_dtypes(dtype):
    arr = _grad(13, 11, dtype)
    if dtype == "int16":
        arr = (arr.astype(np.int64) - 125).astype("int16")
    out, meta = dicom_read(dicom_write(arr, spacing=(2.0, 1.5), instance=7))
    np.testing.assert_array_equal(out, arr)
    assert out.dtype == arr.dtype
    assert meta["spacing"] == (2.0, 1.5)
    assert meta["instance"] == 7
    assert meta["photometric"] == "MONOCHROME2"


def test_odd_dimensions_padding():
    """Odd rows*cols*itemsize forces the even-length pad on PixelData;
    the reader must not read the pad byte as a pixel."""
    arr = _grad(3, 3, "uint8")
    out, _ = dicom_read(dicom_write(arr))
    np.testing.assert_array_equal(out, arr)


def test_rejects_non_dicom_and_compressed():
    with pytest.raises(ValueError, match="DICM"):
        dicom_read(b"\x00" * 64)
    data = bytearray(dicom_write(_grad(4, 4, "uint8")))
    # swap the transfer syntax UID to JPEG baseline (1.2.840.10008.1.2.4.50)
    data = bytes(data).replace(
        b"1.2.840.10008.1.2.1\x00", b"1.2.840.10008.1.2.4.50"
    )
    with pytest.raises(ValueError, match="transfer syntax"):
        dicom_read(data)


def _implicit_elem(group, elem, val):
    if len(val) % 2:
        val += b"\x00"
    return struct.pack("<HHI", group, elem, len(val)) + val


def test_implicit_vr_dataset():
    """A dataset in Implicit VR LE (4-byte lengths, no VR bytes) parses
    through the same tag logic."""
    arr = _grad(5, 6, "uint16")
    meta_elems = b"".join(
        [
            # explicit-VR file meta
            b"\x02\x00\x01\x00OB\x00\x00\x02\x00\x00\x00\x00\x01",
            b"\x02\x00\x10\x00UI" + struct.pack("<H", 18) + TS_IMPLICIT_LE.encode() + b"\x00",
        ]
    )
    body = b"".join(
        [
            _implicit_elem(0x0028, 0x0002, struct.pack("<H", 1)),
            _implicit_elem(0x0028, 0x0010, struct.pack("<H", 5)),
            _implicit_elem(0x0028, 0x0011, struct.pack("<H", 6)),
            _implicit_elem(0x0028, 0x0100, struct.pack("<H", 16)),
            _implicit_elem(0x0028, 0x0103, struct.pack("<H", 0)),
            _implicit_elem(0x7FE0, 0x0010, arr.astype("<u2").tobytes()),
        ]
    )
    data = (
        b"\x00" * 128
        + b"DICM"
        + b"\x02\x00\x00\x00UL\x04\x00"
        + struct.pack("<I", len(meta_elems))
        + meta_elems
        + body
    )
    out, _ = dicom_read(data)
    np.testing.assert_array_equal(out, arr)


def test_sequence_skipped():
    """A defined-length and an undefined-length SQ before PixelData are
    structurally skipped (real-world headers carry them)."""
    arr = _grad(4, 5, "uint8")
    base = dicom_write(arr)
    head, body = base[:132], base[132:]
    # body starts with (0002,0000) meta group-length element; splice the
    # sequences right after the meta group ends
    r_meta_len = struct.unpack("<I", body[8:12])[0]
    split = 12 + r_meta_len
    defined_sq = (
        struct.pack("<HH", 0x0008, 0x1140) + b"SQ\x00\x00" + struct.pack("<I", 8)
        + struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    )
    undefined_sq = (
        struct.pack("<HH", 0x0008, 0x1111) + b"SQ\x00\x00" + struct.pack("<I", 0xFFFFFFFF)
        + struct.pack("<HHI", 0xFFFE, 0xE000, 4) + b"\x00\x00\x00\x00"
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    data = head + body[:split] + defined_sq + undefined_sq + body[split:]
    out, _ = dicom_read(data)
    np.testing.assert_array_equal(out, arr)


def test_multiframe_read():
    """NumberOfFrames > 1 reshapes to (frames, rows, cols)."""
    arr = _grad(4, 6, "uint16")
    base = dicom_write(arr)
    # triple the pixel payload and splice a NumberOfFrames element in
    px = arr.astype("<u2").tobytes()
    stack = np.stack([arr, arr + 1, arr + 2])
    data = base[: len(base) - len(px) - 12]
    nf = struct.pack("<HH", 0x0028, 0x0008) + b"IS" + struct.pack("<H", 2) + b"3 "
    pix = (
        struct.pack("<HH", 0x7FE0, 0x0010) + b"OW\x00\x00"
        + struct.pack("<I", len(px) * 3) + stack.astype("<u2").tobytes()
    )
    out, _ = dicom_read(data + nf + pix)
    assert out.shape == (3, 4, 6)
    np.testing.assert_array_equal(out, stack)


def test_single_file_to_ngff_image(spark, tmp_path):
    arr = _grad(6, 7, "uint16")
    p = str(tmp_path / "one.dcm")
    with open(p, "wb") as f:
        f.write(
            dicom_write(arr, spacing=(0.5, 0.25), instance=1, position=(3.0, 4.0, 5.0))
        )
    img = dicom_to_ngff_image(spark, p)
    assert img.dims == ["y", "x"]
    assert img.scale == {"y": 0.5, "x": 0.25}
    assert img.translation == {"y": 4.0, "x": 3.0}
    got = {
        (r.y, r.x): int(r.v)
        for r in img.data.select("y", "x", "v").collect()
    }
    assert got == {(y, x): int(arr[y, x]) for y in range(6) for x in range(7)}


def test_series_orders_by_instance_not_path(spark, tmp_path):
    """Four slices whose filenames sort in REVERSE of InstanceNumber:
    the assembled volume must stack by instance (header), proving the
    z index never comes from the path sort."""
    nz, h, w = 4, 5, 6
    for z in range(nz):
        arr = (np.full((h, w), z * 10) + _grad(h, w, "uint16") % 10).astype("uint16")
        p = str(tmp_path / f"im_{nz - z:02d}.dcm")
        with open(p, "wb") as f:
            f.write(dicom_write(arr, spacing=(1.0, 1.0), slice_thickness=2.0,
                                instance=z + 1, position=(0.0, 0.0, z * 2.0)))
    img = dicom_series_to_ngff_image(spark, str(tmp_path))
    assert img.shape == {"z": nz, "y": h, "x": w}
    assert img.scale["z"] == 2.0
    rows = img.data.groupBy("z").count().collect()
    assert {(r.z, r["count"]) for r in rows} == {(z, h * w) for z in range(nz)}
    # slice content identifies the instance: min pixel of slice z is z*10
    mins = {
        r.z: r.mn
        for r in img.data.groupBy("z").agg(F.min("v").alias("mn")).collect()
    }
    assert mins == {z: float(z * 10) for z in range(nz)}
