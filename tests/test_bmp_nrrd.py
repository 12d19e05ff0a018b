"""BMP + NRRD codecs (ingest/bmp.py, ingest/nrrd.py): lossless
round-trips, spec-variant decoding (top-down BMPs, 32-bit BGRA, raw and
gzip NRRD encodings, both endians), and the detect→cli ingest route."""

import struct

import numpy as np
import pytest

from ngff_zarr_spark.ingest.bmp import bmp_decode, bmp_encode
from ngff_zarr_spark.ingest.nrrd import nrrd_read, nrrd_to_ngff_image, nrrd_write


def test_bmp_gray_roundtrip():
    arr = (np.arange(13 * 17, dtype=np.uint8) % 251).reshape(13, 17)
    np.testing.assert_array_equal(bmp_decode(bmp_encode(arr)), arr)


def test_bmp_rgb_roundtrip():
    yy, xx = np.indices((9, 14))
    rgb = np.stack(
        [(yy * 7) % 256, (xx * 11) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    np.testing.assert_array_equal(bmp_decode(bmp_encode(rgb)), rgb)


def test_bmp_topdown_and_32bit():
    """Externally-produced variants: negative height (top-down rows)
    and 32-bit BGRA both decode; build them by hand from the spec."""
    h, w = 3, 2
    px = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    row_bytes = w * 4
    offset = 14 + 40
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", offset + row_bytes * h, 0, 0, offset)
    out += struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, row_bytes * h, 0, 0, 0, 0)
    for y in range(h):  # top-down: natural order
        for x in range(w):
            r, g, b = px[y, x]
            out += bytes([b, g, r, 0xFF])
    np.testing.assert_array_equal(bmp_decode(bytes(out)), px)


def test_bmp_paletted_color():
    """A non-gray palette decodes through the palette to RGB."""
    h, w = 2, 3
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    pal = b"".join(struct.pack("<BBBB", b, g, r, 0) for r, g, b in
                   [(10, 20, 30), (40, 50, 60), (70, 80, 90)])
    row_bytes = (w + 3) & ~3
    offset = 14 + 40 + len(pal)
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", offset + row_bytes * h, 0, 0, offset)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, row_bytes * h, 0, 0, 3, 0)
    out += pal
    for y in range(h - 1, -1, -1):
        out += idx[y].tobytes() + b"\x00" * (row_bytes - w)
    got = bmp_decode(bytes(out))
    assert got.shape == (2, 3, 3)
    assert tuple(got[0, 0]) == (10, 20, 30)
    assert tuple(got[1, 2]) == (10, 20, 30)
    assert tuple(got[0, 2]) == (70, 80, 90)


def test_bmp_rejects_rle():
    data = bytearray(bmp_encode(np.zeros((4, 4), np.uint8)))
    struct.pack_into("<I", data, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        bmp_decode(bytes(data))


@pytest.mark.parametrize("encoding", ["raw", "gzip"])
@pytest.mark.parametrize("dtype", ["uint8", "int16", "uint16", "float32", "int32"])
def test_nrrd_roundtrip(encoding, dtype):
    arr = (np.arange(3 * 4 * 5) % 97).reshape(3, 4, 5).astype(dtype)
    back, header = nrrd_read(nrrd_write(arr, encoding=encoding))
    np.testing.assert_array_equal(back, arr)
    assert header["sizes"] == [5, 4, 3]  # fastest-first per spec


def test_nrrd_spacings_origin_roundtrip():
    arr = np.zeros((2, 3, 4), dtype=np.uint8)
    data = nrrd_write(arr, spacings=[2.0, 0.75, 0.5], origin=[9.0, 5.0, 1.0])
    _, header = nrrd_read(data)
    assert header["spacings"] == [2.0, 0.75, 0.5]
    assert header["origin"] == [9.0, 5.0, 1.0]


def test_nrrd_big_endian_and_space_directions():
    """Hand-built header: big-endian int16 with diagonal space
    directions (the itk-style field) maps to spacings."""
    arr = np.arange(6, dtype=">i2").reshape(2, 3)
    hdr = (
        "NRRD0004\n"
        "type: short\n"
        "dimension: 2\n"
        "sizes: 3 2\n"
        "encoding: raw\n"
        "endian: big\n"
        "space directions: (0.5,0) (0,2.0)\n"
        "space origin: (10,20)\n"
        "\n"
    ).encode()
    back, header = nrrd_read(hdr + arr.tobytes())
    np.testing.assert_array_equal(back, np.arange(6).reshape(2, 3))
    assert header["spacings"] == [2.0, 0.5]
    assert header["origin"] == [20.0, 10.0]


def test_nrrd_rejects_unknowns():
    with pytest.raises(ValueError, match="magic"):
        nrrd_read(b"nope")
    bad = nrrd_write(np.zeros((2, 2), np.uint8)).replace(b"encoding: gzip", b"encoding: bzip2")
    with pytest.raises(ValueError, match="encoding"):
        nrrd_read(bad)


def test_detect_cli_routes_bmp_and_nrrd(spark, tmp_path):
    from ngff_zarr_spark.ingest import (
        ConversionBackend,
        cli_input_to_ngff_image,
        detect_cli_io_backend,
    )

    arr = (np.arange(8 * 12, dtype=np.uint8) % 251).reshape(8, 12)
    pb = tmp_path / "img.bmp"
    pb.write_bytes(bmp_encode(arr))
    backend = detect_cli_io_backend([str(pb)])
    assert backend == ConversionBackend.ITKWASM
    img = cli_input_to_ngff_image(spark, backend, [str(pb)])
    assert img.shape == {"y": 8, "x": 12}
    got = {(r.y, r.x): int(r.v) for r in img.data.collect()}
    assert all(got[(y, x)] == int(arr[y, x]) for y in range(8) for x in range(12))

    vol = (np.arange(2 * 3 * 4) % 97).reshape(2, 3, 4).astype(np.int16)
    pn = tmp_path / "vol.nrrd"
    pn.write_bytes(nrrd_write(vol, spacings=[2.0, 0.75, 0.5], origin=[3.0, 2.0, 1.0]))
    backend = detect_cli_io_backend([str(pn)])
    assert backend == ConversionBackend.ITKWASM
    img = cli_input_to_ngff_image(spark, backend, [str(pn)])
    assert img.shape == {"z": 2, "y": 3, "x": 4}
    assert img.scale == {"z": 2.0, "y": 0.75, "x": 0.5}
    assert img.translation == {"z": 3.0, "y": 2.0, "x": 1.0}
    assert img.dtype == "int16"
    got = {(r.z, r.y, r.x): int(r.v) for r in img.data.collect()}
    assert got[(1, 2, 3)] == int(vol[1, 2, 3])


def test_nrrd_ngff_image_defaults(spark, tmp_path):
    """No spacings/origin in the header -> NgffImage defaulting (scale
    1.0, translation 0.0 on spatial dims)."""
    vol = np.arange(4, dtype=np.uint8).reshape(2, 2)
    p = tmp_path / "flat.nrrd"
    p.write_bytes(nrrd_write(vol))
    img = nrrd_to_ngff_image(spark, str(p))
    assert img.scale == {"y": 1.0, "x": 1.0}
    assert img.translation == {"y": 0.0, "x": 0.0}


@pytest.mark.parametrize("compressed", [True, False])
@pytest.mark.parametrize("dtype", ["uint8", "int16", "float32"])
def test_mha_roundtrip(compressed, dtype):
    from ngff_zarr_spark.ingest.mha import mha_read, mha_write

    arr = (np.arange(2 * 3 * 4) % 97).reshape(2, 3, 4).astype(dtype)
    back, header = mha_read(mha_write(arr, compressed=compressed))
    np.testing.assert_array_equal(back, arr)
    assert header["sizes"] == [4, 3, 2]  # fastest-first per MetaIO


def test_mha_big_endian_and_metadata():
    from ngff_zarr_spark.ingest.mha import mha_read

    arr = np.arange(6, dtype=">i2").reshape(2, 3)
    hdr = (
        "ObjectType = Image\n"
        "NDims = 2\n"
        "BinaryDataByteOrderMSB = True\n"
        "DimSize = 3 2\n"
        "ElementType = MET_SHORT\n"
        "ElementSpacing = 0.5 2.0\n"
        "Offset = 10 20\n"
        "ElementDataFile = LOCAL\n"
    ).encode()
    back, header = mha_read(hdr + arr.tobytes())
    np.testing.assert_array_equal(back, np.arange(6).reshape(2, 3))
    assert header["spacing"] == [2.0, 0.5]
    assert header["origin"] == [20.0, 10.0]


def test_mha_rejects_detached():
    from ngff_zarr_spark.ingest.mha import mha_read

    hdr = (
        "ObjectType = Image\nNDims = 2\nDimSize = 2 2\n"
        "ElementType = MET_UCHAR\nElementDataFile = img.raw\n"
    ).encode()
    with pytest.raises(ValueError, match="detached"):
        mha_read(hdr)


def test_detect_cli_routes_mha(spark, tmp_path):
    from ngff_zarr_spark.ingest import (
        ConversionBackend,
        cli_input_to_ngff_image,
        detect_cli_io_backend,
    )
    from ngff_zarr_spark.ingest.mha import mha_write

    vol = (np.arange(2 * 3 * 4) % 97).reshape(2, 3, 4).astype(np.uint8)
    p = tmp_path / "vol.mha"
    p.write_bytes(mha_write(vol, spacing=[2.0, 0.75, 0.5], origin=[3.0, 2.0, 1.0]))
    backend = detect_cli_io_backend([str(p)])
    assert backend == ConversionBackend.ITKWASM
    img = cli_input_to_ngff_image(spark, backend, [str(p)])
    assert img.shape == {"z": 2, "y": 3, "x": 4}
    assert img.scale == {"z": 2.0, "y": 0.75, "x": 0.5}
    assert img.translation == {"z": 3.0, "y": 2.0, "x": 1.0}
    got = {(r.z, r.y, r.x): int(r.v) for r in img.data.collect()}
    assert got[(1, 2, 3)] == int(vol[1, 2, 3])


# ---------------------------------------------------------------------------
# r8: MGH + MRC codecs


def test_mgh_roundtrips():
    import gzip

    import numpy as np

    from ngff_zarr_spark.ingest.mgh import mgh_decode, mgh_encode

    rng = np.random.default_rng(2)
    for dt in [np.uint8, np.int16, np.int32, np.float32]:
        a = rng.integers(0, 100, (4, 5, 6)).astype(dt)
        back, sp = mgh_decode(mgh_encode(a, spacing=(2.5, 2.0, 1.5)))
        assert np.array_equal(back, a) and back.dtype == a.dtype
        assert sp == {"z": 2.5, "y": 2.0, "x": 1.5}
    # .mgz container
    back, _ = mgh_decode(gzip.compress(mgh_encode(a)))
    assert np.array_equal(back, a)


def test_mrc_roundtrips():
    import numpy as np

    from ngff_zarr_spark.ingest.mrc import mrc_decode, mrc_encode

    rng = np.random.default_rng(3)
    for dt in [np.int8, np.int16, np.uint16, np.float32]:
        a = rng.integers(0, 100, (3, 7, 5)).astype(dt)
        back, sp = mrc_decode(mrc_encode(a, voxel_size=(2.5, 2.0, 1.5)))
        assert np.array_equal(back, a) and back.dtype == a.dtype
        assert abs(sp["z"] - 2.5) < 1e-6 and abs(sp["x"] - 1.5) < 1e-6


def test_mrc_rejects_non_mrc():
    import pytest as _pytest

    from ngff_zarr_spark.ingest.mrc import mrc_decode

    with _pytest.raises(ValueError, match="MAP"):
        mrc_decode(b"\x00" * 2048)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    nz=st.integers(1, 6), ny=st.integers(1, 8), nx=st.integers(1, 8),
    dtype=st.sampled_from(["uint8", "int16", "int32", "float32"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_mgh_roundtrip_property(nz, ny, nx, dtype, seed):
    import numpy as np

    from ngff_zarr_spark.ingest.mgh import mgh_decode, mgh_encode

    a = np.random.default_rng(seed).integers(0, 100, (nz, ny, nx)).astype(dtype)
    back, _ = mgh_decode(mgh_encode(a))
    assert np.array_equal(back, a) and back.dtype == a.dtype


@settings(max_examples=15, deadline=None)
@given(
    nz=st.integers(1, 6), ny=st.integers(1, 8), nx=st.integers(1, 8),
    dtype=st.sampled_from(["int8", "int16", "uint16", "float32"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_mrc_roundtrip_property(nz, ny, nx, dtype, seed):
    import numpy as np

    from ngff_zarr_spark.ingest.mrc import mrc_decode, mrc_encode

    a = np.random.default_rng(seed).integers(0, 100, (nz, ny, nx)).astype(dtype)
    back, _ = mrc_decode(mrc_encode(a))
    assert np.array_equal(back, a) and back.dtype == a.dtype
