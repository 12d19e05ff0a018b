"""Ingest adapters (S11-S17) unit tests: backend detection tables,
NIfTI header/affine semantics, PNG/TIFF codecs, ITK dict adapters.

Reference parity targets: detect_cli_io_backend.py:21-128,
nibabel_image_to_ngff_image.py (esp. affine decomposition :10-54 and
scl_slope/inter defaulting :120-140, exercised heavily by
py/test/test_nibabel_image_to_ngff_image.py), itk adapters
itk_image_to_ngff_image.py:11-82 / ngff_image_to_itk_image.py:39-145.
"""

from __future__ import annotations

import numpy as np
import pytest

from ngff_zarr_spark.ingest import ConversionBackend, detect_cli_io_backend
from ngff_zarr_spark.ingest.nifti import (
    affine_axcodes,
    decompose_affine_with_shear,
    extract_omero_metadata,
    nifti_to_ngff_image,
    read_nifti,
    write_nifti,
)
from ngff_zarr_spark.ingest.png import png_decode, png_encode
from ngff_zarr_spark.ingest.tiff import tiff_decode, tiff_encode


def test_detect_backend_tables(tmp_path):
    (tmp_path / "arr").mkdir()
    (tmp_path / "arr" / ".zarray").write_text("{}")
    assert detect_cli_io_backend([str(tmp_path / "arr")]) == ConversionBackend.ZARR_ARRAY
    assert detect_cli_io_backend(["x.ome.zarr"]) == ConversionBackend.NGFF_ZARR
    assert detect_cli_io_backend(["x.nii"]) == ConversionBackend.NIBABEL
    assert detect_cli_io_backend(["x.nii.gz"]) == ConversionBackend.NIBABEL
    # single small existing file with itkwasm extension → ITKWASM
    p = tmp_path / "x.mha"
    p.write_bytes(b"0" * 100)
    assert detect_cli_io_backend([str(p)]) == ConversionBackend.ITKWASM
    # multi-file input skips the single-file itkwasm branch → ITK
    assert detect_cli_io_backend([str(p), str(p)]) == ConversionBackend.ITK
    assert detect_cli_io_backend(["x.tif"]) == ConversionBackend.TIFFFILE
    assert detect_cli_io_backend(["x.ome.tiff"]) == ConversionBackend.TIFFFILE
    assert detect_cli_io_backend(["x.webp"]) == ConversionBackend.IMAGEIO


def test_affine_decomposition_scale_translation():
    aff = np.diag([1.5, 2.0, 2.5, 1.0])
    aff[:3, 3] = (10, 20, 30)
    d = decompose_affine_with_shear(aff)
    assert np.allclose(d["scale"], [1.5, 2.0, 2.5])
    assert np.allclose(d["translation"], [10, 20, 30])
    assert np.allclose(d["shear"], 0)
    assert np.allclose(d["orientation"], np.eye(3))


def test_affine_decomposition_with_rotation_and_shear():
    theta = 0.3
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    scale = np.diag([2.0, 3.0, 4.0])
    aff = np.eye(4)
    aff[:3, :3] = rot @ scale
    d = decompose_affine_with_shear(aff)
    # pure rotation+scale: orientation orthonormal and equals the rotation
    o = d["orientation"]
    assert np.allclose(o.T @ o, np.eye(3), atol=1e-10)
    assert np.allclose(o, rot, atol=1e-10)
    assert np.allclose(d["scale"], [2.0, 3.0, 4.0])
    assert np.allclose(d["shear"], 0, atol=1e-10)

    # with shear: column norms recovered as scale, x/y columns stay
    # orthogonal (the reference's convention orthogonalizes y against x
    # but z only against the *unnormalized* columns — mirror exactly)
    shear = np.array([[1, 0.1, 0.0], [0, 1, 0.05], [0, 0, 1]])
    aff[:3, :3] = rot @ shear @ scale
    d = decompose_affine_with_shear(aff)
    o = d["orientation"]
    assert np.allclose(d["scale"], np.linalg.norm(aff[:3, :3], axis=0))
    assert abs(np.dot(o[:, 0], o[:, 1])) < 1e-10
    assert d["shear"][0] > 0  # xy shear detected


def test_nifti_roundtrip_and_scaling(tmp_path):
    arr = (np.arange(3 * 4 * 5).reshape(3, 4, 5) % 200).astype("int16")
    aff = np.diag([2.0, 2.0, 3.0, 1.0])
    p = tmp_path / "a.nii"
    write_nifti(p, arr, aff, scl_slope=2.0, scl_inter=1.0, cal_min=5.0, cal_max=90.0)
    img = read_nifti(p)
    assert img.data.shape == (3, 4, 5)
    assert np.array_equal(img.data, arr)
    assert img.scl_slope == 2.0 and img.scl_inter == 1.0
    omero = extract_omero_metadata(img)
    assert omero is not None
    win = omero.channels[0].window
    assert win.start == 5.0 and win.end == 90.0
    assert win.min == float(arr.min()) and win.max == float(arr.max())


def test_nifti2_roundtrip(tmp_path):
    """NIfTI-2 (540-byte header, 'n+2' magic, 8-byte dims, double
    geometry): write → read roundtrip preserves voxels, affine, scaling
    and calibration exactly (doubles, unlike NIfTI-1's float32
    fields)."""
    arr = (np.arange(4 * 3 * 2).reshape(4, 3, 2) % 100).astype("float64")
    aff = np.diag([1.25, 2.5, 3.75, 1.0])
    aff[:3, 3] = (0.125, -0.25, 0.5)
    p = tmp_path / "two.nii.gz"
    write_nifti(p, arr, aff, scl_slope=2.0, scl_inter=1.0,
                cal_min=5.0, cal_max=90.0, version=2)
    img = read_nifti(p)
    assert np.array_equal(img.data, arr)
    assert np.array_equal(img.affine, aff)  # exact: v2 stores doubles
    assert img.scl_slope == 2.0 and img.scl_inter == 1.0
    assert img.cal_min == 5.0 and img.cal_max == 90.0


def test_nifti2_bad_magic_rejected(tmp_path):
    arr = np.zeros((2, 2, 2), dtype="uint8")
    p = tmp_path / "bad.nii"
    write_nifti(p, arr, version=2)
    raw = bytearray(p.read_bytes())
    raw[4:12] = b"n+9\x00\r\n\x1a\n"
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="magic"):
        read_nifti(p)


def test_nifti_big_endian_read(tmp_path):
    """Header version detection swaps byte order off sizeof_hdr: a
    big-endian NIfTI-1 file reads identically to its little-endian
    twin (the reference inherits this from nibabel)."""
    import struct as _struct

    arr = np.arange(2 * 3 * 4, dtype="int16").reshape(2, 3, 4)
    hdr = bytearray(348)
    _struct.pack_into(">i", hdr, 0, 348)
    _struct.pack_into(">8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    _struct.pack_into(">h", hdr, 70, 4)  # int16
    _struct.pack_into(">h", hdr, 72, 16)
    _struct.pack_into(">8f", hdr, 76, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    _struct.pack_into(">f", hdr, 108, 352.0)
    _struct.pack_into(">2h", hdr, 252, 0, 1)
    _struct.pack_into(">12f", hdr, 280, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0)
    hdr[344:348] = b"n+1\x00"
    p = tmp_path / "be.nii"
    p.write_bytes(
        bytes(hdr) + b"\x00" * 4
        + np.asfortranarray(arr.astype(">i2")).tobytes(order="F")
    )
    img = read_nifti(p)
    assert np.array_equal(img.data, arr)
    assert np.array_equal(img.affine, np.eye(4))


def test_nifti_slope_zero_defaults(tmp_path):
    arr = np.zeros((2, 2, 2), dtype="uint8")
    p = tmp_path / "b.nii.gz"
    write_nifti(p, arr, scl_slope=0.0)  # nibabel rule: slope 0 → 1.0
    img = read_nifti(p)
    assert img.scl_slope == 1.0 and img.scl_inter == 0.0
    assert extract_omero_metadata(img) is None  # cal_min == cal_max == 0


def test_nifti_axcodes_ras_and_flipped():
    assert affine_axcodes(np.eye(4)) == {
        "x": "left-to-right",
        "y": "posterior-to-anterior",
        "z": "inferior-to-superior",
    }
    flipped = np.diag([-1.0, 1.0, -1.0, 1.0])
    codes = affine_axcodes(flipped)
    assert codes["x"] == "right-to-left"
    assert codes["z"] == "superior-to-inferior"


def test_nifti_to_ngff_image_scaled_data(spark, tmp_path):
    arr = np.arange(8, dtype="uint8").reshape(2, 2, 2)
    p = tmp_path / "c.nii"
    write_nifti(p, arr, scl_slope=3.0, scl_inter=0.5)
    img = nifti_to_ngff_image(spark, p)
    assert img.dtype == "float32"  # scaling forces float32
    vals = {
        (r.x, r.y, r.z): r.v for r in img.data.collect()
    }
    assert vals[(1, 1, 1)] == pytest.approx(7 * 3.0 + 0.5)


@pytest.mark.parametrize("dtype", ["uint8", "uint16"])
def test_png_roundtrip_gray(dtype):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, np.iinfo(dtype).max, (13, 17)).astype(dtype)
    assert np.array_equal(png_decode(png_encode(arr)), arr)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (9, 11, 3)).astype("uint8")
    assert np.array_equal(png_decode(png_encode(arr)), arr)


def test_png_filters_decode():
    """Filtered scanlines (Sub/Up/Average/Paeth) decode correctly: build
    a PNG by hand with each filter type."""
    import struct
    import zlib

    from ngff_zarr_spark.ingest.png import _SIG, _chunk

    rows = np.array(
        [[10, 20, 30, 40], [15, 25, 35, 45], [12, 22, 32, 42], [9, 19, 29, 39], [1, 2, 3, 4]],
        dtype=np.uint8,
    )
    # encode with filters: 0 none, 1 sub, 2 up, 3 average, 4 paeth
    enc = bytearray()
    prev = np.zeros(4, np.int32)
    for i, f in enumerate([0, 1, 2, 3, 4]):
        line = rows[i].astype(np.int32)
        out = np.zeros(4, np.int32)
        for j in range(4):
            a = line[j - 1] if j >= 1 else 0
            b = prev[j]
            c = prev[j - 1] if j >= 1 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[j] = (line[j] - pred) & 0xFF
        enc += bytes([f]) + bytes(out.astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0)
    png = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes(enc))) + _chunk(b"IEND", b"")
    assert np.array_equal(png_decode(png), rows)


@pytest.mark.parametrize("dtype", ["uint8", "uint16"])
def test_tiff_roundtrip_gray(dtype):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, np.iinfo(dtype).max, (21, 15)).astype(dtype)
    assert np.array_equal(tiff_decode(tiff_encode(arr)), arr)


def test_tiff_roundtrip_rgb():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (7, 9, 3)).astype("uint8")
    assert np.array_equal(tiff_decode(tiff_encode(arr)), arr)


def test_itk_adapters_roundtrip(spark):
    from ngff_zarr_spark.ingest.itk import (
        itk_image_to_ngff_image,
        ngff_image_to_itk_image,
    )

    arr = (np.arange(2 * 3 * 4) % 100).astype("uint8").reshape(2, 3, 4)
    itk_img = {
        "data": arr,
        "imageType": {"dimension": 3, "componentType": "uint8", "components": 1},
        "spacing": [0.5, 0.6, 0.7],   # ITK order: x, y, z
        "origin": [1.0, 2.0, 3.0],
        "name": "vol",
    }
    img = itk_image_to_ngff_image(spark, itk_img)
    assert img.dims == ["z", "y", "x"]
    # reversed into dim order: x gets ITK spacing[0]
    assert img.scale == {"z": 0.7, "y": 0.6, "x": 0.5}
    assert img.translation == {"z": 3.0, "y": 2.0, "x": 1.0}
    assert img.axes_orientations == {
        "z": "inferior-to-superior",
        "y": "anterior-to-posterior",
        "x": "right-to-left",
    }  # LPS
    back = ngff_image_to_itk_image(img)
    assert np.array_equal(back["data"], arr)
    assert back["spacing"] == [0.5, 0.6, 0.7]
    assert back["origin"] == [1.0, 2.0, 3.0]
    assert back["imageType"]["componentType"] == "uint8"
    assert back["size"] == [4, 3, 2]  # x, y, z


def test_itk_vector_image_dims(spark):
    from ngff_zarr_spark.ingest.itk import itk_image_to_ngff_image

    arr = np.zeros((5, 6, 3), dtype="float32")
    itk_img = {
        "data": arr,
        "imageType": {"dimension": 2, "componentType": "float32", "components": 3},
        "spacing": [1.0, 1.0],
        "origin": [0.0, 0.0],
    }
    img = itk_image_to_ngff_image(spark, itk_img)
    assert img.dims == ["y", "x", "c"]


def test_rfc4_axis_dict_helpers():
    from ngff_zarr_spark.rfc4 import (
        LPS,
        add_anatomical_orientation_to_axis,
        remove_anatomical_orientation_from_axis,
        validate_axis_orientation,
    )

    ax = {"name": "x", "type": "space"}
    add_anatomical_orientation_to_axis(ax, LPS["x"])
    assert ax["orientation"] == {"type": "anatomical", "value": "right-to-left"}
    assert validate_axis_orientation(ax) == []
    bad = {"name": "t", "type": "time", "orientation": {"type": "anatomical", "value": "nope"}}
    problems = validate_axis_orientation(bad)
    assert len(problems) == 2
    remove_anatomical_orientation_from_axis(ax)
    assert "orientation" not in ax


# ---------------------------------------------------------------- WAV


def test_wav_roundtrip_mono_int16():
    from ngff_zarr_spark.ingest.wav import wav_decode, wav_encode

    w = ((np.arange(100) * 13 + 37) % 2048).astype("<i2")
    dec, rate = wav_decode(wav_encode(w, 8000))
    assert rate == 8000 and dec.dtype == np.int16
    assert (dec == w).all()


def test_wav_roundtrip_stereo_and_depths():
    from ngff_zarr_spark.ingest.wav import wav_decode, wav_encode

    w = ((np.arange(64) * 7 + 5) % 251).astype("<i2")
    s = np.stack([w, w[::-1]], axis=1)
    dec, _ = wav_decode(wav_encode(s, 44100))
    assert dec.shape == (64, 2) and (dec == s).all()
    u = (np.arange(33) % 251).astype("u1")  # odd data size -> pad byte
    enc = wav_encode(u, 16000)
    assert len(enc) % 2 == 0
    dec8, r = wav_decode(enc)
    assert r == 16000 and (dec8 == u).all()
    i32 = (np.arange(50) * 100001 - 2**30).astype("<i4")
    dec32, _ = wav_decode(wav_encode(i32, 48000))
    assert (dec32 == i32).all()


def test_wav_extensible_and_junk_chunks():
    import struct

    from ngff_zarr_spark.ingest.wav import wav_decode

    w = ((np.arange(100) * 13 + 37) % 2048).astype("<i2")
    data = w.tobytes()
    # WAVE_FORMAT_EXTENSIBLE wrapping PCM
    body = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        + struct.pack("<HHI", 22, 16, 0)
        + struct.pack("<H", 1) + b"\x00" * 14
    )
    blob = b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8 + len(data)) + b"WAVE"
    blob += b"fmt " + struct.pack("<I", len(body)) + body
    blob += b"data" + struct.pack("<I", len(data)) + data
    dec, rate = wav_decode(blob)
    assert rate == 8000 and (dec == w).all()
    # unknown odd-sized chunk before fmt is skipped with even padding
    blob2 = b"RIFF" + struct.pack("<I", 0) + b"WAVE"
    blob2 += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    blob2 += b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 16000, 2, 16
    )
    blob2 += b"data" + struct.pack("<I", len(data)) + data
    dec2, _ = wav_decode(blob2)
    assert (dec2 == w).all()


def test_wav_rejects_non_pcm_and_bad_magic():
    import struct

    from ngff_zarr_spark.ingest.wav import wav_decode

    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"\x00" * 44)
    blob = b"RIFF" + struct.pack("<I", 0) + b"WAVE"
    blob += b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 3, 1, 8000, 32000, 4, 32  # IEEE float
    )
    blob += b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="format tag"):
        wav_decode(blob)


def test_wav_ingest_via_cli(spark, tmp_path):
    from ngff_zarr_spark.ingest import cli_input_to_ngff_image
    from ngff_zarr_spark.ingest.wav import wav_encode

    w = ((np.arange(40) * 13 + 37) % 2048).astype("<i2")
    s = np.stack([w, (w * 2) % 2048], axis=1)
    p = tmp_path / "clip.wav"
    p.write_bytes(wav_encode(s, 8000))
    backend = detect_cli_io_backend([str(p)])
    assert backend == ConversionBackend.IMAGEIO  # unknown-extension fallback
    img = cli_input_to_ngff_image(spark, backend, [str(p)])
    assert img.dims == ["c", "x"] and img.dtype == "int16"
    got = {(r.c, r.x): r.v for r in img.data.collect()}
    for ch in range(2):
        for i in range(40):
            assert got[(ch, i)] == s[i, ch]
