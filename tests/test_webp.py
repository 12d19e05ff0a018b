"""Native VP8L codec (ingest/webp.py) vs libwebp.

The decoder is validated bit-exactly against real libwebp-encoded
streams (which exercise subtract-green, predictor tiles, color
transforms, color-indexing with pixel bundling, color cache, LZ77 with
the 2D distance map, and meta prefix codes), and the encoder's output
is validated by having libwebp decode it. libwebp is used ONLY as a
test oracle via ctypes; the shipped codec is stdlib+numpy.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from ngff_zarr_spark.ingest.webp import webp_decode, webp_encode


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="libwebp not available")


def _enc_ref(rgb):
    h, w = rgb.shape[:2]
    rgba = np.ascontiguousarray(np.dstack([rgb, np.full((h, w), 255, np.uint8)]))
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeLosslessRGBA(rgba.tobytes(), w, h, w * 4, ctypes.byref(out))
    assert n > 0
    data = bytes(bytearray(out[i] for i in range(n)))
    _LIB.WebPFree(out)
    return data


def _dec_ref(data):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    arr = np.frombuffer(
        bytearray(p[i] for i in range(w.value * h.value * 4)), dtype=np.uint8
    ).reshape(h.value, w.value, 4)
    _LIB.WebPFree(p)
    return arr


def _ref_cases():
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:64, 0:64]
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    tile = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    photo = (np.cumsum(rng.integers(-3, 4, (96, 96, 3)), axis=1) % 256).astype(np.uint8)
    return {
        "flat": np.full((16, 16, 3), 77, np.uint8),
        "two_color_bundled": np.array([[0, 0, 0], [255, 255, 255]], np.uint8)[
            rng.integers(0, 2, (21, 30))
        ],
        "palette7": pal[rng.integers(0, 7, (33, 29))],
        "gradient_predictor": np.stack(
            [(yy * 2) % 256, (xx * 3) % 256, (yy + xx) % 256], -1
        ).astype(np.uint8),
        "random_small": rng.integers(0, 256, (4, 5, 3), dtype=np.uint8),
        "random_big": rng.integers(0, 256, (40, 53, 3), dtype=np.uint8),
        "tiled_lz77": np.tile(tile, (8, 8, 1)),
        "photo_meta": photo,
    }


@needs_libwebp
@pytest.mark.parametrize("name", list(_ref_cases()))
def test_decode_libwebp_streams(name):
    img = _ref_cases()[name]
    got = webp_decode(_enc_ref(img))
    if got.ndim == 2:
        got = np.stack([got] * 3, -1)
    assert got.shape == img.shape
    assert np.array_equal(got, img)


@needs_libwebp
@pytest.mark.parametrize(
    "shape,sg,rle",
    [
        ((13, 17), False, False),
        ((13, 17), True, False),
        ((24, 31, 3), False, False),
        ((24, 31, 3), True, True),
        ((9, 9), False, True),
    ],
)
def test_libwebp_decodes_our_streams(shape, sg, rle):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    if rle:
        a[::2] = a[0, 0] if a.ndim == 2 else a[0, 0, :]
    data = webp_encode(a, subtract_green=sg, rle=rle)
    ref = _dec_ref(data)
    assert ref is not None, "libwebp rejected our stream"
    want = np.stack([a] * 3, -1) if a.ndim == 2 else a
    assert (ref[..., :3] == want).all() and (ref[..., 3] == 255).all()


def test_self_roundtrips():
    rng = np.random.default_rng(6)
    for shape, sg, rle in [
        ((11, 23), False, False),
        ((11, 23), True, True),
        ((17, 13, 3), True, False),
        ((17, 13, 3), False, True),
    ]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        if rle:
            a[1::2] = a[0, 0] if a.ndim == 2 else a[0, 0, :]
        assert np.array_equal(webp_decode(webp_encode(a, subtract_green=sg, rle=rle)), a)


def test_lossy_vp8_rejected():
    fake = b"RIFF" + b"\x10\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x04\x00\x00\x00" + b"\x00" * 4
    with pytest.raises(ValueError, match="lossy"):
        webp_decode(fake)


def test_not_webp_rejected():
    with pytest.raises(ValueError, match="magic"):
        webp_decode(b"NOTWEBP" + b"\x00" * 20)


def test_plane_code_table_shape():
    from ngff_zarr_spark.ingest.webp import _PLANE

    assert len(_PLANE) == 120
    assert _PLANE[0] == (0, 1)   # pixel above
    assert _PLANE[1] == (1, 0)   # previous pixel
    assert all(-7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in _PLANE)


def test_series_scan_decodes_webp(spark, tmp_path):
    from pyspark.sql import functions as F

    from ngff_zarr_spark.ingest.series import series_to_pixel_df

    nz, h, w = 3, 9, 11
    yi, xi = np.indices((h, w))
    for z in range(nz):
        arr = ((z * 73 + yi * 179 + xi * 283) % 251).astype(np.uint8)
        (tmp_path / f"s_{z:02d}.webp").write_bytes(webp_encode(arr))
    df = series_to_pixel_df(spark, str(tmp_path / "s_*.webp"))
    row = df.groupBy().agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()[0]
    zi, yi2, xi2 = np.indices((nz, h, w))
    expect = ((zi * 73 + yi2 * 179 + xi2 * 283) % 251).sum()
    assert row["n"] == nz * h * w and int(row["s"]) == int(expect)


def test_webp_gate_matches_oracle(spark):
    import duckdb

    from ngff_zarr_spark import gate, oracle

    df = gate.queries()["s11_webp_ingest"](spark, "/root/testdata/sf0.001")
    got = df.orderBy("y", "x").toPandas()
    exp = duckdb.sql(oracle.oracles()["s11_webp_ingest"] + " ORDER BY y, x").df()
    assert (got["v"].to_numpy() == exp["v"].to_numpy()).all() and len(got) == len(exp)
