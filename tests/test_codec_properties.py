"""Property-based codec tests (hypothesis): arbitrary arrays round-trip
through the blosc container, PNG, TIFF, and NIfTI codecs. Complements
the example-based tests with fuzzed shapes/dtypes/values — the codecs
are pure functions, exactly what property testing is for.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from ngff_zarr_spark.sources.blosc import blosc_compress, blosc_decompress

DTYPES = ["uint8", "uint16", "int16", "int32", "float32", "float64"]


@given(
    n=st.integers(0, 5000),
    dtype=st.sampled_from(DTYPES),
    cname=st.sampled_from(["lz4", "zstd", "zlib", "snappy"]),
    shuffle=st.sampled_from([0, 1]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_blosc_roundtrip_property(n, dtype, cname, shuffle, seed):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        arr = rng.normal(size=n).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, n, dtype=dtype)
    raw = arr.tobytes()
    enc = blosc_compress(raw, arr.dtype.itemsize, cname, 5, shuffle)
    assert blosc_decompress(enc) == raw


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    depth=st.sampled_from(["uint8", "uint16"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, depth, seed):
    from ngff_zarr_spark.ingest.png import png_decode, png_encode

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, np.iinfo(depth).max, (h, w), dtype=depth)
    assert np.array_equal(png_decode(png_encode(arr)), arr)


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    depth=st.sampled_from(["uint8", "uint16"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_property(h, w, depth, seed):
    from ngff_zarr_spark.ingest.tiff import tiff_decode, tiff_encode

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, np.iinfo(depth).max, (h, w), dtype=depth)
    assert np.array_equal(tiff_decode(tiff_encode(arr)), arr)


@given(
    nx=st.integers(1, 9),
    ny=st.integers(1, 9),
    nz=st.integers(1, 9),
    dtype=st.sampled_from(["uint8", "int16", "uint16", "float32"]),
    gz=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_nifti_roundtrip_property(tmp_path_factory, nx, ny, nz, dtype, gz, seed):
    from ngff_zarr_spark.ingest.nifti import read_nifti, write_nifti

    rng = np.random.default_rng(seed)
    if dtype == "float32":
        arr = rng.normal(size=(nx, ny, nz)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, (nx, ny, nz), dtype=dtype)
    p = tmp_path_factory.mktemp("nii") / ("a.nii.gz" if gz else "a.nii")
    write_nifti(p, arr)
    back = read_nifti(p)
    assert back.data.shape == (nx, ny, nz)
    assert np.array_equal(back.data, arr)


@given(
    ndim=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
    dtype=st.sampled_from(["uint8", "uint16", "int32", "float32", "float64"]),
    compressor=st.sampled_from([None, "gzip", "zlib", "zstd", "blosc:lz4:5:1", "blosc:zstd:3:0"]),
    separator=st.sampled_from([".", "/"]),
    zarr_format=st.sampled_from([2, 3]),
)
@settings(max_examples=40, deadline=None)
def test_store_array_roundtrip_property(tmp_path_factory, ndim, seed, dtype, compressor, separator, zarr_format):
    """Store-level property: arbitrary shapes/chunks (edge chunks
    included), any dtype x compressor x separator x zarr format, written
    chunk-by-chunk and read back exactly."""
    from ngff_zarr_spark.sources.zarr_store import ZarrArrayMeta, ZarrStore

    from hypothesis import assume

    # zarr v3 has no zlib codec (gzip covers it); engine writes v3
    # default key encoding with '/'
    assume(not (zarr_format == 3 and compressor == "zlib"))
    if zarr_format == 3:
        separator = "/"
    rng = np.random.default_rng(seed)
    shape = tuple(int(x) for x in rng.integers(1, 9, size=ndim))
    chunks = tuple(int(rng.integers(1, s + 1)) for s in shape)
    if np.dtype(dtype).kind == "f":
        arr = rng.normal(size=shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, size=shape).astype(dtype)
    root = tmp_path_factory.mktemp("prop_store")
    store = ZarrStore(str(root))
    meta = ZarrArrayMeta(
        path="a", shape=shape, chunks=chunks, dtype=np.dtype(dtype),
        compressor=compressor, zarr_format=zarr_format,
        dimension_separator=separator,
    )
    store.write_array_meta(meta)
    grid = meta.chunk_grid
    for flat in range(int(np.prod(grid))):
        idx = tuple(int(i) for i in np.unravel_index(flat, grid))
        o = meta.chunk_origin(idx)
        e = meta.chunk_extent(idx)
        store.write_chunk(meta, idx, arr[tuple(slice(a, a + b) for a, b in zip(o, e))])
    back_meta = store.read_array_meta("a", zarr_format)
    assert back_meta.dimension_separator == separator
    out = np.zeros(shape, dtype=np.dtype(dtype))
    for flat in range(int(np.prod(grid))):
        idx = tuple(int(i) for i in np.unravel_index(flat, grid))
        o = meta.chunk_origin(idx)
        e = meta.chunk_extent(idx)
        out[tuple(slice(a, a + b) for a, b in zip(o, e))] = store.read_chunk(back_meta, idx)
    np.testing.assert_array_equal(out, arr)


@given(
    gy=st.integers(1, 6),
    gx=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_block_constant_exact_property(gy, gx, seed):
    """The driver-gate invariant fuzzed: ANY per-8x8-block-constant
    grayscale image with a DC quantization step of 8 round-trips
    exactly through the baseline JPEG codec."""
    from ngff_zarr_spark.ingest.jpeg import STD_LUMA_QUANT, jpeg_decode, jpeg_encode

    rng = np.random.default_rng(seed)
    q = STD_LUMA_QUANT.copy()
    q[0, 0] = 8
    blocks = rng.integers(0, 256, (gy, gx), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    out = jpeg_decode(jpeg_encode(img, luma_quant=q))
    np.testing.assert_array_equal(out, img)


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_arbitrary_bounded_error_property(h, w, seed):
    """Arbitrary uint8 noise at arbitrary (incl. partial-block) sizes:
    decode must return the right shape and stay within a generous
    quantization-error envelope (noise is the worst case for DCT)."""
    from ngff_zarr_spark.ingest.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img))
    assert out.shape == img.shape and out.dtype == np.uint8


@given(
    h=st.integers(1, 30),
    w=st.integers(1, 30),
    rgb=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(h, w, rgb, seed):
    from ngff_zarr_spark.ingest.bmp import bmp_decode, bmp_encode

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(bmp_decode(bmp_encode(arr)), arr)


@given(
    ndim=st.integers(1, 3),
    dtype=st.sampled_from(DTYPES),
    encoding=st.sampled_from(["raw", "gzip"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_nrrd_roundtrip_property(ndim, dtype, encoding, seed):
    from ngff_zarr_spark.ingest.nrrd import nrrd_read, nrrd_write

    rng = np.random.default_rng(seed)
    shape = tuple(int(s) for s in rng.integers(1, 8, ndim))
    if np.dtype(dtype).kind == "f":
        arr = rng.normal(size=shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, shape, dtype=dtype)
    back, header = nrrd_read(nrrd_write(arr, encoding=encoding))
    np.testing.assert_array_equal(back, arr)
    assert header["sizes"] == list(reversed(shape))


@given(
    ndim=st.integers(1, 3),
    dtype=st.sampled_from(DTYPES),
    compressed=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_mha_roundtrip_property(ndim, dtype, compressed, seed):
    from ngff_zarr_spark.ingest.mha import mha_read, mha_write

    rng = np.random.default_rng(seed)
    shape = tuple(int(s) for s in rng.integers(1, 8, ndim))
    if np.dtype(dtype).kind == "f":
        arr = rng.normal(size=shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, shape, dtype=dtype)
    back, _ = mha_read(mha_write(arr, compressed=compressed))
    np.testing.assert_array_equal(back, arr)


# ---------------------------------------------------------------------------
# r8: GIF + WebP-VP8L property roundtrips (shape/feature fuzzing — the
# class of bug the r7 advisor found in jpeg_encode's non-aligned MCU
# path is exactly what these sweep for)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    interlace=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_gif_gray_roundtrip_property(h, w, interlace, seed):
    import numpy as np

    from ngff_zarr_spark.ingest.gif import gif_decode, gif_encode

    a = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(gif_decode(gif_encode(a, interlace=interlace)), a)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    n_colors=st.integers(1, 256),
    seed=st.integers(0, 2**32 - 1),
)
def test_gif_rgb_palette_roundtrip_property(h, w, n_colors, seed):
    import numpy as np

    from ngff_zarr_spark.ingest.gif import gif_decode, gif_encode

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, n_colors, (h, w))]
    out = gif_decode(gif_encode(img))
    if out.ndim == 2:  # accidental gray palette collapses — re-expand
        out = np.stack([out] * 3, -1)
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    rgb=st.booleans(),
    sg=st.booleans(),
    rle=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_webp_roundtrip_property(h, w, rgb, sg, rle, seed):
    import numpy as np

    from ngff_zarr_spark.ingest.webp import webp_decode, webp_encode

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    if rle and h > 1:  # seed some runs so the LZ77 path actually fires
        a[::2] = a[0]
    out = webp_decode(webp_encode(a, subtract_green=sg, rle=rle))
    if rgb and out.ndim == 2:  # r==g==b collapse on tiny images
        out = np.stack([out] * 3, -1)
    assert np.array_equal(out, a)


def test_codec_dimension_limits():
    import numpy as np
    import pytest as _pytest

    from ngff_zarr_spark.ingest.gif import gif_encode
    from ngff_zarr_spark.ingest.webp import webp_encode

    with _pytest.raises(ValueError, match="14-bit"):
        webp_encode(np.zeros((1, 16385), np.uint8))
    with _pytest.raises(ValueError, match="16-bit"):
        gif_encode(np.zeros((1, 65536), np.uint8))
