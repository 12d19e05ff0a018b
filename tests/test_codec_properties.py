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
