"""Downsample/slicing operators vs independent numpy reimplementation on
a small deterministic volume (mirrors the reference's synthetic-array
unit-test style, py/test/test_to_multiscales.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
from ngff_zarr_spark.operators import (
    bin_shrink,
    gaussian_downsample,
    mode_downsample,
    nearest,
    roi,
)

SPEC = ImageSpec("t_small", z=9, y=10, x=11)  # odd dims exercise floor crop


def _np_volume(spec):
    t, c = 0, 0
    zz, yy, xx = np.meshgrid(
        np.arange(spec.z), np.arange(spec.y), np.arange(spec.x), indexing="ij"
    )
    return (t * 97 + c * 131 + zz * 73 + yy * 179 + xx * 283) % 251


def _collect_map(df):
    return {
        (r["z"], r["y"], r["x"]): r["v"]
        for r in df.collect()
    }


def test_fixture_matches_numpy(spark):
    vol = _np_volume(SPEC)
    got = _collect_map(pixel_df(spark, SPEC))
    assert len(got) == SPEC.n
    for (z, y, x), v in list(got.items())[:200]:
        assert v == vol[z, y, x]


def test_bin_shrink_matches_numpy(spark):
    vol = _np_volume(SPEC).astype(np.float64)
    f = {"z": 2, "y": 2, "x": 2}
    cz, cy, cx = 8, 10, 10  # floor-cropped extents
    cropped = vol[:cz, :cy, :cx]
    expected = cropped.reshape(cz // 2, 2, cy // 2, 2, cx // 2, 2).mean(axis=(1, 3, 5))
    got = _collect_map(bin_shrink(pixel_df(spark, SPEC), SPEC.shape, f))
    assert len(got) == expected.size
    for (z, y, x), v in got.items():
        assert v == pytest.approx(expected[z, y, x])


def test_nearest_matches_numpy(spark):
    vol = _np_volume(SPEC)
    f = {"z": 2, "y": 2, "x": 2}
    expected = vol[:8:2, :10:2, :10:2]
    got = _collect_map(nearest(pixel_df(spark, SPEC), SPEC.shape, f))
    assert len(got) == expected.size
    for (z, y, x), v in got.items():
        assert v == expected[z, y, x]


def test_mode_smallest_tie(spark):
    """2x2 blocks of all-distinct values must pick the smallest value
    (np.unique-argmax tie semantics)."""
    spec = ImageSpec("tie", y=4, x=4)
    df = pixel_df(spark, spec, label=True)
    got = mode_downsample(df, spec.shape, {"z": 1, "y": 2, "x": 2})
    rows = {(r["y"], r["x"]): r["v"] for r in got.collect()}
    vol = np.zeros((4, 4), dtype=int)
    for yy in range(4):
        for xx in range(4):
            vol[yy, xx] = (yy * 179 + xx * 283) % 5
    for (by, bx), v in rows.items():
        block = vol[by * 2:by * 2 + 2, bx * 2:bx * 2 + 2].ravel()
        vals, counts = np.unique(block, return_counts=True)
        assert v == vals[np.argmax(counts)]


def test_gaussian_downsample_shape_and_dtype(spark):
    out = gaussian_downsample(pixel_df(spark, SPEC), SPEC.shape, {"z": 2, "y": 2, "x": 2})
    rows = out.collect()
    assert len(rows) == 4 * 5 * 5
    # float path: normalized weights keep values within the input range
    vals = [r["v"] for r in rows]
    assert min(vals) >= 0 and max(vals) <= 250


def test_roi_pushdown_plan(spark):
    """The ROI filter must survive to the scan (no post-shuffle filter)."""
    df = roi(pixel_df(spark, SPEC), z=(0, 2))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan
    assert df.count() == 2 * SPEC.y * SPEC.x
