"""Chunk-local Gaussian kernel (operators/kernels.py) equivalence tests.

The applyInPandas halo-exchange path must be bit-identical to the
window-function form under fixed-point weights (both are exact integer
convolutions with 'nearest' edge replication), for any chunking —
including chunks smaller than the kernel radius' reach and 5-D inputs
where t/c planes are independent groups.
"""

from __future__ import annotations

import pytest

from ngff_zarr_spark.fixtures import IMG5D, ImageSpec, pixel_df
from ngff_zarr_spark.operators.gaussian import gaussian_downsample
from ngff_zarr_spark.operators.kernels import gaussian_downsample_chunked

SMALL = ImageSpec("ksmall", z=12, y=21, x=17)


def _same(a, b) -> bool:
    if a.count() != b.count():
        return False
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


@pytest.mark.parametrize(
    "factors,chunks",
    [
        ({"z": 2, "y": 2, "x": 2}, {"z": 8, "y": 8, "x": 8}),
        ({"z": 2, "y": 2, "x": 2}, {"z": 5, "y": 7, "x": 6}),  # radius > chunk gaps
        ({"z": 1, "y": 2, "x": 2}, {"z": 4, "y": 8, "x": 8}),  # anisotropic
        ({"z": 4, "y": 4, "x": 4}, {"z": 8, "y": 8, "x": 8}),  # larger sigma/radius
    ],
)
def test_chunked_matches_window_fixed_point(spark, factors, chunks):
    df = pixel_df(spark, SMALL)
    want = gaussian_downsample(df, SMALL.shape, factors, fixed_point_bits=8)
    got = gaussian_downsample_chunked(
        df, SMALL.shape, factors, chunks=chunks, fixed_point_bits=8
    )
    assert _same(want, got)


def test_chunked_5d_groups(spark):
    factors = {"z": 2, "y": 2, "x": 2}
    df = pixel_df(spark, IMG5D)
    want = gaussian_downsample(df, IMG5D.shape, factors, fixed_point_bits=8)
    got = gaussian_downsample_chunked(
        df, IMG5D.shape, factors, chunks={"z": 8, "y": 16, "x": 16}, fixed_point_bits=8
    )
    assert _same(want, got)


def test_chunked_float_close(spark):
    """Float weights: same values to ~1e-9 (summation order differs)."""
    from pyspark.sql import functions as F

    factors = {"z": 2, "y": 2, "x": 2}
    df = pixel_df(spark, SMALL)
    w = gaussian_downsample(df, SMALL.shape, factors).withColumnRenamed("v", "vw")
    g = gaussian_downsample_chunked(
        df, SMALL.shape, factors, chunks={"z": 8, "y": 8, "x": 8}
    ).withColumnRenamed("v", "vg")
    joined = w.join(g, ["t", "c", "z", "y", "x"])
    n = joined.count()
    assert n == w.count() == g.count()
    bad = joined.filter(F.abs(F.col("vw") - F.col("vg")) > 1e-9).count()
    assert bad == 0
