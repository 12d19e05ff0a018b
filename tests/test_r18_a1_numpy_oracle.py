"""A1 third-implementation cross-check (r18).

The A1/A4/A6 evidence chain is: chunked halo kernel ≡ window-function
form (bit-equal, tests/test_kernels.py) ≡ DuckDB oracle (a1 gates).
This adds a THIRD independent derivation — a direct numpy reference
built from np.pad(mode='edge') and per-tap slice shifts, sharing no
code path with either engine form (the chunked kernel uses 'valid'
slicing sums over halo-extended blocks; the window form uses
lag/lead + coalesce) — and pins bit-equality under fixed-point
arithmetic for both the sampled and ITK-Bessel kernels.
"""

from __future__ import annotations

import numpy as np
import pytest

from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
from ngff_zarr_spark.operators.gaussian import kernel_weights
from ngff_zarr_spark.operators.kernels import gaussian_downsample_chunked
from ngff_zarr_spark.plans.planner import compute_sigma

SPEC = ImageSpec("a1np", z=8, y=11, x=9)
BITS = 8


def _dense(spark, spec):
    arr = np.zeros((spec.z, spec.y, spec.x), dtype=np.int64)
    for r in pixel_df(spark, spec).collect():
        arr[r.z, r.y, r.x] = int(r.v)
    return arr


def _np_reference(arr, factors, kernel):
    """Direct numpy form: per-axis full-width convolution over an
    edge-padded copy, then stride subsample with floor-crop."""
    spatial = [d for d, f in factors.items() if f > 1]
    sigmas = dict(zip(spatial, compute_sigma([factors[d] for d in spatial])))
    out = arr.astype(np.int64)
    for axis, d in enumerate(("z", "y", "x")):
        if factors.get(d, 1) <= 1:
            continue
        w = kernel_weights(sigmas[d], kernel, 4.0, BITS)
        r = len(w) - 1
        pad = [(0, 0)] * 3
        pad[axis] = (r, r)
        ext = np.pad(out, pad, mode="edge")
        acc = np.zeros_like(out)
        n = out.shape[axis]

        def sl(lo):
            s = [slice(None)] * 3
            s[axis] = slice(lo, lo + n)
            return tuple(s)

        for k in range(-r, r + 1):
            acc = acc + int(w[abs(k)]) * ext[sl(r + k)]
        out = acc
    sel = tuple(
        slice(0, factors.get(d, 1) * (out.shape[i] // factors.get(d, 1)), factors.get(d, 1))
        for i, d in enumerate(("z", "y", "x"))
    )
    return out[sel]


@pytest.mark.parametrize("kernel", ["sampled", "itk_bessel"])
@pytest.mark.parametrize("factors", [
    {"z": 2, "y": 2, "x": 2},
    {"z": 1, "y": 2, "x": 2},
])
def test_chunked_matches_independent_numpy(spark, kernel, factors):
    expected = _np_reference(_dense(spark, SPEC), factors, kernel)
    got_df = gaussian_downsample_chunked(
        pixel_df(spark, SPEC), SPEC.shape, factors,
        chunks={"z": 4, "y": 6, "x": 5}, fixed_point_bits=BITS,
        kernel_weights_kind=kernel,
    )
    got = np.zeros(expected.shape, dtype=np.int64)
    seen = 0
    for r in got_df.collect():
        got[r.z, r.y, r.x] = int(r.v)
        seen += 1
    assert seen == expected.size
    assert np.array_equal(got, expected)
