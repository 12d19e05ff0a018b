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


def test_label_downsample_matches_independent_numpy(spark):
    """A3 third implementation: per-block center-voxel votes (odd f →
    one center, even f → the two central voxels per dim) with argmax
    count and smallest-label tie-break, written as plain nested numpy —
    no shared code with the engine's filter + max_by aggregate."""
    from collections import Counter

    from ngff_zarr_spark.fixtures import IMG2D_LABEL
    from ngff_zarr_spark.operators.downsample import label_downsample

    spec = IMG2D_LABEL
    arr = np.zeros((spec.y, spec.x), dtype=np.int64)
    for r in pixel_df(spark, spec, label=True).collect():
        arr[r.y, r.x] = int(r.v)

    fy = fx = 4
    offs = lambda f: [(f - 1) // 2] if f % 2 else [f // 2 - 1, f // 2]
    ny, nx = spec.y // fy, spec.x // fx
    expected = np.zeros((ny, nx), dtype=np.int64)
    for by in range(ny):
        for bx in range(nx):
            votes = Counter(
                arr[by * fy + oy, bx * fx + ox]
                for oy in offs(fy)
                for ox in offs(fx)
            )
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            expected[by, bx] = best[0]

    out = label_downsample(
        pixel_df(spark, spec, label=True), spec.shape, {"y": fy, "x": fx}
    )
    got = np.zeros((ny, nx), dtype=np.int64)
    seen = 0
    for r in out.collect():
        got[r.y, r.x] = int(r.v)
        seen += 1
    assert seen == ny * nx
    assert np.array_equal(got, expected)


def test_mode_centered_matches_independent_numpy(spark):
    """A8 centered form, third implementation: literal
    generic_filter(size=f, mode='nearest')-at-stride-f semantics as
    nested numpy loops (offset window [-(f//2), f-1-f//2] with index
    clamping, mode with smallest-value tie-break) — independent of the
    engine's broadcast window-map + weighted max_by construction."""
    from collections import Counter

    from ngff_zarr_spark.fixtures import IMG2D_LABEL
    from ngff_zarr_spark.operators.downsample import mode_downsample_centered

    spec = IMG2D_LABEL
    arr = np.zeros((spec.y, spec.x), dtype=np.int64)
    for r in pixel_df(spark, spec, label=True).collect():
        arr[r.y, r.x] = int(r.v)

    f = 4
    half = f // 2
    ny, nx = spec.y // f, spec.x // f
    expected = np.zeros((ny, nx), dtype=np.int64)
    for by in range(ny):
        for bx in range(nx):
            votes = Counter(
                arr[
                    min(max(by * f + dy, 0), spec.y - 1),
                    min(max(bx * f + dx, 0), spec.x - 1),
                ]
                for dy in range(-half, f - half)
                for dx in range(-half, f - half)
            )
            expected[by, bx] = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]

    out = mode_downsample_centered(
        pixel_df(spark, spec, label=True), spec.shape, {"y": f, "x": f}
    )
    got = np.zeros((ny, nx), dtype=np.int64)
    seen = 0
    for r in out.collect():
        got[r.y, r.x] = int(r.v)
        seen += 1
    assert seen == ny * nx
    assert np.array_equal(got, expected)
