"""Gaussian smoothing + downsample (SURVEY.md A1/A4/A6) as separable
1-D window convolutions — pure Catalyst, whole-stage-codegen'd.

The reference blurs with a discrete Gaussian (sigma from
plans.planner.compute_sigma) then subsamples at the grid stride; edge
handling is 'nearest' replication (boundary="nearest" at
/root/reference py/ngff_zarr/methods/_itkwasm.py:202-216, mode="nearest"
at methods/_dask_image.py:165,184).

Spark formulation per axis (separability — a 3-D Gaussian is the product
of three 1-D kernels):

    v' = w0*v + sum_{k=1..r} wk * (nbr(-k) + nbr(+k))
    nbr(±k) = coalesce(lag/lead(v, k) over (partition by <other dims>
              order by axis), first/last_value over the full line)

The coalesce-to-edge-value implements 'nearest' replication exactly: a
clamped coordinate always lands on the first/last pixel of the line.

Each axis pass is one exchange+sort on (other-dims, axis). At 100 TB the
sort key is the dense pixel grid — perfectly uniform, and each partition
line is tiny (one image row), so AQE packs many lines per task. For
chunk-local execution without the per-axis sort, the same kernel runs as
an Arrow ``applyInPandas`` with halo exchange (operators/kernels.py);
this window form is the SQL-checkable reference semantics.

Weights: ``sampled_weights`` gives float weights (production);
``fixed_point_weights`` quantizes to integers (default 8 bits per axis)
so the DuckDB oracle comparison is exact in any evaluation order —
integer products stay < 2^53 for 3 axis passes on uint8-range data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPATIAL = ("z", "y", "x")
ALL_DIMS = ("t", "c", "z", "y", "x")


def kernel_radius(sigma: float, truncate: float = 4.0) -> int:
    """Kernel half-width. Mirrors the scipy/dask-image convention the
    reference uses (radius = truncate * sigma, rounded) with a minimum
    of 1 (reference clamps via _get_truncate search,
    methods/_dask_image.py:68-104)."""
    return max(1, int(truncate * float(sigma) + 0.5))


def sampled_weights(sigma: float, radius: int) -> list[float]:
    """Sampled-and-normalized Gaussian, w[0..radius] (symmetric half).
    Self-consistent semantics; ITK's discrete-Gaussian (modified Bessel)
    weights differ slightly — bit-parity with ITK golden stores would
    swap in the Bessel weights here without changing the plan shape."""
    w = [math.exp(-(k * k) / (2.0 * sigma * sigma)) for k in range(radius + 1)]
    total = w[0] + 2.0 * sum(w[1:])
    return [x / total for x in w]


def fixed_point_weights(sigma: float, radius: int, bits: int = 8) -> list[int]:
    """Integer-quantized weights (scale 2^bits). Both engines compute the
    *same* integer convolution → exact hash match."""
    w = sampled_weights(sigma, radius)
    return [max(1, round(x * (1 << bits))) for x in w]


def _axis_pass(df: DataFrame, axis: str, weights: list[float | int]) -> DataFrame:
    """One separable 1-D convolution along ``axis`` with nearest-edge
    replication. ``weights[0]`` is the center tap."""
    others = [d for d in ALL_DIMS if d != axis]
    line = Window.partitionBy(*others).orderBy(axis)
    full = line.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    first = F.first("v").over(full)
    last = F.last("v").over(full)
    acc = F.lit(weights[0]) * F.col("v")
    for k in range(1, len(weights)):
        left = F.coalesce(F.lag("v", k).over(line), first)
        right = F.coalesce(F.lead("v", k).over(line), last)
        acc = acc + F.lit(weights[k]) * (left + right)
    return df.select(*ALL_DIMS, acc.alias("v"))


def kernel_weights(
    sigma: float,
    kernel: str = "sampled",
    truncate: float = 4.0,
    fixed_point_bits: int | None = None,
) -> list[float | int]:
    """Half-kernel for one axis. ``kernel``:
    - 'sampled': sampled-and-normalized continuous Gaussian (the
      scipy/dask-image convention — DASK_IMAGE_GAUSSIAN parity);
    - 'itk_bessel': ITK's discrete Gaussian, exp(-σ²)·I_k(σ²) modified-
      Bessel coefficients with error-capped width (ITK_GAUSSIAN /
      ITKWASM_GAUSSIAN parity; operators/itk_gaussian.py)."""
    if kernel == "itk_bessel":
        from .itk_gaussian import itk_gaussian_kernel

        w = itk_gaussian_kernel(sigma)
    elif kernel == "sampled":
        w = sampled_weights(sigma, kernel_radius(sigma, truncate))
    else:
        raise ValueError(f"Unknown gaussian kernel {kernel!r}")
    if fixed_point_bits is not None:
        return [max(1, round(x * (1 << fixed_point_bits))) for x in w]
    return w


def gaussian_blur(
    df: DataFrame,
    sigmas: dict[str, float],
    fixed_point_bits: int | None = None,
    truncate: float = 4.0,
    kernel: str = "sampled",
) -> DataFrame:
    """Separable Gaussian blur; one axis pass per spatial dim with
    sigma > 0. With ``fixed_point_bits`` set, uses integer weights and
    returns the un-normalized integer response (scaled by
    2^(bits * n_passes)) — the oracle-checkable form."""
    for axis in SPATIAL:
        sigma = float(sigmas.get(axis, 0.0))
        if sigma <= 0.0:
            continue
        weights = kernel_weights(sigma, kernel, truncate, fixed_point_bits)
        df = _axis_pass(df, axis, weights)
    return df


def gaussian_downsample(
    df: DataFrame,
    shape: dict[str, int],
    factors: dict[str, int],
    fixed_point_bits: int | None = None,
    kernel: str = "sampled",
) -> DataFrame:
    """A1/A4/A6 composite: anti-alias blur at the sigma implied by the
    shrink factors, then stride subsample (order-1 interpolation at exact
    grid points is a point sample — SURVEY.md A6 note). ``kernel`` picks
    the weight function per method tag (sampled ↔ dask-image,
    itk_bessel ↔ ITK/ITK-Wasm)."""
    from ..plans.planner import compute_sigma
    from .downsample import nearest

    spatial = [d for d in SPATIAL if factors.get(d, 1) > 1]
    sigmas = dict(zip(spatial, compute_sigma([factors[d] for d in spatial])))
    blurred = gaussian_blur(df, sigmas, fixed_point_bits=fixed_point_bits, kernel=kernel)
    return nearest(blurred, shape, factors)
