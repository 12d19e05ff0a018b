"""Pyramid planning: driver-side pure functions (no Spark jobs).

Behavioral parity with /root/reference:
- ``pyramid_scale_factors``      ↔ `_ngff_image_scale_factors`
  py/ngff_zarr/to_multiscales.py:45-79 (operator A9 in SURVEY.md §2.3)
- ``relative_dim_factors``       ↔ `_dim_scale_factors`
  py/ngff_zarr/methods/_support.py:107-123
- ``update_previous_dim_factors``↔ `_update_previous_dim_factors` :126-134
- ``compute_sigma``              ↔ `_compute_sigma` :159-181 (C1)
- ``next_scale_metadata``        ↔ `_next_scale_metadata` :191-212 (C2):
  scale_{i+1} = scale_i * f ; translation_{i+1} = translation_i
  + 0.5*(f-1)*scale_i  (pixel-center shift of the downsampled grid)
- ``next_block_shape``           ↔ `_next_block_shape` :215-230 — floor
  division: trailing partial blocks are DROPPED, which the downsample
  operators encode as a coordinate crop (operators/downsample.py).
- ``aligned_chunks``             ↔ `_align_chunks` :137-156 — chunk
  shapes must divide by the shrink factor so no block spans chunks; in
  Spark terms this picks the repartition grid before a chunk-wise kernel.

All functions run on metadata only — at 100 TB the planner cost is
independent of data size.
"""

from __future__ import annotations

import math

SPATIAL_DIMS = ("x", "y", "z")


def pyramid_scale_factors(
    shape: dict[str, int],
    min_length: int = 128,
    out_chunks: dict[str, int] | None = None,
) -> list[dict[str, int]]:
    """Plan per-level *cumulative* scale factors for a multiscale pyramid.

    Halve every spatial dim each level, except dims that (a) have fallen
    behind the largest dim by 2x or more (keeps anisotropic volumes from
    collapsing a thin axis), or (b) would drop below the chunk size.
    Stop when all spatial dims fit within 2 chunks, when remaining volume
    falls under ``2 * min_length``, or when no dim can shrink further.

    Returns e.g. ``[{'x': 2, 'y': 2, 'z': 1}, {'x': 4, 'y': 4, 'z': 2}]``.
    """
    if out_chunks is None:
        ndim_spatial = sum(1 for d in shape if d in SPATIAL_DIMS)
        default = 128 if ndim_spatial >= 3 else 256
        out_chunks = {d: (default if d in SPATIAL_DIMS else 1) for d in shape}

    sizes = {d: int(s) for d, s in shape.items() if d in SPATIAL_DIMS}
    if not sizes:
        return []
    previous = {d: 1 for d in sizes}
    factors: list[dict[str, int]] = []

    while any(sizes[d] > 2 * out_chunks[d] for d in sizes):
        largest = max(sizes.values())
        level: dict[str, int] = {}
        for d in sizes:
            lagging = sizes[d] <= largest / 2
            if lagging or sizes[d] / 2 < out_chunks[d]:
                level[d] = previous[d]
            else:
                level[d] = 2 * previous[d]
                sizes[d] = sizes[d] // 2
        volume = math.prod(sizes.values())
        if volume / min_length < 2 or level == previous:
            break
        factors.append(level)
        previous = level

    return factors


def relative_dim_factors(
    dims: list[str],
    scale_factor: int | dict[str, int],
    previous: dict[str, int],
) -> dict[str, int]:
    """Convert a cumulative per-level factor into the factor *relative to
    the previous level* (what one downsample step actually applies)."""
    if isinstance(scale_factor, int):
        return {d: scale_factor // previous[d] for d in dims if d in SPATIAL_DIMS}
    rel = {d: scale_factor[d] // previous[d] for d in scale_factor}
    for d in dims:
        rel.setdefault(d, 1)
    return rel


def update_previous_dim_factors(
    scale_factor: int | dict[str, int],
    spatial_dims: list[str],
    previous: dict[str, int],
) -> dict[str, int]:
    out = dict(previous)
    if isinstance(scale_factor, int):
        for d in spatial_dims:
            out[d] = scale_factor
    else:
        out.update(scale_factor)
    return out


def compute_sigma(shrink_factors: list[int]) -> list[float]:
    """Gaussian sigma (pixel units) for anti-aliased shrink by ``f``:
    sigma = sqrt((f^2 - 1) / (2*sqrt(2*ln 2))^2). See the scale-space
    sampling analysis in "Scale factor point 5" (UCL discovery 1469251)
    — same formula the reference cites."""
    denom = (2.0 * math.sqrt(2.0 * math.log(2.0))) ** 2
    return [math.sqrt((f * f - 1.0) / denom) for f in shrink_factors]


def next_scale_metadata(
    scale: dict[str, float],
    translation: dict[str, float],
    dim_factors: dict[str, int],
) -> tuple[dict[str, float], dict[str, float]]:
    """One-step physical-metadata propagation (C2):
    the downsampled pixel grid is coarser by ``f`` and its first pixel
    center sits half the removed extent inward."""
    new_scale = dict(scale)
    new_translation = dict(translation)
    for d, f in dim_factors.items():
        if d in scale:
            new_scale[d] = scale[d] * f
            new_translation[d] = translation[d] + 0.5 * (f - 1) * scale[d]
    return new_scale, new_translation


def propagate_scale_translation(
    scale0: float, translation0: float, cumulative_factor: int
) -> tuple[float, float]:
    """Closed form of repeated halving to cumulative factor ``F = 2^n``:
    s_n = F * s0 ; t_n = t0 + 0.5 * (F - 1) * s0.

    (Telescoping the per-level law: sum_i 0.5*(2-1)*s0*2^i = 0.5*s0*(F-1).)
    Used by the SQL-checkable oracle query for C2.
    """
    return scale0 * cumulative_factor, translation0 + 0.5 * (cumulative_factor - 1) * scale0


def next_block_shape(
    shape: dict[str, int], dim_factors: dict[str, int]
) -> dict[str, int]:
    """Floor-divide spatial dims: output shape per level. Trailing pixels
    beyond ``f * floor(n/f)`` are dropped, not averaged — the downsample
    operators must crop before aggregating to match."""
    return {
        d: (int(shape[d] // dim_factors[d]) if d in dim_factors else shape[d])
        for d in shape
    }


def aligned_chunks(
    chunks: dict[str, int],
    default_chunks: dict[str, int],
    dim_factors: dict[str, int],
) -> tuple[dict[str, int], bool]:
    """Pick a chunk grid whose chunk shape divides by the shrink factor so
    no aggregation block straddles two chunks. Returns (chunks, changed).
    In Spark: the ``repartition`` grid used before a chunk-wise
    ``applyInPandas`` kernel; pure-SQL aggregates don't need it (the
    shuffle hashes whole blocks together regardless)."""
    out = {}
    changed = False
    for d, f in dim_factors.items():
        if chunks.get(d, 1) % f:
            out[d] = chunks[d] * f
            changed = True
        else:
            out[d] = default_chunks.get(d, chunks[d])
    return out, changed


def memory_usage_bytes(
    shape: dict[str, int],
    dtype_bytes: int,
    chunks: dict[str, int],
    constrained_dims: tuple[str, ...] = (),
) -> int:
    """Partition-size estimator in the shape of py/ngff_zarr/
    memory_usage.py:8-24: dims outside ``constrained_dims`` at full
    shape, constrained dims at one chunk. DELIBERATE divergence: the
    reference multiplies ``arr.itemsize`` into every dim's extent
    (itemsize**ndim); this computes true bytes (itemsize once). The
    exact relationship is pinned live against the reference code in
    tests/test_reference_code_oracle.py::test_memory_usage_matches_
    reference."""
    total = dtype_bytes
    for d, n in shape.items():
        total *= chunks.get(d, n) if d in constrained_dims else n
    return total


def task_count(shape: dict[str, int], chunks: dict[str, int]) -> int:
    """Estimator parity with py/ngff_zarr/task_count.py:8-20 in spirit:
    number of chunk tasks = product of per-dim chunk counts."""
    n = 1
    for d, s in shape.items():
        c = chunks.get(d, s)
        n *= -(-s // c)
    return n
