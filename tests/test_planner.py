"""Planner/metadata math vs the reference's expected-value tables
(/root/reference py/test/test_ngff_image_scale_factors.py:11-65,
test_to_multiscales_translate.py, test_memory_usage.py, test_task_count.py)."""

import pytest

from ngff_zarr_spark.plans.planner import (
    aligned_chunks,
    compute_sigma,
    memory_usage_bytes,
    next_block_shape,
    next_scale_metadata,
    propagate_scale_translation,
    pyramid_scale_factors,
    relative_dim_factors,
    task_count,
)


@pytest.mark.parametrize(
    "shape, expected",
    [
        ({"y": 30, "x": 30}, []),
        ({"y": 520, "x": 520}, [{"x": 2, "y": 2}, {"x": 4, "y": 4}, {"x": 8, "y": 8}]),
        (
            {"z": 10, "y": 530, "x": 530},
            [
                {"x": 2, "y": 2, "z": 1},
                {"x": 4, "y": 4, "z": 1},
                {"x": 8, "y": 8, "z": 1},
            ],
        ),
    ],
)
def test_scale_factors_chunk64(shape, expected):
    chunks = {d: 64 for d in shape}
    got = pyramid_scale_factors(shape, min_length=64, out_chunks=chunks)
    assert got == expected


@pytest.mark.parametrize(
    "shape, chunks, expected",
    [
        (
            {"t": 1, "z": 30, "y": 1024, "x": 1024},
            {"t": 1, "z": 30, "y": 65, "x": 65},
            [
                {"x": 2, "y": 2, "z": 1},
                {"x": 4, "y": 4, "z": 1},
                {"x": 8, "y": 8, "z": 1},
            ],
        ),
        (
            {"t": 1, "z": 125, "y": 1024, "x": 1024},
            {"t": 1, "z": 50, "y": 51, "x": 50},
            [
                {"x": 2, "y": 2, "z": 1},
                {"x": 4, "y": 4, "z": 1},
                {"x": 8, "y": 8, "z": 1},
                {"x": 16, "y": 16, "z": 2},
            ],
        ),
    ],
)
def test_scale_factors_with_chunk_shape(shape, chunks, expected):
    got = pyramid_scale_factors(shape, min_length=max(chunks.values()), out_chunks=chunks)
    assert got == expected


def test_sigma_formula():
    # f=1 → no smoothing; f=2 → sqrt(3)/(2*sqrt(2 ln 2))
    assert compute_sigma([1]) == [0.0]
    s2 = compute_sigma([2])[0]
    assert abs(s2 - 0.7355) < 1e-3


def test_translation_law():
    # t1 = t0 + 0.5*(f-1)*s0 ; s1 = f*s0 (reference translate test math)
    scale, trans = next_scale_metadata({"y": 1.4, "x": 1.4}, {"y": 360.0, "x": 0.0}, {"y": 2, "x": 2})
    assert scale == {"y": 2.8, "x": 2.8}
    assert trans == {"y": 360.7, "x": 0.7}


def test_closed_form_matches_iteration():
    s, t = 2.5, 332.5
    for level in range(6):
        cs, ct = propagate_scale_translation(2.5, 332.5, 2**level)
        assert abs(cs - s) < 1e-9 and abs(ct - t) < 1e-9
        t = t + 0.5 * (2 - 1) * s
        s = s * 2


def test_relative_factors():
    assert relative_dim_factors(["z", "y", "x"], {"x": 4, "y": 4, "z": 2}, {"x": 2, "y": 2, "z": 1}) == {
        "x": 2,
        "y": 2,
        "z": 2,
    }
    assert relative_dim_factors(["y", "x"], 4, {"x": 2, "y": 2}) == {"x": 2, "y": 2}


def test_block_shape_floor():
    assert next_block_shape({"z": 33, "y": 67, "x": 65}, {"z": 2, "y": 2, "x": 2}) == {
        "z": 16,
        "y": 33,
        "x": 32,
    }


def test_aligned_chunks():
    ch, changed = aligned_chunks({"y": 65, "x": 64}, {"y": 64, "x": 64}, {"y": 2, "x": 2})
    assert changed and ch["y"] == 130 and ch["x"] == 64


def test_memory_usage_reference_values():
    # 4^3 uint8, chunks=2: 64 B full, 32 B z-constrained
    shape = {"z": 4, "y": 4, "x": 4}
    chunks = {"z": 2, "y": 2, "x": 2}
    assert memory_usage_bytes(shape, 1, chunks) == 64
    assert memory_usage_bytes(shape, 1, chunks, ("z",)) == 32


def test_task_count_grid():
    assert task_count({"z": 4, "y": 4, "x": 4}, {"z": 2, "y": 2, "x": 2}) == 8
    assert task_count({"y": 67, "x": 65}, {"y": 32, "x": 32}) == 9


def test_pyramid_integrity_int_chain(spark):
    """Reference parity (py/test/test_pyramid_integrity.py): with a
    cumulative integer scale-factor chain, every level's physical
    extent (shape x scale) must equal the base image's, and level i's
    scale must be exactly factor_i x base_scale — for each downsample
    method family."""
    from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
    from ngff_zarr_spark.model import NgffImage
    from ngff_zarr_spark.ome_zarr_api import to_multiscales

    spec = ImageSpec("pyr_int", y=64, x=64)
    factors = [2, 4, 8]
    for method in ("ITKWASM_BIN_SHRINK", "ITKWASM_LABEL_IMAGE", "ITKWASM_GAUSSIAN"):
        img = NgffImage(
            data=pixel_df(spark, spec).select("t", "c", "z", "y", "x", "v"),
            dims=["y", "x"],
            shape={"y": 64, "x": 64},
            scale={"y": 0.25, "x": 0.25},
            translation={"y": 0.0, "x": 0.0},
        )
        ms = to_multiscales(img, scale_factors=factors, method=method,
                            chunks={"y": 32, "x": 32})
        assert len(ms.images) == len(factors) + 1
        for li, level in enumerate(ms.images):
            for d in ("y", "x"):
                # extent preservation: base_shape * base_scale == shape * scale
                assert 64 * 0.25 == level.scale[d] * level.shape[d], (method, li, d)
                if li > 0:
                    assert level.scale[d] == factors[li - 1] * 0.25, (method, li, d)
