"""Property coverage for model.rename_image_dims (r18 review: the
collision-swap projection had no direct tests).

The invariants the swap must preserve, for ANY valid target naming:
- the pixel table keeps exactly the six canonical columns, each once;
- every (coords, v) row survives with its coordinates carried to the
  NEW names of its dims (and constant-0 columns stay constant);
- metadata dicts (shape/scale/translation) follow the same mapping;
- renaming onto a canonical-but-unused dim (e.g. y→z on a 2-D image)
  swaps with the constant column instead of colliding.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
from ngff_zarr_spark.model import SUPPORTED_DIMS, NgffImage, rename_image_dims


def _image(spark, dims):
    sizes = {d: 2 for d in dims}
    spec = ImageSpec("ren", **sizes)
    return NgffImage(
        data=pixel_df(spark, spec).select("t", "c", "z", "y", "x", "v"),
        dims=list(dims),
        shape={d: 2 for d in dims},
        scale={d: float(i + 1) for i, d in enumerate(dims)},
        translation={d: float(10 * (i + 1)) for i, d in enumerate(dims)},
    )


@st.composite
def _rename_case(draw):
    ndim = draw(st.integers(2, 5))
    src = draw(
        st.permutations(list(SUPPORTED_DIMS)).map(lambda p: list(p)[:ndim])
    )
    dst = draw(
        st.permutations(list(SUPPORTED_DIMS)).map(lambda p: list(p)[:ndim])
    )
    return src, dst


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_rename_case())
def test_rename_preserves_rows_and_metadata(spark, case):
    src, dst = case
    img = _image(spark, src)
    before = {
        tuple(r[d] for d in src) + (r["v"],) for r in img.data.collect()
    }
    rename_image_dims(img, dst)

    assert img.dims == dst
    assert sorted(img.data.columns) == sorted(["t", "c", "z", "y", "x", "v"])
    assert img.shape == {d: 2 for d in dst}
    assert img.scale == {d: float(i + 1) for i, d in enumerate(dst)}
    assert img.translation == {d: float(10 * (i + 1)) for i, d in enumerate(dst)}

    after_rows = img.data.collect()
    after = {tuple(r[d] for d in dst) + (r["v"],) for r in after_rows}
    assert after == before
    # dims absent from the image stay constant 0
    for r in after_rows:
        for d in SUPPORTED_DIMS:
            if d not in dst:
                assert r[d] == 0


def test_rename_rejects_bad_targets(spark):
    img = _image(spark, ["y", "x"])
    with pytest.raises(ValueError, match="expected 2 names"):
        rename_image_dims(img, ["z", "y", "x"])
    with pytest.raises(ValueError, match="unsupported name"):
        rename_image_dims(img, ["y", "q"])
    with pytest.raises(ValueError, match="must be distinct"):
        rename_image_dims(img, ["y", "y"])
