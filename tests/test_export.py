"""Non-Zarr export path (ingest/export.py) — every supported suffix
round-trips pixel-exact through this package's own reader (reference
parity: cli.py:384-396 writes these via itk.imwrite)."""

import gzip

import numpy as np
import pytest

from ngff_zarr_spark.ingest.export import (
    EXPORT_SUFFIXES,
    detect_export_suffix,
    export_ngff_image,
)
from ngff_zarr_spark.ingest.nifti import array_to_pixel_df
from ngff_zarr_spark.model import to_ngff_image


def _vol_image(spark, dims, shape, dtype="int16", scale=None, translation=None):
    rng = np.random.default_rng(41)
    arr = rng.integers(0, 120, shape).astype(dtype)
    df = array_to_pixel_df(spark, arr, dims)
    img = to_ngff_image(
        df,
        dims=dims,
        shape=dict(zip(dims, arr.shape)),
        scale=scale,
        translation=translation,
    )
    img.dtype = arr.dtype.name
    return img, arr


def test_detect_suffix():
    assert detect_export_suffix("a/b.nii.gz") == ".nii.gz"
    assert detect_export_suffix("a/b.NII") == ".nii"
    assert detect_export_suffix("a/b.ome.zarr") is None
    assert detect_export_suffix("plain") is None


def test_export_nii_gz_3d(spark, tmp_path):
    img, arr = _vol_image(
        spark, ["z", "y", "x"], (4, 5, 6),
        scale={"z": 2.0, "y": 1.5, "x": 1.25},
        translation={"z": 10.0, "y": 0.0, "x": -4.0},
    )
    p = tmp_path / "v.nii.gz"
    export_ngff_image(img, str(p))
    from ngff_zarr_spark.ingest.nifti import nifti_to_ngff_image

    back = nifti_to_ngff_image(spark, p)
    assert back.shape == {"x": 6, "y": 5, "z": 4}
    assert back.scale == {"x": 1.25, "y": 1.5, "z": 2.0}
    assert back.translation == {"x": -4.0, "y": 0.0, "z": 10.0}
    got = {(r.z, r.y, r.x): r.v for r in back.data.collect()}
    assert got[(0, 0, 0)] == float(arr[0, 0, 0])
    assert got[(3, 4, 5)] == float(arr[3, 4, 5])
    assert all(got[z, y, x] == float(arr[z, y, x]) for z in range(4) for y in range(5) for x in range(6))


def test_export_mgz_and_mrc(spark, tmp_path):
    img, arr = _vol_image(
        spark, ["z", "y", "x"], (3, 4, 5), scale={"z": 4.0, "y": 0.5, "x": 0.5}
    )
    from ngff_zarr_spark.ingest.mgh import mgh_to_ngff_image
    from ngff_zarr_spark.ingest.mrc import mrc_to_ngff_image

    for suffix, reader in ((".mgz", mgh_to_ngff_image), (".mrc", mrc_to_ngff_image)):
        p = tmp_path / f"v{suffix}"
        export_ngff_image(img, str(p))
        back = reader(spark, str(p))
        assert back.shape == {"z": 3, "y": 4, "x": 5}
        assert back.scale["z"] == pytest.approx(4.0)
        got = {(r.z, r.y, r.x): r.v for r in back.data.collect()}
        assert all(
            got[z, y, x] == float(arr[z, y, x])
            for z in range(3) for y in range(4) for x in range(5)
        )


def test_export_nrrd_mha_with_origin(spark, tmp_path):
    img, arr = _vol_image(
        spark, ["z", "y", "x"], (2, 3, 4),
        scale={"z": 1.0, "y": 2.0, "x": 3.0},
        translation={"z": 5.0, "y": 6.0, "x": 7.0},
    )
    from ngff_zarr_spark.ingest.mha import mha_to_ngff_image
    from ngff_zarr_spark.ingest.nrrd import nrrd_to_ngff_image

    for suffix, reader in ((".nrrd", nrrd_to_ngff_image), (".mha", mha_to_ngff_image)):
        p = tmp_path / f"v{suffix}"
        export_ngff_image(img, str(p))
        back = reader(spark, str(p))
        assert back.shape == {"z": 2, "y": 3, "x": 4}
        assert back.scale == {"z": 1.0, "y": 2.0, "x": 3.0}
        assert back.translation == {"z": 5.0, "y": 6.0, "x": 7.0}
        got = {(r.z, r.y, r.x): r.v for r in back.data.collect()}
        assert all(
            got[z, y, x] == float(arr[z, y, x])
            for z in range(2) for y in range(3) for x in range(4)
        )


def test_export_2d_rasters(spark, tmp_path):
    img, arr = _vol_image(spark, ["y", "x"], (9, 11), dtype="uint8")
    from ngff_zarr_spark.ingest.bmp import bmp_decode
    from ngff_zarr_spark.ingest.gif import gif_decode
    from ngff_zarr_spark.ingest.png import png_decode
    from ngff_zarr_spark.ingest.tiff import tiff_decode
    from ngff_zarr_spark.ingest.webp import webp_decode

    for suffix, decode in (
        (".png", png_decode), (".bmp", bmp_decode), (".tif", tiff_decode),
        (".gif", gif_decode), (".webp", webp_decode),
    ):
        p = tmp_path / f"i{suffix}"
        export_ngff_image(img, str(p))
        assert np.array_equal(decode(p.read_bytes()), arr), suffix


def test_export_squeezes_singletons(spark, tmp_path):
    # a (t=1, c=1, y, x) image exports to 2-D rasters
    img, arr = _vol_image(spark, ["t", "c", "y", "x"], (1, 1, 5, 6), dtype="uint8")
    from ngff_zarr_spark.ingest.png import png_decode

    p = tmp_path / "s.png"
    export_ngff_image(img, str(p))
    assert np.array_equal(png_decode(p.read_bytes()), arr[0, 0])


def test_export_refuses_nonsingleton_drop(spark, tmp_path):
    img, _ = _vol_image(spark, ["z", "y", "x"], (3, 4, 5), dtype="uint8")
    with pytest.raises(ValueError, match="cannot export"):
        export_ngff_image(img, str(tmp_path / "i.png"))


def test_export_unknown_suffix(spark, tmp_path):
    img, _ = _vol_image(spark, ["y", "x"], (2, 2), dtype="uint8")
    with pytest.raises(ValueError, match="no exporter"):
        export_ngff_image(img, str(tmp_path / "x.xyz"))


def test_rfc4_validation_rejects_bad_orientation(spark, tmp_path):
    """enabled_rfcs=[4] validates: a bogus orientation value raises."""
    from ngff_zarr_spark.ome_zarr_api import to_multiscales, to_ngff_zarr

    img, _ = _vol_image(spark, ["z", "y", "x"], (2, 2, 2), dtype="uint8")
    img.axes_orientations = {"z": "not-a-direction", "y": "left-to-right", "x": "left-to-right"}
    ms = to_multiscales(img, scale_factors=[], method="ITKWASM_BIN_SHRINK")
    with pytest.raises(ValueError, match="orientation"):
        to_ngff_zarr(str(tmp_path / "bad.ome.zarr"), ms, enabled_rfcs=[4])
    # without the flag the invalid metadata is stripped, not validated
    to_ngff_zarr(str(tmp_path / "ok.ome.zarr"), ms)


def test_rfc4_partial_orientation_rejected(spark, tmp_path):
    from ngff_zarr_spark.ome_zarr_api import to_multiscales, to_ngff_zarr

    img, _ = _vol_image(spark, ["z", "y", "x"], (2, 2, 2), dtype="uint8")
    img.axes_orientations = {"x": "left-to-right"}  # y, z missing
    ms = to_multiscales(img, scale_factors=[], method="ITKWASM_BIN_SHRINK")
    with pytest.raises(ValueError, match="all spatial axes"):
        to_ngff_zarr(str(tmp_path / "p.ome.zarr"), ms, enabled_rfcs=[4])


def test_rfc4_read_side_validation(spark, tmp_path):
    """from_ngff_zarr(validate=True) rejects malformed orientation
    metadata (reference from_ngff_zarr.py:185-196); the valid store
    reads fine."""
    import json

    from ngff_zarr_spark.ome_zarr_api import from_ngff_zarr, to_multiscales, to_ngff_zarr

    img, _ = _vol_image(spark, ["z", "y", "x"], (2, 2, 2), dtype="uint8")
    img.axes_orientations = {
        "z": "inferior-to-superior",
        "y": "posterior-to-anterior",
        "x": "left-to-right",
    }
    ms = to_multiscales(img, scale_factors=[], method="ITKWASM_BIN_SHRINK")
    store = tmp_path / "r.ome.zarr"
    to_ngff_zarr(str(store), ms, enabled_rfcs=[4])
    assert from_ngff_zarr(spark, str(store), validate=True)

    # corrupt one orientation value on disk
    doc = json.loads((store / ".zattrs").read_text())
    doc["multiscales"][0]["axes"][0]["orientation"]["value"] = "sideways"
    (store / ".zattrs").write_text(json.dumps(doc))
    (store / ".zmetadata").unlink()  # drop consolidation so the edit is seen
    with pytest.raises(ValueError, match="orientation"):
        from_ngff_zarr(spark, str(store), validate=True)
