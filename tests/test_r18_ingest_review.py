"""r18 adversarial-review pins: ingest/catalog robustness.

Findings (PLANS.md r18 review extension 3):
1. hcs.from_hcs_zarr KeyError'd mid-catalog on a well-doc image entry
   without a string ``path`` (the isdigit guard tolerated it, the
   image_path f-string did not) — now skipped like every other
   malformed entry in that defensive-typed parser.
2. ingest.series never validated slice geometry: a series with one
   mismatched slice silently emitted out-of-volume coordinates instead
   of an error (the reference's dask imread stack errors on
   non-uniform shapes, cli_input_to_ngff_image.py:49-73).
3. ingest.nifti accepted any blob whose first 4 bytes decode to 348 as
   NIfTI-1 — the nifti1.h magic at offset 344 is now required
   (NIfTI-2's magic was already checked).
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from ngff_zarr_spark.hcs import (
    Plate,
    PlateColumn,
    PlateRow,
    PlateWell,
    from_hcs_zarr,
    to_hcs_zarr,
)


def _plate():
    return Plate(
        columns=[PlateColumn("1")],
        rows=[PlateRow("A")],
        wells=[PlateWell("A/1", 0, 0)],
    )


def test_hcs_pathless_image_entry_skipped(spark, tmp_path):
    store = str(tmp_path / "p.ome.zarr")
    to_hcs_zarr(_plate(), store)
    # a well doc whose image list mixes valid and malformed entries:
    # a no-path dict and a non-dict entry are unaddressable and must be
    # skipped; a JSON-integer path is spec-lax but addressable and is
    # coerced to str (ADVICE r18) rather than silently dropped
    (tmp_path / "p.ome.zarr/A/1").mkdir(parents=True)
    (tmp_path / "p.ome.zarr/A/1/.zattrs").write_text(
        json.dumps(
            {
                "well": {
                    "images": [
                        {"acquisition": 1},
                        "junk",
                        {"path": 7},
                        {"path": "0", "acquisition": 0},
                        {"path": True},
                    ],
                    "version": "0.4",
                }
            }
        )
    )
    cat = from_hcs_zarr(spark, store)
    rows = {(r.well_path, r.image_path) for r in cat["well_images"].collect()}
    assert rows == {("A/1", "A/1/7"), ("A/1", "A/1/0")}


def _write_png(path, h, w):
    from ngff_zarr_spark.ingest.png import png_encode

    arr = (np.arange(h * w, dtype=np.int64) % 251).astype("uint8").reshape(h, w)
    path.write_bytes(png_encode(arr))


def test_series_mismatched_slice_raises(spark, tmp_path):
    _write_png(tmp_path / "s0.png", 4, 6)
    _write_png(tmp_path / "s1.png", 4, 6)
    _write_png(tmp_path / "s2.png", 5, 6)  # the odd one out
    from ngff_zarr_spark.ingest.series import series_to_ngff_image

    img = series_to_ngff_image(spark, str(tmp_path / "*.png"))
    with pytest.raises(Exception, match="share one shape"):
        img.data.count()


def test_series_uniform_still_decodes(spark, tmp_path):
    for i in range(3):
        _write_png(tmp_path / f"s{i}.png", 4, 6)
    from ngff_zarr_spark.ingest.series import series_to_ngff_image

    img = series_to_ngff_image(spark, str(tmp_path / "*.png"))
    assert img.shape == {"z": 3, "y": 4, "x": 6}
    assert img.data.count() == 3 * 4 * 6


def test_nifti1_bad_magic_rejected(tmp_path):
    from ngff_zarr_spark.ingest.nifti import read_nifti, write_nifti

    blob = bytearray(352 + 64)
    struct.pack_into("<i", blob, 0, 348)  # plausible sizeof_hdr...
    struct.pack_into("<8h", blob, 40, 2, 4, 4, 1, 1, 1, 1, 1)
    struct.pack_into("<h", blob, 70, 2)  # uint8
    # ...but no "n+1"/"ni1" magic at 344
    p = tmp_path / "fake.nii"
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        read_nifti(p)

    # the real writer's output (magic set) still round-trips
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    good = tmp_path / "good.nii"
    write_nifti(good, arr)
    assert read_nifti(good).data.shape == (2, 3, 4)
