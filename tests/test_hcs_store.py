"""HCS store I/O (S18-S20): real plate attrs, well attr upsert, field
image pixel round-trip. Attr layout parity: reference
py/test/test_hcs.py:244-250 (ome/plate keys), test_hcs_zarr_format.py
(v0.4 → zarr2, v0.5 → zarr3), write_hcs_well_image merge semantics
(hcs.py:655-716).
"""

from __future__ import annotations

import json

import pytest

from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
from ngff_zarr_spark.hcs import (
    Plate,
    PlateAcquisition,
    PlateColumn,
    PlateRow,
    PlateWell,
    from_hcs_zarr,
    to_hcs_zarr,
    write_hcs_well_image,
)
from ngff_zarr_spark.model import NgffImage
from ngff_zarr_spark.ome_zarr_api import read_image, to_multiscales


def _plate():
    return Plate(
        columns=[PlateColumn("1"), PlateColumn("2")],
        rows=[PlateRow("A"), PlateRow("B")],
        wells=[PlateWell("A/1", 0, 0), PlateWell("B/2", 1, 1)],
        acquisitions=[PlateAcquisition(id=0, name="acq0", maximumfieldcount=2)],
        name="Test Plate",
        field_count=2,
    )


def _image(spark):
    spec = ImageSpec("w", z=2, y=4, x=4)
    img = NgffImage(
        data=pixel_df(spark, spec).select("t", "c", "z", "y", "x", "v"),
        dims=["z", "y", "x"],
        shape={"z": 2, "y": 4, "x": 4},
        scale={"z": 1.0, "y": 1.0, "x": 1.0},
        translation={"z": 0.0, "y": 0.0, "x": 0.0},
    )
    return to_multiscales(img, scale_factors=[], chunks={"z": 2, "y": 4, "x": 4})


def test_plate_attrs_layout(tmp_path):
    store = str(tmp_path / "p.ome.zarr")
    to_hcs_zarr(_plate(), store)
    attrs = json.loads((tmp_path / "p.ome.zarr/.zattrs").read_text())
    assert "plate" in attrs["ome"]
    assert attrs["ome"]["version"] == "0.4"
    plate_attrs = attrs["ome"]["plate"]
    assert plate_attrs["name"] == "Test Plate"
    assert len(plate_attrs["wells"]) == 2
    assert plate_attrs["wells"][0] == {"path": "A/1", "rowIndex": 0, "columnIndex": 0}
    assert plate_attrs["acquisitions"][0] == {
        "id": 0, "name": "acq0", "maximumfieldcount": 2,
    }


def test_plate_v05_layout(tmp_path):
    store = str(tmp_path / "p5.ome.zarr")
    plate = _plate()
    plate.version = "0.5"
    to_hcs_zarr(plate, store)
    doc = json.loads((tmp_path / "p5.ome.zarr/zarr.json").read_text())
    assert doc["node_type"] == "group"
    assert doc["attributes"]["ome"]["version"] == "0.5"


def test_well_write_upsert_and_readback(spark, tmp_path):
    store = str(tmp_path / "plate.ome.zarr")
    plate = _plate()
    to_hcs_zarr(plate, store)
    ms = _image(spark)
    write_hcs_well_image(spark, store, ms, plate, "A", "1", field_index=0)
    write_hcs_well_image(spark, store, ms, plate, "A", "1", field_index=1)
    # upsert: well attrs accumulate both images, no duplicates on rewrite
    write_hcs_well_image(spark, store, ms, plate, "A", "1", field_index=1)
    well_attrs = json.loads((tmp_path / "plate.ome.zarr/A/1/.zattrs").read_text())
    images = well_attrs["well"]["images"]
    assert images == [
        {"path": "0", "acquisition": 0},
        {"path": "1", "acquisition": 0},
    ]
    # catalog sees both fields; pixel data readable at the field prefix
    cat = from_hcs_zarr(spark, store)
    assert cat["plate"].name == "Test Plate"
    rows = {(r.well_path, r.field_index) for r in cat["well_images"].collect()}
    assert rows == {("A/1", 0), ("A/1", 1)}
    df = read_image(spark, f"{store}/A/1/0", "scale0/image")
    assert df.count() == 2 * 4 * 4


def test_well_write_validates_grid(spark, tmp_path):
    store = str(tmp_path / "v.ome.zarr")
    plate = _plate()
    to_hcs_zarr(plate, store)
    ms = _image(spark)
    with pytest.raises(ValueError, match="Row 'C'"):
        write_hcs_well_image(spark, store, ms, plate, "C", "1")
    with pytest.raises(ValueError, match="Column '9'"):
        write_hcs_well_image(spark, store, ms, plate, "A", "9")
    with pytest.raises(ValueError, match="Well 'A/2'"):
        write_hcs_well_image(spark, store, ms, plate, "A", "2")


def test_sparse_plate_logical_indices(spark, tmp_path):
    """Reference parity (py/test/test_index_out_of_range.py): a sparse
    plate whose PlateWell rowIndex/columnIndex are LOGICAL plate
    coordinates (row 'C' has rowIndex=2 with only 2 rows present) must
    write and read correctly — well resolution is by NAME, never by
    indexing the rows/columns arrays."""
    from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
    from ngff_zarr_spark.hcs import (
        Plate, PlateColumn, PlateRow, PlateWell,
        from_hcs_zarr, to_hcs_zarr, write_hcs_well_image,
    )
    from ngff_zarr_spark.model import NgffImage
    from ngff_zarr_spark.ome_zarr_api import to_multiscales

    plate = Plate(
        columns=[PlateColumn("1"), PlateColumn("3"), PlateColumn("5")],
        rows=[PlateRow("A"), PlateRow("C")],
        wells=[
            PlateWell("A/1", 0, 0),
            PlateWell("A/3", 0, 2),
            PlateWell("C/1", 2, 0),
            PlateWell("C/5", 2, 4),
        ],
        name="Sparse Plate",
        field_count=1,
    )
    store = str(tmp_path / "sparse.ome.zarr")
    to_hcs_zarr(plate, store)
    spec = ImageSpec("sp", z=2, y=4, x=4)
    img = NgffImage(
        data=pixel_df(spark, spec).select("t", "c", "z", "y", "x", "v"),
        dims=["z", "y", "x"],
        shape={"z": 2, "y": 4, "x": 4},
        scale={"z": 1.0, "y": 1.0, "x": 1.0},
        translation={"z": 0.0, "y": 0.0, "x": 0.0},
    )
    ms = to_multiscales(img, scale_factors=[], chunks={"z": 2, "y": 4, "x": 4})
    write_hcs_well_image(spark, store, ms, plate, "C", "5", field_index=0)
    write_hcs_well_image(spark, store, ms, plate, "A", "3", field_index=0)

    cat = from_hcs_zarr(spark, store)
    wells = {(r.row_name, r.col_name): (r.row_index, r.col_index) for r in cat["wells"].collect()}
    assert wells[("C", "5")] == (2, 4)  # logical indices preserved
    imgs = {r.well_path for r in cat["well_images"].collect()}
    assert imgs == {"C/5", "A/3"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not found"):
        write_hcs_well_image(spark, store, ms, plate, "B", "1")


def test_sparse_plate_well_write(spark, tmp_path):
    """Reference parity (test_index_out_of_range.py): a SPARSE plate —
    rows [A, C], columns [1, 3, 5] — where well metadata's
    rowIndex/columnIndex are logical indices that do not equal the
    row/column POSITIONS in a dense grid. The well lookup must go by
    NAME, never by treating rowIndex as an array position."""
    store = str(tmp_path / "sparse.ome.zarr")
    plate = Plate(
        columns=[PlateColumn("1"), PlateColumn("3"), PlateColumn("5")],
        rows=[PlateRow("A"), PlateRow("C")],
        wells=[
            PlateWell("A/1", 0, 0),
            PlateWell("C/3", 1, 1),
            PlateWell("C/5", 1, 2),
        ],
        name="Sparse",
        field_count=1,
    )
    to_hcs_zarr(plate, store)
    ms = _image(spark)
    write_hcs_well_image(
        spark, store, ms, plate, row_name="C", column_name="5", field_index=0
    )
    attrs = json.loads((tmp_path / "sparse.ome.zarr/C/5/.zattrs").read_text())
    assert attrs["well"]["images"][0]["path"] == "0"
    # and an unknown row still errors by name
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Row 'B' not found"):
        write_hcs_well_image(
            spark, store, ms, plate, row_name="B", column_name="1"
        )


def test_multi_field_well_upsert(spark, tmp_path):
    """Reference parity (test_write_hcs_well_image_edge_cases.py:256):
    writing fields 0..2 into one well accumulates ALL of them in the
    well's images list, each at path=str(i), acquisition 0, with the
    pixel trees present on disk."""
    store = str(tmp_path / "mf.ome.zarr")
    plate = Plate(
        columns=[PlateColumn("1")],
        rows=[PlateRow("A")],
        wells=[PlateWell("A/1", 0, 0)],
        name="Multi-field",
        field_count=3,
    )
    to_hcs_zarr(plate, store)
    ms = _image(spark)
    for field_idx in range(3):
        write_hcs_well_image(
            spark, store, ms, plate, row_name="A", column_name="1",
            field_index=field_idx,
        )
        assert (tmp_path / f"mf.ome.zarr/A/1/{field_idx}").exists()
    attrs = json.loads((tmp_path / "mf.ome.zarr/A/1/.zattrs").read_text())
    images = attrs["well"]["images"]
    assert [img["path"] for img in images] == ["0", "1", "2"]
    assert all(img["acquisition"] == 0 for img in images)
