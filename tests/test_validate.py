"""C7 structural schema validation + S2 store factory tests."""

from __future__ import annotations

import pytest

from ngff_zarr_spark.validate import validate


def _good_image_attrs():
    return {
        "multiscales": [
            {
                "axes": [
                    {"name": "z", "type": "space", "unit": "micrometer"},
                    {"name": "y", "type": "space"},
                    {"name": "x", "type": "space"},
                ],
                "datasets": [
                    {
                        "path": "scale0/image",
                        "coordinateTransformations": [
                            {"type": "scale", "scale": [1.0, 1.0, 1.0]},
                            {"type": "translation", "translation": [0.0, 0.0, 0.0]},
                        ],
                    }
                ],
            }
        ]
    }


def test_validate_image_ok():
    assert validate(_good_image_attrs(), "image") == []


def test_validate_image_v05_nested_ok():
    attrs = {"ome": {"version": "0.5", **_good_image_attrs()}}
    assert validate(attrs, "image") == []


def test_validate_image_problems():
    attrs = _good_image_attrs()
    ms = attrs["multiscales"][0]
    ms["axes"][0]["unit"] = "furlong"
    ms["axes"].append({"name": "q", "type": "space"})
    ms["datasets"][0]["coordinateTransformations"] = [
        {"type": "translation", "translation": [0.0, 0.0]}
    ]
    problems = validate(attrs, "image")
    assert any("furlong" in p for p in problems)
    assert any("'q'" in p for p in problems)
    assert any("first transform must be scale" in p for p in problems)
    assert any("length" in p for p in problems)
    with pytest.raises(ValueError, match="Invalid OME-NGFF image"):
        validate(attrs, "image", strict=True)


def test_validate_plate():
    attrs = {
        "ome": {
            "version": "0.4",
            "plate": {
                "rows": [{"name": "A"}],
                "columns": [{"name": "1"}, {"name": "2"}],
                "wells": [{"path": "A/1", "rowIndex": 0, "columnIndex": 0}],
                "acquisitions": [{"id": 0}],
            },
        }
    }
    assert validate(attrs, "plate") == []
    attrs["ome"]["plate"]["wells"].append({"path": "B1", "rowIndex": 5, "columnIndex": 0})
    problems = validate(attrs, "plate")
    assert any("must be 'row/col'" in p for p in problems)
    assert any("rowIndex" in p for p in problems)


def test_validate_well():
    assert validate({"well": {"images": [{"path": "0", "acquisition": 0}]}}, "well") == []
    problems = validate({"well": {"images": [{"acquisition": "x"}]}}, "well")
    assert problems


def test_validate_wired_into_readers(spark, tmp_path):
    """from_ngff_zarr(validate=True) rejects a store with broken attrs."""
    import json

    from ngff_zarr_spark.ome_zarr_api import from_ngff_zarr

    root = tmp_path / "bad.ome.zarr"
    root.mkdir()
    (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (root / ".zattrs").write_text(json.dumps({"multiscales": []}))
    with pytest.raises(ValueError, match="Invalid OME-NGFF image"):
        from_ngff_zarr(spark, str(root), validate=True)


def test_open_store_local_and_remote_error(tmp_path):
    from ngff_zarr_spark.sources.zarr_store import ZarrStore, open_store

    s = open_store(str(tmp_path / "x.zarr"))
    assert isinstance(s, ZarrStore)
    s2 = open_store(f"file://{tmp_path}/y.zarr")
    assert isinstance(s2, ZarrStore)
    with pytest.raises(ImportError, match="fsspec"):
        open_store("s3://bucket/store.zarr")
    with pytest.raises(ValueError, match="scheme"):
        open_store("weird://x")


def test_omero_metadata_store_roundtrip():
    """Omero display metadata survives 0.4 and 0.5 serialization."""
    from ngff_zarr_spark.metadata import group_attributes, parse_group_attributes
    from ngff_zarr_spark.model import (
        Axis, Dataset, Metadata, Omero, OmeroChannel, OmeroWindow, ScaleTransform,
    )

    meta = Metadata(
        axes=[Axis("y", "space"), Axis("x", "space")],
        datasets=[Dataset(path="0", coordinateTransformations=[ScaleTransform([1.0, 1.0])])],
        name="om",
        omero=Omero(
            channels=[
                OmeroChannel(
                    color="FF0000",
                    window=OmeroWindow(min=0.0, max=255.0, start=10.0, end=200.0),
                    label="red",
                )
            ]
        ),
    )
    for version in ("0.4", "0.5"):
        attrs = group_attributes(meta, version)
        back, v = parse_group_attributes(attrs)
        assert v == version
        ch = back.omero.channels[0]
        assert ch.color == "FF0000" and ch.label == "red"
        w = ch.window
        assert (w.min, w.max, w.start, w.end) == (0.0, 255.0, 10.0, 200.0)


def test_validate_image_malformed_shapes_reported_not_raised():
    """r18 review: the validator must REPORT non-object axis/dataset/
    transform entries as problems, not AttributeError on them."""
    attrs = _good_image_attrs()
    ms = attrs["multiscales"][0]
    ms["axes"] = [17, {"name": "y", "type": "space"}, {"name": "x", "type": "space"}]
    ms["datasets"] = [
        "not-an-object",
        {
            "path": "scale0/image",
            "coordinateTransformations": ["bogus", {"type": "scale", "scale": [1, 1, 1]}],
        },
    ]
    problems = validate(attrs, "image")
    assert any("axis entry not an object" in p for p in problems)
    assert any("dataset entry not an object" in p for p in problems)
    assert any("transform not an object" in p for p in problems)
    assert any("first transform must be scale" in p for p in problems)


def test_sniff_store_attrs_never_raises_on_malformed():
    from ngff_zarr_spark.validate import sniff_store_attrs

    assert sniff_store_attrs({"multiscales": {"bad": "shape"}}) == ("0.4", "image")
    assert sniff_store_attrs({"multiscales": ["bad"]}) == ("0.4", "image")
    assert sniff_store_attrs({"plate": "bad"}) == ("0.4", "plate")
    assert sniff_store_attrs({"well": 3}) == ("0.4", "well")
