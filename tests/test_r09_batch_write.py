"""r9 multi-array ("fleet") write path: write_image_batch +
write_hcs_fields must produce BYTE-IDENTICAL stores to the per-field
writers while collapsing O(fields) Spark jobs into O(fields/64)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.compare import store_equals
from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
from ngff_zarr_spark.hcs import (
    Plate,
    PlateColumn,
    PlateRow,
    PlateWell,
    to_hcs_zarr,
    write_hcs_fields,
    write_hcs_well_image,
)
from ngff_zarr_spark.model import NgffImage
from ngff_zarr_spark.ome_zarr_api import (
    read_image,
    to_multiscales,
    write_image,
    write_image_batch,
)

SPEC = ImageSpec("bt", z=2, y=16, x=16)
SHAPE = {"z": 2, "y": 16, "x": 16}
CHUNKS = {"z": 2, "y": 8, "x": 8}


def _field_df(spark, seed):
    return pixel_df(spark, SPEC).selectExpr(
        "t", "c", "z", "y", "x", f"v + {seed} as v"
    )


def test_write_image_batch_equals_per_array(spark, tmp_path):
    a = str(tmp_path / "per.zarr")
    b = str(tmp_path / "batch.zarr")
    dims = ["z", "y", "x"]
    for i in range(3):
        write_image(_field_df(spark, i), a, f"arr{i}", SHAPE, dims, CHUNKS)
    write_image_batch(
        [(_field_df(spark, i), f"arr{i}") for i in range(3)],
        b, SHAPE, dims, CHUNKS,
    )
    assert store_equals(a, b)
    # values readable per array
    df = read_image(spark, b, "arr2")
    got = {(r.z, r.y, r.x): r.v for r in df.collect()}
    want = {(r.z, r.y, r.x): r.v for r in _field_df(spark, 2).collect()}
    assert got == want


def _mkplate(rows, cols):
    return Plate(
        columns=[PlateColumn(c) for c in cols],
        rows=[PlateRow(r) for r in rows],
        wells=[
            PlateWell(f"{r}/{c}", ri, ci)
            for ri, r in enumerate(rows)
            for ci, c in enumerate(cols)
        ],
        name="P",
        field_count=2,
    )


def _ms(spark, seed, chunks=CHUNKS, levels=0):
    img = NgffImage(
        data=_field_df(spark, seed),
        dims=["z", "y", "x"],
        shape=dict(SHAPE),
        scale={"z": 1.0, "y": 1.0, "x": 1.0},
        translation={"z": 0.0, "y": 0.0, "x": 0.0},
    )
    sf = [{"z": 1, "y": 2, "x": 2}] * levels
    return to_multiscales(
        img, scale_factors=sf, method="ITKWASM_BIN_SHRINK", chunks=chunks
    )


def test_write_hcs_fields_equals_per_field(spark, tmp_path):
    rows, cols = ["A", "B"], ["1", "2"]
    sa, sb = str(tmp_path / "a.ome.zarr"), str(tmp_path / "b.ome.zarr")
    pa, pb = _mkplate(rows, cols), _mkplate(rows, cols)
    to_hcs_zarr(pa, sa)
    to_hcs_zarr(pb, sb)
    fields = [(r, c, fi) for r in rows for c in cols for fi in range(2)]
    for i, (r, c, fi) in enumerate(fields):
        write_hcs_well_image(spark, sa, _ms(spark, i), pa, r, c, field_index=fi)
    write_hcs_fields(
        spark, sb, [(r, c, fi, _ms(spark, i)) for i, (r, c, fi) in enumerate(fields)], pb
    )
    assert store_equals(sa, sb)


def test_write_hcs_fields_pyramid_fallback(spark, tmp_path):
    """A multi-level field takes the per-field writer inside
    write_hcs_fields; result still equals the explicit per-field
    write."""
    rows, cols = ["A"], ["1"]
    sa, sb = str(tmp_path / "pa.ome.zarr"), str(tmp_path / "pb.ome.zarr")
    pa, pb = _mkplate(rows, cols), _mkplate(rows, cols)
    to_hcs_zarr(pa, sa)
    to_hcs_zarr(pb, sb)
    write_hcs_well_image(spark, sa, _ms(spark, 0, levels=1), pa, "A", "1", field_index=0)
    write_hcs_fields(spark, sb, [("A", "1", 0, _ms(spark, 0, levels=1))], pb)
    assert store_equals(sa, sb)


def test_write_image_batch_small_job_groups(spark, tmp_path):
    """max_fields_per_job splits the batch without changing bytes."""
    rows, cols = ["A", "B"], ["1"]
    sa, sb = str(tmp_path / "ga.ome.zarr"), str(tmp_path / "gb.ome.zarr")
    pa, pb = _mkplate(rows, cols), _mkplate(rows, cols)
    to_hcs_zarr(pa, sa)
    to_hcs_zarr(pb, sb)
    fields = [(r, "1", fi) for r in rows for fi in range(2)]
    write_hcs_fields(
        spark, sa, [(r, c, fi, _ms(spark, i)) for i, (r, c, fi) in enumerate(fields)],
        pa, max_fields_per_job=1,
    )
    write_hcs_fields(
        spark, sb, [(r, c, fi, _ms(spark, i)) for i, (r, c, fi) in enumerate(fields)],
        pb, max_fields_per_job=64,
    )
    assert store_equals(sa, sb)


def test_write_hcs_fields_chunks_default_matches_per_field(spark, tmp_path):
    """Review finding: chunks=None must mean default_chunks (as in
    to_ngff_zarr), not whole-image chunks — or the batched store
    diverges from the per-field one."""
    rows, cols = ["A"], ["1"]
    sa, sb = str(tmp_path / "da.ome.zarr"), str(tmp_path / "db.ome.zarr")
    pa, pb = _mkplate(rows, cols), _mkplate(rows, cols)
    to_hcs_zarr(pa, sa)
    to_hcs_zarr(pb, sb)
    ms_a = _ms(spark, 0, chunks=None)
    ms_b = _ms(spark, 0, chunks=None)
    write_hcs_well_image(spark, sa, ms_a, pa, "A", "1", field_index=0)
    write_hcs_fields(spark, sb, [("A", "1", 0, ms_b)], pb)
    assert store_equals(sa, sb)


def test_write_hcs_fields_forwards_to_zarr_kwargs(spark, tmp_path):
    """Review finding: extra to_ngff_zarr kwargs (dtype here) must not
    crash — they route the fields through the per-field writer with
    identical semantics."""
    rows, cols = ["A"], ["1"]
    sa, sb = str(tmp_path / "ka.ome.zarr"), str(tmp_path / "kb.ome.zarr")
    pa, pb = _mkplate(rows, cols), _mkplate(rows, cols)
    to_hcs_zarr(pa, sa)
    to_hcs_zarr(pb, sb)
    write_hcs_well_image(
        spark, sa, _ms(spark, 0), pa, "A", "1", field_index=0, dtype="uint16"
    )
    write_hcs_fields(spark, sb, [("A", "1", 0, _ms(spark, 0))], pb, dtype="uint16")
    assert store_equals(sa, sb)


def test_stream_kwargs_reach_field_writes(spark, tmp_path):
    """Review finding: incremental_well_write_stream(**to_zarr_kwargs)
    previously crashed inside foreachBatch for any kwarg beyond
    compressor; the fallback path must carry them."""
    import os

    from ngff_zarr_spark.ome_zarr_api import read_image
    from ngff_zarr_spark.streaming.pipeline import (
        incremental_well_write_stream,
        write_manifest,
    )

    base = tmp_path / "skw"
    store = str(base / "p.ome.zarr")
    manifests = str(base / "m")
    ckpt = str(base / "c")
    plate = _mkplate(["A"], ["1"])
    os.makedirs(base, exist_ok=True)
    to_hcs_zarr(plate, store)
    write_manifest(manifests, "A", "1", 0)
    q = incremental_well_write_stream(
        spark, manifests, store, plate, lambda r, c, f: _ms(spark, 0),
        checkpoint_dir=ckpt, dtype="uint16",
    )
    assert q.awaitTermination(180)
    import json

    zarray = json.load(open(os.path.join(store, "A/1/0/scale0/image/.zarray")))
    assert zarray["dtype"] == "<u2"


def test_write_image_batch_view_hygiene(spark, tmp_path):
    """ADVICE r11: batch writes must not clobber user temp views and
    must leave no _ngff_wib_* views behind in the caller's catalog."""
    # a user view that an earlier implementation's fixed slot name
    # would have silently replaced
    spark.range(5).createOrReplaceTempView("_wib_src_0")
    dims = ["z", "y", "x"]
    write_image_batch(
        [(_field_df(spark, i), f"arr{i}") for i in range(2)],
        str(tmp_path / "hygiene.zarr"), SHAPE, dims, CHUNKS,
    )
    names = {t.name for t in spark.catalog.listTables()}
    assert not any(n.startswith("_ngff_wib_") for n in names)
    assert spark.table("_wib_src_0").count() == 5
    spark.catalog.dropTempView("_wib_src_0")
