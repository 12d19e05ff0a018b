"""Plate-scale incremental HCS ingestion walkthrough.

Run:  python examples/plate_ingestion.py

An instrument acquires fields-of-view one by one and drops a manifest
per field; a Structured Streaming query drains the manifests and
writes each field into the plate store with the well's image list
upserted — the batched path (write_hcs_fields) turns every micro-batch
into O(fields/64) Spark jobs instead of O(fields). Finishes by reading
the plate catalog back and printing the well/field inventory.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
from ngff_zarr_spark.hcs import (
    Plate,
    PlateColumn,
    PlateRow,
    PlateWell,
    from_hcs_zarr,
    to_hcs_zarr,
)
from ngff_zarr_spark.model import NgffImage
from ngff_zarr_spark.ome_zarr_api import read_image, to_multiscales
from ngff_zarr_spark.session import get_spark
from ngff_zarr_spark.streaming.pipeline import (
    incremental_well_write_stream,
    write_manifest,
)


def main() -> None:
    spark = get_spark("plate_ingestion")
    work = tempfile.mkdtemp(prefix="plate_example_")
    store = os.path.join(work, "plate.ome.zarr")
    manifests = os.path.join(work, "manifests")
    ckpt = os.path.join(work, "ckpt")

    rows = ["A", "B"]
    cols = ["1", "2", "3"]
    plate = Plate(
        columns=[PlateColumn(c) for c in cols],
        rows=[PlateRow(r) for r in rows],
        wells=[
            PlateWell(f"{r}/{c}", ri, ci)
            for ri, r in enumerate(rows)
            for ci, c in enumerate(cols)
        ],
        name="Example Plate",
        field_count=2,
    )
    to_hcs_zarr(plate, store)

    spec = ImageSpec("fov", z=2, y=16, x=16)
    pixels = pixel_df(spark, spec).select("t", "c", "z", "y", "x", "v")

    def field_ms(row, col, fi):
        img = NgffImage(
            data=pixels,
            dims=["z", "y", "x"],
            shape={"z": 2, "y": 16, "x": 16},
            scale={"z": 1.0, "y": 0.65, "x": 0.65},
            translation={"z": 0.0, "y": 0.0, "x": 0.0},
        )
        return to_multiscales(img, scale_factors=[], chunks={"z": 2, "y": 16, "x": 16})

    # the instrument drops every field's manifest ...
    for r in rows:
        for c in cols:
            for fi in range(2):
                write_manifest(manifests, r, c, fi)
    # ... and one availableNow drain ingests the whole acquisition
    q = incremental_well_write_stream(
        spark, manifests, store, plate, field_ms, checkpoint_dir=ckpt
    )
    assert q.awaitTermination(300), "stream drain timed out"

    cat = from_hcs_zarr(spark, store)
    plate_back = cat["plate"]
    print(f"plate: {plate_back.name}  wells: {len(plate_back.wells)}")
    n_px = read_image(spark, store, "A/1/0/scale0/image").count()
    print(f"A/1 field 0 pixels: {n_px}")
    print("plate ingestion complete")


if __name__ == "__main__":
    main()
