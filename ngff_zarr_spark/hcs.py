"""High-Content-Screening plate/well catalog as partitioned DataFrames.

Reference model (/root/reference py/ngff_zarr/v04/zarr_metadata.py:206-253,
hcs.py:91-316): a plate is a rows × columns grid of wells, each well
holding fields-of-view, optionally grouped into acquisitions. In Spark
the plate IS a partitioned catalog — natural partition keys
(plate, row, col, field) — so well/image lookups (F7) are broadcast
joins or partition-pruned point reads, and the reference's LRU caches
(hcs.py:41-88) are subsumed by Spark block-manager caching.

``synthesize_plate`` builds a deterministic catalog from ``spark.range``
(the driver testdata has no HCS tables); the same derivation is emitted
as DuckDB SQL by oracle.py so lookups/joins are oracle-checked.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PlateSpec:
    plate_id: str = "plate0"
    n_rows: int = 8          # A..H
    n_cols: int = 12         # 1..12
    fields_per_well: int = 2
    n_acquisitions: int = 1


def synthesize_plate(spark: SparkSession, spec: PlateSpec | None = None) -> dict[str, DataFrame]:
    """Deterministic plate catalog: wells (row/col grid) and well_images
    (fields × acquisitions). Row names are letters, column names are
    1-based zero-padded numbers, well_path = row/col — mirroring the
    reference's path layout (hcs.py:586-600)."""
    spec = spec or PlateSpec()
    n_wells = spec.n_rows * spec.n_cols
    wells = spark.range(n_wells).select(
        F.lit(spec.plate_id).alias("plate_id"),
        (F.col("id") / spec.n_cols).cast("long").alias("row_index"),
        (F.col("id") % spec.n_cols).cast("long").alias("col_index"),
    ).select(
        "plate_id",
        "row_index",
        "col_index",
        F.char(F.col("row_index") + 65).alias("row_name"),
        (F.col("col_index") + 1).cast("string").alias("col_name"),
    ).withColumn(
        "well_path", F.concat_ws("/", F.col("row_name"), F.col("col_name"))
    )

    n_images = n_wells * spec.fields_per_well * spec.n_acquisitions
    per_well = spec.fields_per_well * spec.n_acquisitions
    well_images = spark.range(n_images).select(
        F.lit(spec.plate_id).alias("plate_id"),
        (F.col("id") / per_well).cast("long").alias("well_id"),
        ((F.col("id") / spec.fields_per_well).cast("long") % spec.n_acquisitions).alias("acquisition_id"),
        (F.col("id") % spec.fields_per_well).alias("field_index"),
    ).select(
        "plate_id",
        (F.col("well_id") / spec.n_cols).cast("long").alias("row_index"),
        (F.col("well_id") % spec.n_cols).alias("col_index"),
        "acquisition_id",
        "field_index",
    ).withColumn(
        "well_path",
        F.concat_ws("/", F.char(F.col("row_index") + 65), (F.col("col_index") + 1).cast("string")),
    ).withColumn(
        "image_path",
        F.concat_ws("/", F.col("well_path"), F.col("field_index").cast("string")),
    )
    return {"wells": wells, "well_images": well_images}


def get_well(wells: DataFrame, row_name: str, col_name: str) -> DataFrame:
    """F7 point lookup: well by (row, col) — reference hcs.py:140-160."""
    return wells.filter((F.col("row_name") == row_name) & (F.col("col_name") == col_name))


def get_image_by_acquisition(
    well_images: DataFrame, acquisition_id: int, field_index: int
) -> DataFrame:
    """F7: image by acquisition + field — reference hcs.py:300-316."""
    return well_images.filter(
        (F.col("acquisition_id") == acquisition_id) & (F.col("field_index") == field_index)
    )


def well_image_catalog(wells: DataFrame, well_images: DataFrame) -> DataFrame:
    """J3 metadata join: enrich every field image with its well's grid
    coordinates. The wells side is tiny → broadcast hash join, no
    shuffle of the (large, at real plate scale) image table."""
    return (
        well_images.alias("i")
        .join(
            F.broadcast(wells.select("plate_id", "well_path", "row_name", "col_name").alias("w")),
            ["plate_id", "well_path"],
        )
        .select(
            "plate_id", "well_path", "row_name", "col_name",
            "acquisition_id", "field_index", "image_path",
        )
    )
