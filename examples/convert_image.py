"""Image conversion walkthrough: any supported raster/volume format ->
OME-Zarr pyramid -> ROI read-back.

Run:  python examples/convert_image.py

Mirrors the reference CLI's core flow (`ngff-zarr -i in -o out.ome.zarr`)
through the library API, using a synthetic MGH volume as the input.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from ngff_zarr_spark.ingest import cli_input_to_ngff_image, detect_cli_io_backend
from ngff_zarr_spark.ingest.mgh import mgh_encode
from ngff_zarr_spark.ome_zarr_api import from_ngff_zarr, to_multiscales, to_ngff_zarr
from ngff_zarr_spark.session import get_spark


def main() -> None:
    spark = get_spark("convert_image")
    work = tempfile.mkdtemp(prefix="convert_example_")

    # 1. a source volume (any of TIFF/PNG/JPEG/BMP/NRRD/MHA/NIfTI/
    #    DICOM/MGH/MRC/GIF/WebP would do)
    src = os.path.join(work, "brain.mgh")
    zi, yi, xi = np.indices((16, 32, 32))
    vol = ((zi * 73 + yi * 179 + xi * 283) % 251).astype("int16")
    with open(src, "wb") as f:
        f.write(mgh_encode(vol, spacing=(2.0, 1.0, 1.0)))

    # 2. detect -> ingest -> pyramid -> OME-Zarr 0.4
    backend = detect_cli_io_backend([src])
    img = cli_input_to_ngff_image(spark, backend, [src])
    ms = to_multiscales(img, scale_factors=[{"z": 2, "y": 2, "x": 2}],
                        method="ITKWASM_BIN_SHRINK", chunks={"z": 8, "y": 16, "x": 16})
    out = os.path.join(work, "brain.ome.zarr")
    to_ngff_zarr(out, ms, version="0.4")
    print(f"wrote {out}")

    # 3. lazy ROI read-back (predicate pushdown prunes chunks)
    ms2 = from_ngff_zarr(spark, out)
    roi = ms2.images[0].data.filter((F.col("z") >= 4) & (F.col("z") < 8))
    roi.groupBy("z").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")) \
       .orderBy("z").show()


if __name__ == "__main__":
    main()
