"""The full imaging journey: multi-page TIFF series -> Gaussian
pyramid -> sharded+compressed OME-Zarr 0.5 -> pruned ROI read-back ->
0.5 -> 0.4 conversion -> validation.

Run:  python examples/imaging_pipeline.py

This is the user-facing composition of the imaging_pipeline_battery
gate (the reference CLI's primary workflow, `ngff-zarr -i series.tif
-o out.ome.zarr` plus conversion/validation verbs) through the library
API. Every stage here is digest-checked against a DuckDB twin in the
gate registry.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from ngff_zarr_spark.ingest import cli_input_to_ngff_image, detect_cli_io_backend
from ngff_zarr_spark.ingest.tiff import tiff_encode_pages
from ngff_zarr_spark.ome_zarr_api import (
    convert_ome_zarr_version,
    from_ngff_zarr,
    to_multiscales,
    to_ngff_zarr,
)
from ngff_zarr_spark.session import get_spark
from ngff_zarr_spark.sources.zarr_store import open_store
from ngff_zarr_spark.validate import sniff_store_attrs, validate_best_effort


def main() -> None:
    spark = get_spark("imaging_pipeline")
    work = tempfile.mkdtemp(prefix="imaging_example_")

    # 1. a multi-page TIFF z-stack (LZW + predictor 2 + tiled layout)
    src = os.path.join(work, "stack.tif")
    nz, h, w = 16, 64, 64
    yi, xi = np.indices((h, w))
    pages = [((z * 73 + yi * 179 + xi * 283) % 251).astype("uint16")
             for z in range(nz)]
    with open(src, "wb") as f:
        f.write(tiff_encode_pages(pages, compression=5, predictor=2, tile=(32, 32)))

    # 2. detect -> ingest -> Gaussian pyramid -> SHARDED zstd 0.5 store
    backend = detect_cli_io_backend([src])
    img = cli_input_to_ngff_image(spark, backend, [src])
    ms = to_multiscales(
        img, scale_factors=[{"z": 2, "y": 2, "x": 2}],
        method="ITKWASM_GAUSSIAN", chunks={"z": 8, "y": 16, "x": 16},
    )
    store05 = os.path.join(work, "stack05.ome.zarr")
    to_ngff_zarr(store05, ms, version="0.5", compressor="zstd", chunks_per_shard=2)
    print(f"wrote {store05} (zarr v3, sharding_indexed, zstd)")

    # 3. pruned ROI read-back — the coordinate predicates reach the
    #    DataSource and prune chunks before tasks launch
    ms2 = from_ngff_zarr(spark, store05)
    roi = ms2.images[0].data.filter(
        (F.col("z") >= 4) & (F.col("z") < 8) & (F.col("x") < 32)
    )
    n_roi = roi.count()
    print(f"ROI rows: {n_roi}")

    # 4. convert the store to OME-Zarr 0.4 (zarr v2) — data copied
    #    verbatim, metadata retagged
    store04 = os.path.join(work, "stack04.ome.zarr")
    convert_ome_zarr_version(spark, store05, store04, "0.4")
    print(f"converted -> {store04} (zarr v2)")

    # 5. validate both stores against the vendored OME-NGFF schemas
    for tag, path, root in (("0.5", store05, "zarr.json"), ("0.4", store04, ".zattrs")):
        attrs = open_store(path).get_json(root)
        if root == "zarr.json":
            attrs = attrs.get("attributes", {})
        version, model = sniff_store_attrs(attrs)
        problems = validate_best_effort(attrs, version=version, model=model)
        print(f"validate {tag}: version={version} problems={len(problems)}")
        assert not problems, problems

    print("imaging pipeline complete")


if __name__ == "__main__":
    main()
