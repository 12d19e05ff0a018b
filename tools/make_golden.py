"""Generate the committed golden stores under tests/golden/.

Run once (and whenever the on-disk format intentionally changes):
    python tools/make_golden.py
The golden test (tests/test_golden.py) rewrites the same deterministic
inputs and requires key-by-key, byte-for-byte equality with these
committed stores — pinning chunk encoding (gzip mtime=0, blosc
container, shard index), metadata JSON, and layout across rounds, the
engine's analog of the reference's baseline-store harness
(/root/reference py/test/_data.py:104-177).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def write_golden_stores(spark, base_dir: str) -> list[str]:
    """Write the golden store set into base_dir; returns store names."""
    from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
    from ngff_zarr_spark.model import NgffImage
    from ngff_zarr_spark.ome_zarr_api import to_multiscales, to_ngff_zarr

    spec = ImageSpec("golden", z=5, y=9, x=8)
    img = NgffImage(
        data=pixel_df(spark, spec).select("t", "c", "z", "y", "x", "v"),
        dims=["z", "y", "x"],
        shape={"z": 5, "y": 9, "x": 8},
        scale={"z": 2.0, "y": 1.5, "x": 1.5},
        translation={"z": 10.0, "y": 0.0, "x": 0.0},
        name="golden",
        dtype="uint16",
    )
    ms = to_multiscales(
        img,
        scale_factors=[{"z": 1, "y": 2, "x": 2}],
        method="ITKWASM_BIN_SHRINK",
        chunks={"z": 4, "y": 4, "x": 4},
    )
    names = []
    for name, kwargs in [
        ("v04_gzip", dict(version="0.4", compressor="gzip", dtype="float64")),
        ("v04_blosc_u16", dict(version="0.4", compressor="blosc:lz4:5:1")),
        ("v05_zstd_sharded", dict(version="0.5", compressor="zstd", dtype="float64", chunks_per_shard=2)),
    ]:
        path = os.path.join(base_dir, f"{name}.ome.zarr")
        shutil.rmtree(path, ignore_errors=True)
        to_ngff_zarr(path, ms, **kwargs)
        names.append(f"{name}.ome.zarr")
    return names


def main():
    from ngff_zarr_spark.session import get_spark

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark("make_golden")
    names = write_golden_stores(spark, GOLDEN_DIR)
    print(f"wrote golden stores: {names} -> {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
