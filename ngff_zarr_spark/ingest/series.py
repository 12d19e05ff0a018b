"""Glob / file-series scan (S13): a directory of per-slice images →
one pixel-table volume, decoded ON EXECUTORS.

Reference shape: dask.array.image.imread(glob) / tifffile aszarr
(/root/reference py/ngff_zarr/cli_input_to_ngff_image.py:49-73,
cli.py:409-436). Spark shape: the built-in ``binaryFile`` source lists
and reads the files (100k files fan out across the cluster; predicate
pushdown on path), ``row_number() over (order by path)`` assigns the z
index, and an Arrow ``mapInPandas`` UDF decodes each file's bytes to
pixel rows — the decode never touches the driver.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PIXEL_SCHEMA = "t long, c long, z long, y long, x long, v double"


def _default_decode(path: str, content: bytes) -> np.ndarray:
    """Pick a decoder from the file bytes (PNG/TIFF magic; NIfTI via
    extension). External libraries (imageio/tifffile), when installed,
    can be swapped in via the ``decode`` parameter."""
    from .png import png_decode
    from .tiff import tiff_decode

    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decode(content)
    if content[:2] in (b"II", b"MM"):
        return tiff_decode(content)
    if content[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decode

        return jpeg_decode(content)
    if content[:2] == b"BM":
        from .bmp import bmp_decode

        return bmp_decode(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import gif_decode

        return gif_decode(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from .webp import webp_decode

        return webp_decode(content)
    raise ValueError(f"unrecognized image format for {path}")


def series_to_pixel_df(
    spark: SparkSession,
    glob: str,
    decode: Optional[Callable[[str, bytes], np.ndarray]] = None,
    expected_shape: Optional[tuple[int, int]] = None,
) -> DataFrame:
    """Read a glob of 2-D slice images as one (z, y, x) pixel table;
    z = lexicographic file order (the reference's glob-sorted stacking).

    ``expected_shape`` (h, w), when given, makes every slice's decoded
    geometry checked on the executor — a series with one mismatched
    slice fails loudly instead of emitting out-of-volume coordinates
    (the reference's dask imread stack errors on non-uniform shapes
    too; cli_input_to_ngff_image.py:49-73).
    """
    decode_fn = decode or _default_decode
    files = spark.read.format("binaryFile").load(glob)
    # NOTE: the global row_number is a single-partition sort of the FILE
    # LIST (one row per file), not of pixel data — harmless at millions
    # of files; the pixel decode below stays fully parallel. The
    # non-foldable constant-zero partition silences WindowExec's "No
    # Partition Defined" warning.
    w = Window.partitionBy(
        F.length("path") - F.length("path")
    ).orderBy("path")
    indexed = files.select(
        "path", "content", (F.row_number().over(w) - 1).alias("z")
    ).repartition(F.col("z"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                arr = decode_fn(row["path"], row["content"])
                if arr.ndim != 2:
                    raise ValueError(
                        f"series slice {row['path']} must be 2-D, got {arr.shape}"
                    )
                if expected_shape is not None and arr.shape != tuple(expected_shape):
                    raise ValueError(
                        f"series slice {row['path']} is {arr.shape}, "
                        f"expected {tuple(expected_shape)} — all slices of a "
                        "series must share one shape"
                    )
                h, wdt = arr.shape
                yy, xx = np.divmod(np.arange(arr.size, dtype=np.int64), wdt)
                yield pd.DataFrame(
                    {
                        "t": np.zeros(arr.size, dtype=np.int64),
                        "c": np.zeros(arr.size, dtype=np.int64),
                        "z": np.full(arr.size, row["z"], dtype=np.int64),
                        "y": yy,
                        "x": xx,
                        "v": arr.reshape(-1).astype(np.float64),
                    }
                )

    return indexed.mapInPandas(decode_batches, PIXEL_SCHEMA)


def series_to_ngff_image(spark: SparkSession, glob: str, name: str = "series"):
    """S13 complete: series scan → NgffImage (shape from one decoded
    sample + the file count; no full materialization)."""
    from ..model import NgffImage

    files = spark.read.format("binaryFile").load(glob)
    n_files = files.count()
    sample = files.orderBy("path").limit(1).collect()[0]
    arr = _default_decode(sample["path"], sample["content"])
    df = series_to_pixel_df(
        spark, glob, expected_shape=(int(arr.shape[0]), int(arr.shape[1]))
    )
    dims = ["z", "y", "x"]
    shape = {"z": int(n_files), "y": int(arr.shape[0]), "x": int(arr.shape[1])}
    return NgffImage(
        data=df,
        dims=dims,
        shape=shape,
        scale={d: 1.0 for d in dims},
        translation={d: 0.0 for d in dims},
        name=name,
        dtype=arr.dtype.name,
    )
