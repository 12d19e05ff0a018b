"""Projection / filter / slicing operators (SURVEY.md §2.2, F1-F5).

All are single Catalyst filters/projections — they push down to the
source scan (parquet row-group pruning or, with the ome_zarr
DataSource, chunk-key pruning) and involve no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def level_pick(df: DataFrame, scale: int, scale_col: str = "scale") -> DataFrame:
    """F1: pick one pyramid level from a level-unioned pixel table."""
    return df.filter(F.col(scale_col) == scale)


def roi(df: DataFrame, **ranges: tuple[int, int]) -> DataFrame:
    """F2: region-of-interest slice. ``ranges`` maps dim → (lo, hi)
    half-open, e.g. ``roi(df, z=(0, 8), y=(16, 48), x=(16, 48))``.
    Becomes chunk-range pushdown in the DataSource."""
    cond = F.lit(True)
    for d, (lo, hi) in ranges.items():
        cond = cond & (F.col(d) >= lo) & (F.col(d) < hi)
    return df.filter(cond)


def timepoint(df: DataFrame, t_index: int) -> DataFrame:
    """F3: timepoint selection (reference ngff_image_to_itk_image.py:48-69)."""
    return df.filter(F.col("t") == t_index)


def channel(df: DataFrame, c_index: int) -> DataFrame:
    """F4: channel selection (reference ngff_image_to_itk_image.py:71-92)."""
    return df.filter(F.col("c") == c_index)


def transpose_dims(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """F5: dim reorder / axis canonicalization. On the pixel table a
    transpose is just a column *rename/permutation* — free, no data
    movement (the physical transpose the reference performs on dense
    arrays only matters at dense export). ``mapping`` maps old → new
    dim name, e.g. ``{'y': 'x', 'x': 'y'}`` swaps axes."""
    cols = []
    for name in df.columns:
        cols.append(F.col(name).alias(mapping.get(name, name)))
    return df.select(*cols)
