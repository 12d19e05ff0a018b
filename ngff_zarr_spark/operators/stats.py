"""Statistics / cost-estimate operators (SURVEY.md A10, A11)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_max(df: DataFrame, value_col: str = "v") -> DataFrame:
    """A10: data min/max, e.g. for OMERO display windows
    (reference nibabel_image_to_ngff_image.py:218-220). One partial-agg
    pass, no shuffle beyond the final 1-row combine."""
    return df.agg(
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
    )


def chunk_cost(chunk_df: DataFrame) -> DataFrame:
    """A11: cost estimators over the chunk table — task count and total
    bytes (reference memory_usage.py:8-24, task_count.py:8-20). With the
    ome_zarr DataSource the chunk table carries ``nbytes`` per chunk."""
    return chunk_df.agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("nbytes").cast("long").alias("total_bytes"),
    )
