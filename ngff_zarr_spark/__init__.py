"""ngff_zarr_spark — a PySpark-native engine with the query and
data-processing capabilities of fideus-labs/ngff-zarr.

The reference (studied read-only at /root/reference) is an OME-Zarr
(OME-NGFF) multiscale N-dimensional image library whose compute substrate
is Dask. This package re-expresses the same capabilities Spark-first:

- Images are DataFrames in two coexisting layouts (SURVEY.md §1.3):
  a *pixel table* ``(image_id, scale, t, c, z, y, x, v)`` for SQL-checkable
  compute, and a *chunk table* ``(image_id, scale, chunk_key..., payload)``
  for I/O with the OME-Zarr DataSource.
- The reference's 8 downsampling methods become DataFrame aggregates /
  window convolutions (``operators/``), its store read/write becomes a
  PySpark Python DataSource (``sources/``), its pyramid planner and
  metadata math become driver-side pure functions (``plans/``), and its
  HCS plate catalog becomes partitioned metadata DataFrames (``hcs``).
- Beyond the reference, the LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) live in
  ``functions/``.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning and join planning; Pandas UDFs appear only where built-ins cannot
express the semantics (image codec decode, per-chunk kernels).
"""

from .model import NgffImage, Multiscales, Axis, Dataset, ScaleTransform, TranslationTransform
from .session import get_spark
from .plans.planner import (
    pyramid_scale_factors,
    next_scale_metadata,
    propagate_scale_translation,
    compute_sigma,
)

__version__ = "0.1.0"

__all__ = [
    "NgffImage",
    "Multiscales",
    "Axis",
    "Dataset",
    "ScaleTransform",
    "TranslationTransform",
    "get_spark",
    "pyramid_scale_factors",
    "next_scale_metadata",
    "propagate_scale_translation",
    "compute_sigma",
]
