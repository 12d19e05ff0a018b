"""ITK/ITK-Wasm image interop (S14/S15).

The itkwasm ``Image`` is a plain dataclass-of-arrays (data, imageType,
origin, spacing, direction, size) — representable as a dict without the
library. These adapters implement the reference's conversion semantics
(/root/reference py/ngff_zarr/itk_image_to_ngff_image.py:11-82,
ngff_image_to_itk_image.py:39-145) against that dict shape; when the
real ``itk``/``itkwasm`` packages are installed the same functions
accept their image objects (attribute access falls back to keys).

Semantics carried over:
- dims inference from ndim + components: 2→(y,x), 3→(z,y,x) or (y,x,c)
  when isVectorImage, 4→(z,y,x,c), with spacing/origin REVERSED into
  dim order (ITK stores x,y,z; dims list z,y,x);
- LPS anatomical orientations on spatial dims (RFC-4);
- export: optional t/c index selection, channel-last transpose, dtype
  → componentType map restricted to ITK's supported set.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..model import NgffImage
from ..rfc4 import itk_lps_to_anatomical_orientation

# ITK interop dtype restriction (ngff_image_to_itk_image.py:12-36)
ITK_COMPONENT_TYPES = {
    "int8", "uint8", "int16", "uint16", "int32", "uint32",
    "int64", "uint64", "float32", "float64",
}


def _get(image, attr, default=None):
    if isinstance(image, dict):
        return image.get(attr, default)
    return getattr(image, attr, default)


def itk_image_to_ngff_image(
    spark, itk_image, add_anatomical_orientation: bool = True
) -> NgffImage:
    """S14: itk/itkwasm image (or dict with the same fields) → NgffImage."""
    from .nifti import array_to_pixel_df

    data = np.asarray(_get(itk_image, "data"))
    is_vector = False
    image_type = _get(itk_image, "imageType")
    if image_type is not None:
        comps = _get(image_type, "components", 1)
        is_vector = comps and int(comps) > 1
    ndim = data.ndim
    if ndim == 2:
        dims = ["y", "x"]
    elif ndim == 3:
        dims = ["y", "x", "c"] if is_vector else ["z", "y", "x"]
    elif ndim == 4:
        dims = ["z", "y", "x", "c"]
    else:
        raise ValueError(f"Unsupported ITK image ndim {ndim}")

    spacing = list(_get(itk_image, "spacing", []) or [])
    origin = list(_get(itk_image, "origin", []) or [])
    spatial = [d for d in dims if d in ("z", "y", "x")]
    # ITK orders spacing/origin (x, y, z); dims list is (…, z, y, x)
    scale = dict(zip(reversed(spatial), spacing)) if spacing else {d: 1.0 for d in spatial}
    translation = (
        dict(zip(reversed(spatial), origin)) if origin else {d: 0.0 for d in spatial}
    )
    axes_orientations = None
    if add_anatomical_orientation:
        axes_orientations = {}
        for d in spatial:
            orientation = itk_lps_to_anatomical_orientation(d)
            if orientation is not None:
                axes_orientations[d] = orientation.value

    df = array_to_pixel_df(spark, data, dims)
    return NgffImage(
        data=df,
        dims=dims,
        shape={d: int(s) for d, s in zip(dims, data.shape)},
        scale={d: float(scale.get(d, 1.0)) for d in spatial},
        translation={d: float(translation.get(d, 0.0)) for d in spatial},
        name=str(_get(itk_image, "name", "image")),
        axes_orientations=axes_orientations,
        dtype=data.dtype.name,
    )


def ngff_image_to_itk_image(
    image: NgffImage,
    t_index: Optional[int] = None,
    c_index: Optional[int] = None,
) -> dict:
    """S15: NgffImage → itkwasm-Image-shaped dict. Collects the pixel
    table to a dense array (export is inherently a materialization —
    the reference's dask .compute() equivalent); t/c selected by index
    when the image has those dims, channel moved last."""
    from pyspark.sql import functions as F

    dims = list(image.dims)
    df = image.data
    if "t" in dims:
        if t_index is None:
            if image.shape.get("t", 1) > 1:
                raise ValueError("t_index required for multi-timepoint export")
            t_index = 0
        df = df.filter(F.col("t") == int(t_index))
        dims = [d for d in dims if d != "t"]
    if "c" in dims and c_index is not None:
        df = df.filter(F.col("c") == int(c_index))
        dims = [d for d in dims if d != "c"]
    # channel-last transpose (reference _channel_dim_last)
    if "c" in dims:
        dims = [d for d in dims if d != "c"] + ["c"]

    dtype = image.dtype or "float64"
    if dtype == "float16":
        dtype = "float32"  # widen (reference restriction)
    if dtype not in ITK_COMPONENT_TYPES:
        raise ValueError(f"dtype {dtype} not supported by ITK interop")
    shape = tuple(image.shape[d] for d in dims)
    arr = np.zeros(shape, dtype=dtype)
    pdf = df.select(*dims, "v").toPandas()
    idx = tuple(pdf[d].to_numpy() for d in dims)
    arr[idx] = pdf["v"].to_numpy().astype(dtype)

    spatial = [d for d in dims if d in ("z", "y", "x")]
    components = image.shape.get("c", 1) if "c" in dims else 1
    return {
        "data": arr,
        "imageType": {
            "dimension": len(spatial),
            "componentType": dtype,
            "pixelType": "VariableLengthVector" if components > 1 else "Scalar",
            "components": int(components),
        },
        # reversed back to ITK (x, y, z) order
        "spacing": [float(image.scale.get(d, 1.0)) for d in reversed(spatial)],
        "origin": [float(image.translation.get(d, 0.0)) for d in reversed(spatial)],
        "direction": np.eye(len(spatial)).tolist(),
        "size": [int(image.shape[d]) for d in reversed(spatial)],
        "name": image.name,
    }
