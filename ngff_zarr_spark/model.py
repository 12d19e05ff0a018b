"""Core data model: the Spark re-expression of the reference's abstractions.

Reference parity (SURVEY.md §1.1):
- ``NgffImage``      ↔ /root/reference py/ngff_zarr/ngff_image.py:14-23
- ``Multiscales``    ↔ py/ngff_zarr/multiscales.py:12-25
- ``Axis``/transforms/``Dataset`` ↔ py/ngff_zarr/v04/zarr_metadata.py:141-172
- ``Omero*``         ↔ py/ngff_zarr/v04/zarr_metadata.py:175-196
- dims defaulting    ↔ py/ngff_zarr/to_ngff_image.py:60-80

The *data* lives in a Spark DataFrame (pixel table — one row per voxel,
columns ``t, c, z, y, x, v``; absent dims pinned to 0), the *metadata*
in plain dataclasses on the driver. Laziness comes for free: the
DataFrame is an unexecuted Catalyst logical plan, the analog of the
reference's unexecuted Dask graph.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Dim / unit vocabulary (reference py/ngff_zarr/v04/zarr_metadata.py:75-138)

SUPPORTED_DIMS = ("t", "c", "z", "y", "x")

SPACE_UNITS = {
    "angstrom", "attometer", "centimeter", "decimeter", "exameter",
    "femtometer", "foot", "gigameter", "hectometer", "inch", "kilometer",
    "megameter", "meter", "micrometer", "mile", "millimeter", "nanometer",
    "parsec", "petameter", "picometer", "terameter", "yard", "yoctometer",
    "yottameter", "zeptometer", "zettameter",
}

TIME_UNITS = {
    "attosecond", "centisecond", "day", "decisecond", "exasecond",
    "femtosecond", "gigasecond", "hectosecond", "hour", "kilosecond",
    "megasecond", "microsecond", "millisecond", "minute", "nanosecond",
    "petasecond", "picosecond", "second", "terasecond", "yoctosecond",
    "yottasecond", "zeptosecond", "zettasecond",
}


def is_dimension_supported(dim: str) -> bool:
    """Parity: v04/zarr_metadata.py:131-133."""
    return dim in SUPPORTED_DIMS


def is_unit_supported(unit: str) -> bool:
    """Parity: v04/zarr_metadata.py:136-138."""
    return unit in SPACE_UNITS or unit in TIME_UNITS


def dim_axis_type(dim: str) -> str:
    """dim → OME axis type (to_multiscales.py:361-380)."""
    return {"t": "time", "c": "channel"}.get(dim, "space")


def default_dims(ndim: int) -> list[str]:
    """Positional dim defaulting (reference to_ngff_image.py:60-69):
    ndim<4 → trailing of (z,y,x); 4 → (z,y,x,c); 5 → (t,z,y,x,c)."""
    if ndim > 5:
        raise ValueError(f"Unsupported ndim {ndim}; supply dims explicitly")
    if ndim == 4:
        return ["z", "y", "x", "c"]
    if ndim == 5:
        return ["t", "z", "y", "x", "c"]
    return list(("z", "y", "x")[3 - ndim:])


# ---------------------------------------------------------------------------
# Metadata dataclasses (serializable to OME-Zarr JSON; see sources/ome_zarr)


@dataclass
class Axis:
    """OME axis (v04/zarr_metadata.py:141-146)."""

    name: str
    type: str
    unit: Optional[str] = None
    orientation: Optional[str] = None  # RFC-4

    def __post_init__(self):
        if not is_dimension_supported(self.name):
            raise ValueError(f"Unsupported dimension {self.name!r}")
        if self.unit is not None and not is_unit_supported(self.unit):
            raise ValueError(f"Unsupported unit {self.unit!r}")


@dataclass
class ScaleTransform:
    """coordinateTransformation type=scale (v04/zarr_metadata.py:154-157)."""

    scale: list[float]
    type: str = "scale"


@dataclass
class TranslationTransform:
    """coordinateTransformation type=translation (v04/zarr_metadata.py:160-163)."""

    translation: list[float]
    type: str = "translation"


@dataclass
class Dataset:
    """One pyramid level's store path + transforms (v04/zarr_metadata.py:169-172)."""

    path: str
    coordinateTransformations: list


_HEX_COLOR = re.compile(r"^[0-9A-Fa-f]{6}$")


@dataclass
class OmeroWindow:
    min: float
    max: float
    start: float
    end: float


@dataclass
class OmeroChannel:
    """Display channel; color validated like v04/zarr_metadata.py:189-191."""

    color: str
    window: OmeroWindow
    label: Optional[str] = None

    def __post_init__(self):
        if not _HEX_COLOR.match(self.color):
            raise ValueError(f"Invalid color {self.color!r}: must be 6 hex digits")


@dataclass
class Omero:
    channels: list


@dataclass
class Metadata:
    """multiscales metadata entry (v0.4 shape, v04/zarr_metadata.py:257-265).

    For OME-Zarr 0.5 (RFC 2 / Zarr v3) the ``version`` moves to the
    top-level ``ome`` key — handled at serialization time
    (sources/ome_zarr_store.py), the in-memory model is shared.
    """

    axes: list
    datasets: list
    name: str = "image"
    version: str = "0.4"
    coordinateTransformations: Optional[list] = None
    omero: Optional[Omero] = None
    type: Optional[str] = None  # downsample method name
    metadata: Optional[dict] = None  # method provenance


# ---------------------------------------------------------------------------
# Images


@dataclass
class NgffImage:
    """One resolution level (reference ngff_image.py:14-23).

    ``data`` is the lazy pixel-table DataFrame with columns
    ``(t, c, z, y, x, v)``; dims absent from ``dims`` are constant 0.
    ``shape``/``chunks`` are per-dim metadata the reference keeps on the
    Dask array itself; in the relational model they ride alongside.
    """

    data: DataFrame
    dims: list[str]
    shape: dict[str, int]
    scale: dict[str, float]
    translation: dict[str, float]
    name: str = "image"
    axes_units: Optional[dict[str, str]] = None
    axes_orientations: Optional[dict[str, str]] = None
    chunks: Optional[dict[str, int]] = None
    # logical array dtype (numpy name, e.g. 'uint16'): the pixel table's
    # v column is always DOUBLE (exact for ints ≤ 2^53 and float32), but
    # stores must round-trip the source dtype byte-identically (SURVEY
    # §1.2; reference keeps it on the Dask array). Writers default to it.
    dtype: str = "float64"
    # T3: callbacks fired after this level's data is materialized by a
    # write (reference ngff_image.py:11,23; invoked to_ngff_zarr.py:
    # 949-951,1170-1174 — used there for cache cleanup)
    computed_callbacks: list = field(default_factory=list)

    def __post_init__(self):
        for d in self.dims:
            if not is_dimension_supported(d):
                raise ValueError(f"Unsupported dimension {d!r}")

    def spatial_dims(self) -> list[str]:
        return [d for d in self.dims if d in ("z", "y", "x")]


@dataclass
class Multiscales:
    """Pyramid (reference multiscales.py:12-25): one NgffImage per level
    plus the metadata used to build it."""

    images: list
    metadata: Optional[Metadata] = None
    scale_factors: Optional[list] = None
    method: Optional[str] = None
    chunks: Optional[dict] = None


def rename_image_dims(img, new_dims: list[str]) -> None:
    """Rename an image's dims IN PLACE — metadata AND pixel columns.

    The pixel table carries all five canonical dim columns even when
    the image is lower-dimensional (constant t/c/z), so a rename onto a
    canonical-but-unused dim (e.g. y→z on a 2D image) collides with
    that constant column: resolve by swap — the constant column takes a
    vacated source name. Applied as ONE select projection
    (withColumnsRenamed renames sequentially; a permutation like
    ``z y x → y z x`` would emit duplicate columns). Raises ValueError
    on length mismatch / unsupported / duplicate names.

    Every consumer selects coordinates BY dim name (write_image's
    chunk keys, operators, metadata axes), so renaming metadata without
    the columns silently collapses planes — always go through here.
    """
    from pyspark.sql import functions as F

    if len(new_dims) != len(img.dims):
        raise ValueError(f"dims: expected {len(img.dims)} names for this input")
    bad = [d for d in new_dims if d not in SUPPORTED_DIMS]
    if bad:
        raise ValueError(
            f"dims: unsupported name(s) {bad}; valid: {list(SUPPORTED_DIMS)}"
        )
    if len(set(new_dims)) != len(new_dims):
        raise ValueError("dims: names must be distinct")
    rename = dict(zip(img.dims, new_dims))
    untouched = [c for c in img.data.columns if c not in rename]
    vacated = [s for s in rename if s not in rename.values()]
    for t in list(rename.values()):
        if t in untouched:
            rename[t] = vacated.pop()
    img.data = img.data.select(
        *[F.col(c).alias(rename.get(c, c)) for c in img.data.columns]
    )
    img.shape = {rename.get(d, d): n for d, n in img.shape.items()}
    img.scale = {rename.get(d, d): s for d, s in img.scale.items()}
    img.translation = {rename.get(d, d): s for d, s in img.translation.items()}
    img.dims = list(new_dims)


def to_ngff_image(
    data: DataFrame,
    dims: Optional[list[str]] = None,
    shape: Optional[dict[str, int]] = None,
    scale: Optional[dict[str, float]] = None,
    translation: Optional[dict[str, float]] = None,
    name: str = "image",
    axes_units: Optional[dict[str, str]] = None,
) -> NgffImage:
    """S3 ingest defaulting (reference to_ngff_image.py:20-95): fill in
    dims positionally and default scale=1.0 / translation=0.0 on spatial
    dims. ``data`` must already be a pixel table; ``shape`` is computed
    lazily from the data when absent (an agg, not a collect of pixels).
    """
    if dims is None:
        # infer dims from which coordinate columns vary is not free; default 3D
        dims = [d for d in ("t", "c", "z", "y", "x") if d in data.columns]
    if shape is None:
        from pyspark.sql import functions as F

        row = data.agg(
            *[(F.max(d) + 1).alias(d) for d in dims if d in data.columns]
        ).first()
        shape = {d: int(row[d]) for d in dims if d in data.columns}
    scale = dict(scale or {})
    translation = dict(translation or {})
    for d in dims:
        if d in ("z", "y", "x"):
            scale.setdefault(d, 1.0)
            translation.setdefault(d, 0.0)
    return NgffImage(
        data=data,
        dims=list(dims),
        shape=shape,
        scale=scale,
        translation=translation,
        name=name,
        axes_units=axes_units,
    )
