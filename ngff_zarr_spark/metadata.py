"""OME-Zarr multiscales metadata (de)serialization + version conversion.

Parity targets in /root/reference:
- serialize/prune:  ``asdict`` + ``_pop_metadata_optionals``
  py/ngff_zarr/to_ngff_zarr.py:48-63, 1040-1042 (C6)
- parse:            from_ngff_zarr.py:101-254
- 0.4 ↔ 0.5:        ``_prepare_metadata`` to_ngff_zarr.py:355-396 (C9);
  v0.4 stores put ``multiscales`` in group attrs (Zarr v2), v0.5 nests
  everything under a top-level ``ome`` key with the version (Zarr v3,
  RFC 2).
- validation:       driver-side structural checks (C4/C5/C7 subset —
  full JSON-Schema validation requires the bundled schemas; structural
  checks cover the invariants the reference's tests exercise).
"""

from __future__ import annotations

from typing import Optional

from .model import (
    Axis,
    Dataset,
    Metadata,
    Omero,
    OmeroChannel,
    OmeroWindow,
    ScaleTransform,
    TranslationTransform,
    dim_axis_type,
    is_dimension_supported,
    is_unit_supported,
)


def metadata_to_dict(meta: Metadata, version: str) -> dict:
    """Serialize one multiscales entry, pruning absent optionals."""
    axes = []
    for a in meta.axes:
        d = {"name": a.name, "type": a.type}
        if a.unit:
            d["unit"] = a.unit
        if a.orientation:
            d["orientation"] = a.orientation
        axes.append(d)
    datasets = []
    for ds in meta.datasets:
        transforms = []
        for t in ds.coordinateTransformations:
            if isinstance(t, ScaleTransform):
                transforms.append({"type": "scale", "scale": list(t.scale)})
            elif isinstance(t, TranslationTransform):
                transforms.append({"type": "translation", "translation": list(t.translation)})
            else:
                transforms.append(dict(t))
        datasets.append({"path": ds.path, "coordinateTransformations": transforms})
    doc = {"axes": axes, "datasets": datasets, "name": meta.name}
    if version == "0.4":
        doc["version"] = version
    if meta.type:
        doc["type"] = meta.type
    if meta.metadata:
        doc["metadata"] = meta.metadata
    return doc


def omero_to_dict(omero: Omero) -> dict:
    return {
        "channels": [
            {
                "color": ch.color,
                "window": {
                    "min": ch.window.min,
                    "max": ch.window.max,
                    "start": ch.window.start,
                    "end": ch.window.end,
                },
                **({"label": ch.label} if ch.label else {}),
            }
            for ch in omero.channels
        ]
    }


def group_attributes(meta: Metadata, version: str) -> dict:
    """Root-group attributes for the store: v0.4 puts ``multiscales`` (+
    ``omero``) at top level; v0.5 nests under ``ome`` with the version."""
    ms = metadata_to_dict(meta, version)
    if version == "0.5":
        attrs: dict = {"ome": {"version": "0.5", "multiscales": [ms]}}
        if meta.omero:
            attrs["ome"]["omero"] = omero_to_dict(meta.omero)
        return attrs
    attrs = {"multiscales": [ms]}
    if meta.omero:
        attrs["omero"] = omero_to_dict(meta.omero)
    return attrs


def parse_group_attributes(attrs: dict) -> tuple[Metadata, str]:
    """Inverse of group_attributes, tolerant of 0.1-0.5 layouts."""
    if "ome" in attrs:  # 0.5+
        version = attrs["ome"].get("version", "0.5")
        ms = attrs["ome"]["multiscales"][0]
        omero_doc = attrs["ome"].get("omero")
    else:
        ms = attrs["multiscales"][0]
        version = ms.get("version", "0.4")
        omero_doc = attrs.get("omero")
    # Axes across layout generations (reference from_ngff_zarr.py:107-179):
    # 0.1/0.2 — no "axes" key at all → implicit (t, c, z, y, x);
    # 0.3     — axes are plain name strings;
    # 0.4/0.5 — axes are {name, type, unit[, orientation]} dicts.
    raw_axes = ms.get("axes")
    if not raw_axes:
        axes = [Axis(name=d, type=dim_axis_type(d)) for d in ("t", "c", "z", "y", "x")]
    else:
        axes = [
            (
                Axis(name=a, type=dim_axis_type(a))
                if isinstance(a, str)
                else Axis(
                    name=a["name"],
                    type=a.get("type", dim_axis_type(a["name"])),
                    unit=a.get("unit"),
                    orientation=a.get("orientation"),
                )
            )
            for a in raw_axes
        ]
    datasets = []
    for d in ms["datasets"]:
        transforms = []
        for t in d.get("coordinateTransformations", []):
            if t["type"] == "scale":
                transforms.append(ScaleTransform(scale=list(t["scale"])))
            elif t["type"] == "translation":
                transforms.append(TranslationTransform(translation=list(t["translation"])))
        datasets.append(Dataset(path=d["path"], coordinateTransformations=transforms))
    omero = None
    if omero_doc:
        channels = []
        for ch in omero_doc.get("channels", []):
            w = ch.get("window")
            if not isinstance(w, dict):
                continue
            # backward compat (reference from_ngff_zarr.py:209-238): old
            # stores carry min/max only, some start/end only, some both
            if "start" in w and "end" in w:
                start, end = float(w["start"]), float(w["end"])
                mn = float(w.get("min", start))
                mx = float(w.get("max", end))
            elif "min" in w and "max" in w:
                mn, mx = float(w["min"]), float(w["max"])
                start, end = mn, mx
            else:
                continue
            channels.append(
                OmeroChannel(
                    color=ch.get("color", "FFFFFF"),
                    window=OmeroWindow(min=mn, max=mx, start=start, end=end),
                    label=ch.get("label"),
                )
            )
        omero = Omero(channels=channels)
    meta = Metadata(
        axes=axes,
        datasets=datasets,
        name=ms.get("name", "image"),
        version=version,
        omero=omero,
        type=ms.get("type"),
        metadata=ms.get("metadata"),
    )
    return meta, version


def convert_version(meta: Metadata, target: str) -> Metadata:
    """C9: 0.4 ↔ 0.5 metadata conversion — the in-memory model is version
    agnostic; only the serialized layout differs, so this is a version
    retag (the store writer picks zarr_format 2 vs 3 accordingly)."""
    if target not in ("0.4", "0.5"):
        raise ValueError(f"Unsupported target version {target!r}")
    return Metadata(
        axes=meta.axes,
        datasets=meta.datasets,
        name=meta.name,
        version=target,
        coordinateTransformations=meta.coordinateTransformations,
        omero=meta.omero,
        type=meta.type,
        metadata=meta.metadata,
    )


def validate_metadata(meta: Metadata) -> list[str]:
    """Structural validation (C4/C5/C7 subset): returns a list of
    problems (empty = valid)."""
    problems = []
    if not meta.axes:
        problems.append("multiscales must declare axes")
    seen = set()
    for a in meta.axes:
        if not is_dimension_supported(a.name):
            problems.append(f"unsupported axis name {a.name!r}")
        if a.name in seen:
            problems.append(f"duplicate axis {a.name!r}")
        seen.add(a.name)
        if a.unit and not is_unit_supported(a.unit):
            problems.append(f"unsupported unit {a.unit!r}")
    if not meta.datasets:
        problems.append("multiscales must declare datasets")
    ndim = len(meta.axes)
    for ds in meta.datasets:
        for t in ds.coordinateTransformations:
            vals = getattr(t, "scale", None) or getattr(t, "translation", None)
            if vals is not None and len(vals) != ndim:
                problems.append(
                    f"dataset {ds.path!r}: transform length {len(vals)} != ndim {ndim}"
                )
        types = [t.type for t in ds.coordinateTransformations]
        if types and types[0] != "scale":
            problems.append(f"dataset {ds.path!r}: first transform must be scale")
    return problems
