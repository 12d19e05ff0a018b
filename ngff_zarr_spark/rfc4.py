"""RFC-4 anatomical orientation (C8).

Parity: /root/reference py/ngff_zarr/rfc4.py:14-200. The orientation
vocabulary is the OME-NGFF RFC-4 LinkML schema's published value set;
LPS/RAS are the standard medical-imaging coordinate conventions (ITK
uses LPS, neuroimaging tools use RAS).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

ORIENTATION_VALUES = {
    "left-to-right", "right-to-left",
    "anterior-to-posterior", "posterior-to-anterior",
    "inferior-to-superior", "superior-to-inferior",
    "dorsal-to-ventral", "ventral-to-dorsal",
    "dorsal-to-palmar", "palmar-to-dorsal",
    "dorsal-to-plantar", "plantar-to-dorsal",
    "rostral-to-caudal", "caudal-to-rostral",
    "cranial-to-caudal", "caudal-to-cranial",
    "proximal-to-distal", "distal-to-proximal",
}


@dataclass
class AnatomicalOrientation:
    value: str
    type: str = "anatomical"

    def __post_init__(self):
        if self.value not in ORIENTATION_VALUES:
            raise ValueError(f"Unknown anatomical orientation {self.value!r}")


# axes increase right→left, anterior→posterior, inferior→superior (ITK default)
LPS: dict[str, AnatomicalOrientation] = {
    "x": AnatomicalOrientation("right-to-left"),
    "y": AnatomicalOrientation("anterior-to-posterior"),
    "z": AnatomicalOrientation("inferior-to-superior"),
}

# axes increase left→right, posterior→anterior, inferior→superior (NIfTI world)
RAS: dict[str, AnatomicalOrientation] = {
    "x": AnatomicalOrientation("left-to-right"),
    "y": AnatomicalOrientation("posterior-to-anterior"),
    "z": AnatomicalOrientation("inferior-to-superior"),
}


def itk_lps_to_anatomical_orientation(axis_name: str) -> Optional[AnatomicalOrientation]:
    """Parity: rfc4.py:129-151."""
    return LPS.get(axis_name)


def is_rfc4_enabled(enabled_rfcs: Optional[list[int]]) -> bool:
    """Parity: rfc4.py:154-156."""
    return enabled_rfcs is not None and 4 in enabled_rfcs


def add_anatomical_orientation_to_axis(axis_dict: dict, orientation: AnatomicalOrientation) -> dict:
    """Parity: rfc4.py:159-180."""
    axis_dict["orientation"] = {"type": orientation.type, "value": orientation.value}
    return axis_dict


def remove_anatomical_orientation_from_axis(axis_dict: dict) -> dict:
    """Parity: rfc4.py:183-200."""
    axis_dict.pop("orientation", None)
    return axis_dict


def validate_rfc4_axes(axes: list[dict]) -> list[str]:
    """RFC-4 validation over a serialized axes list (the engine's
    analog of rfc4_validation.py:26-152): per-axis structural checks
    plus the cross-axis rules — every orientation shares one type, and
    orientation is defined either for ALL spatial axes or for none."""
    problems: list[str] = []
    types_seen: set[str] = set()
    with_o: list[str] = []
    without_o: list[str] = []
    for ax in axes:
        problems.extend(validate_axis_orientation(ax))
        if ax.get("type") == "space":
            o = ax.get("orientation")
            if o is None:
                without_o.append(ax.get("name"))
            else:
                with_o.append(ax.get("name"))
                if isinstance(o, dict) and o.get("type"):
                    types_seen.add(o["type"])
    if len(types_seen) > 1:
        problems.append(
            f"orientation types differ across axes: {sorted(types_seen)}"
        )
    if with_o and without_o:
        problems.append(
            "RFC 4 requires orientation on all spatial axes or none; "
            f"with: {with_o}, without: {without_o}"
        )
    return problems


def validate_axis_orientation(axis_dict: dict) -> list[str]:
    """RFC-4 structural validation of one axis dict (the engine's analog
    of rfc4_validation.py:26-133): orientation only on space axes, type
    must be 'anatomical', value from the published value set."""
    problems = []
    orientation = axis_dict.get("orientation")
    if orientation is None:
        return problems
    if not isinstance(orientation, dict):
        return [
            f"axis {axis_dict.get('name')!r}: orientation must be an "
            f"object with type/value, got {type(orientation).__name__}"
        ]
    if axis_dict.get("type") != "space":
        problems.append(
            f"axis {axis_dict.get('name')!r}: orientation on non-space axis"
        )
    if orientation.get("type") != "anatomical":
        problems.append(
            f"axis {axis_dict.get('name')!r}: orientation type must be 'anatomical'"
        )
    if orientation.get("value") not in ORIENTATION_VALUES:
        problems.append(
            f"axis {axis_dict.get('name')!r}: unknown orientation value "
            f"{orientation.get('value')!r}"
        )
    return problems
