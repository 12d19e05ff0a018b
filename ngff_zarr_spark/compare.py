"""Golden-store comparison (J4).

Mirror of the reference's baseline test harness
(/root/reference py/test/_data.py:104-156 store_equals /
verify_against_baseline): stores are compared KEY BY KEY — metadata
documents (.zattrs/.zgroup/.zarray/zarr.json/.zmetadata) structurally
as parsed JSON (order-insensitive), chunk/shard payloads byte-for-byte.
Used by the committed golden fixtures (tests/golden) to pin the
engine's byte output across rounds, and by the streaming-equals-batch
equivalence test.
"""

from __future__ import annotations

import json
from pathlib import Path

META_NAMES = {".zattrs", ".zgroup", ".zarray", "zarr.json", ".zmetadata"}


def store_snapshot(root: str | Path) -> dict:
    """Store contents as {relative key → parsed JSON | bytes}."""
    root = Path(root)
    out: dict = {}
    for p in sorted(root.rglob("*")):
        if not p.is_file():
            continue
        key = str(p.relative_to(root))
        data = p.read_bytes()
        if p.name in META_NAMES:
            out[key] = json.loads(data)
        else:
            out[key] = data
    return out


def store_diff(a: str | Path, b: str | Path) -> list[str]:
    """Human-readable differences between two stores ([] = equal)."""
    sa, sb = store_snapshot(a), store_snapshot(b)
    problems = []
    for key in sorted(set(sa) | set(sb)):
        if key not in sa:
            problems.append(f"only in {b}: {key}")
        elif key not in sb:
            problems.append(f"only in {a}: {key}")
        elif sa[key] != sb[key]:
            kind = "metadata" if isinstance(sa[key], dict) else "chunk bytes"
            problems.append(f"{kind} differ: {key}")
    return problems


def store_equals(a: str | Path, b: str | Path) -> bool:
    return not store_diff(a, b)
