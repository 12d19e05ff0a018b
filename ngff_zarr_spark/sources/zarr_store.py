"""Minimal pure-Python Zarr v2/v3 store layer (no zarr-python dependency
in this container) — the byte-level substrate of the ome_zarr DataSource.

Implements exactly what OME-Zarr stores need (reference behavior:
/root/reference py/ngff_zarr/to_ngff_zarr.py:982-1183, from_ngff_zarr.py:38-307):

- Zarr v2: ``.zgroup``/``.zattrs``/``.zarray`` JSON, ``/``-separated
  chunk keys, C-order chunks, optional compressor, consolidated
  ``.zmetadata``.
- Zarr v3: ``zarr.json`` group/array documents, ``c/``-prefixed chunk
  keys, ``bytes`` + optional ``gzip``/``zstd`` codecs, dimension_names.
- Codecs available here: raw (None), ``gzip``, ``zlib`` (stdlib);
  ``zstd``/``blosc`` gated behind import-try (absent in this image).
- Edge chunks are stored full-size and sliced on read (zarr v2 pads;
  v3 regular grid does the same) — matching zarr-python behavior.

Paths are local-filesystem; on a cluster the same byte layout goes
through the Hadoop FS/fsspec path abstraction (S2) — the store layer is
deliberately a thin (key → bytes) mapping to keep that swap trivial.
"""

from __future__ import annotations

import gzip
import json
import zlib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

try:  # optional, not in this image
    import zstandard  # type: ignore

    _HAS_ZSTD = True
except ImportError:
    _HAS_ZSTD = False

# dtype ↔ zarr representations (reference _numpy_to_zarr_dtype,
# to_ngff_zarr.py:89-117)
_V3_DTYPES = {
    "bool": "bool",
    "int8": "int8", "int16": "int16", "int32": "int32", "int64": "int64",
    "uint8": "uint8", "uint16": "uint16", "uint32": "uint32", "uint64": "uint64",
    "float16": "float16", "float32": "float32", "float64": "float64",
    "complex64": "complex64", "complex128": "complex128",
}


def np_to_v2_dtype(dt: np.dtype) -> str:
    dt = np.dtype(dt)
    if dt.kind == "b":
        return "|b1"
    order = "|" if dt.itemsize == 1 else "<"
    return f"{order}{dt.kind}{dt.itemsize}"


def np_to_v3_dtype(dt: np.dtype) -> str:
    name = np.dtype(dt).name
    if name not in _V3_DTYPES:
        raise ValueError(f"dtype {name} not supported by zarr v3 mapping")
    return _V3_DTYPES[name]


def v2_dtype_to_np(s: str) -> np.dtype:
    # normalize endianness on read (reference from_ngff_zarr.py:127-131)
    return np.dtype(s).newbyteorder("=")


def encode_chunk(arr: np.ndarray, compressor: Optional[str]) -> bytes:
    """C-order little-endian bytes, then the (single) compressor."""
    raw = np.ascontiguousarray(arr).astype(arr.dtype.newbyteorder("<"), copy=False).tobytes()
    if compressor is None:
        return raw
    if compressor == "gzip":
        return gzip.compress(raw, compresslevel=5)
    if compressor == "zlib":
        return zlib.compress(raw, 5)
    if compressor == "zstd":
        if not _HAS_ZSTD:
            raise RuntimeError("zstd codec requested but zstandard is not installed")
        return zstandard.ZstdCompressor(level=3).compress(raw)
    raise ValueError(f"Unknown compressor {compressor!r}")


def decode_chunk(
    data: bytes, dtype: np.dtype, chunk_shape: tuple[int, ...], compressor: Optional[str]
) -> np.ndarray:
    if compressor == "gzip":
        data = gzip.decompress(data)
    elif compressor == "zlib":
        data = zlib.decompress(data)
    elif compressor == "zstd":
        if not _HAS_ZSTD:
            raise RuntimeError("zstd codec requested but zstandard is not installed")
        data = zstandard.ZstdDecompressor().decompress(data)
    elif compressor is not None:
        raise ValueError(f"Unknown compressor {compressor!r}")
    arr = np.frombuffer(data, dtype=np.dtype(dtype).newbyteorder("<"))
    return arr.reshape(chunk_shape).astype(dtype, copy=False)


@dataclass
class ZarrArrayMeta:
    """One stored array (a pyramid level)."""

    path: str  # store-relative, e.g. "scale0/image"
    shape: tuple[int, ...]
    chunks: tuple[int, ...]
    dtype: np.dtype
    compressor: Optional[str] = None
    fill_value: float = 0
    zarr_format: int = 2
    dimension_names: Optional[list[str]] = None

    @property
    def chunk_grid(self) -> tuple[int, ...]:
        return tuple(-(-s // c) for s, c in zip(self.shape, self.chunks))

    def chunk_key(self, idx: tuple[int, ...]) -> str:
        if self.zarr_format == 3:
            return f"{self.path}/c/" + "/".join(str(i) for i in idx)
        return f"{self.path}/" + "/".join(str(i) for i in idx)

    def chunk_origin(self, idx: tuple[int, ...]) -> tuple[int, ...]:
        return tuple(i * c for i, c in zip(idx, self.chunks))

    def chunk_extent(self, idx: tuple[int, ...]) -> tuple[int, ...]:
        """Valid (unpadded) extent of the chunk — edge chunks are clipped."""
        return tuple(
            min(c, s - i * c) for i, c, s in zip(idx, self.chunks, self.shape)
        )

    def to_v2_json(self) -> dict:
        comp = None
        if self.compressor == "gzip":
            comp = {"id": "gzip", "level": 5}
        elif self.compressor == "zlib":
            comp = {"id": "zlib", "level": 5}
        elif self.compressor == "zstd":
            comp = {"id": "zstd", "level": 3}
        return {
            "zarr_format": 2,
            "shape": list(self.shape),
            "chunks": list(self.chunks),
            "dtype": np_to_v2_dtype(self.dtype),
            "compressor": comp,
            "fill_value": self.fill_value,
            "order": "C",
            "filters": None,
            "dimension_separator": "/",
        }

    def to_v3_json(self) -> dict:
        codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
        if self.compressor == "gzip":
            codecs.append({"name": "gzip", "configuration": {"level": 5}})
        elif self.compressor == "zstd":
            codecs.append({"name": "zstd", "configuration": {"level": 3, "checksum": False}})
        doc = {
            "zarr_format": 3,
            "node_type": "array",
            "shape": list(self.shape),
            "data_type": np_to_v3_dtype(self.dtype),
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": list(self.chunks)},
            },
            "chunk_key_encoding": {
                "name": "default",
                "configuration": {"separator": "/"},
            },
            "fill_value": self.fill_value,
            "codecs": codecs,
        }
        if self.dimension_names:
            doc["dimension_names"] = list(self.dimension_names)
        return doc


class ZarrStore:
    """Thin (key → bytes) mapping over a local directory."""

    def __init__(self, root: str):
        self.root = Path(root)

    def put(self, key: str, data: bytes) -> None:
        p = self.root / key
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)

    def get(self, key: str) -> bytes:
        return (self.root / key).read_bytes()

    def exists(self, key: str) -> bool:
        return (self.root / key).exists()

    def put_json(self, key: str, doc: dict) -> None:
        self.put(key, json.dumps(doc, indent=1, sort_keys=False).encode())

    def get_json(self, key: str) -> dict:
        return json.loads(self.get(key))

    def list_keys(self, prefix: str = "") -> list[str]:
        base = self.root / prefix if prefix else self.root
        if not base.exists():
            return []
        return sorted(
            str(p.relative_to(self.root))
            for p in base.rglob("*")
            if p.is_file()
        )

    # -- array-level helpers -------------------------------------------------

    def write_array_meta(self, meta: ZarrArrayMeta, attributes: Optional[dict] = None) -> None:
        if meta.zarr_format == 3:
            doc = meta.to_v3_json()
            if attributes:
                doc["attributes"] = attributes
            self.put_json(f"{meta.path}/zarr.json", doc)
        else:
            self.put_json(f"{meta.path}/.zarray", meta.to_v2_json())
            if attributes:
                self.put_json(f"{meta.path}/.zattrs", attributes)

    def write_group(self, path: str, attributes: dict, zarr_format: int) -> None:
        if zarr_format == 3:
            self.put_json(
                (f"{path}/zarr.json" if path else "zarr.json"),
                {"zarr_format": 3, "node_type": "group", "attributes": attributes},
            )
        else:
            prefix = f"{path}/" if path else ""
            self.put_json(f"{prefix}.zgroup", {"zarr_format": 2})
            if attributes:
                self.put_json(f"{prefix}.zattrs", attributes)

    def read_array_meta(self, path: str, zarr_format: int) -> ZarrArrayMeta:
        if zarr_format == 3:
            doc = self.get_json(f"{path}/zarr.json")
            codecs = doc.get("codecs", [])
            comp = None
            for c in codecs:
                if c.get("name") in ("gzip", "zstd", "zlib"):
                    comp = c["name"]
            return ZarrArrayMeta(
                path=path,
                shape=tuple(doc["shape"]),
                chunks=tuple(doc["chunk_grid"]["configuration"]["chunk_shape"]),
                dtype=np.dtype(doc["data_type"]),
                compressor=comp,
                fill_value=doc.get("fill_value", 0),
                zarr_format=3,
                dimension_names=doc.get("dimension_names"),
            )
        doc = self.get_json(f"{path}/.zarray")
        comp_doc = doc.get("compressor")
        comp = comp_doc["id"] if comp_doc else None
        # v2 has no in-array dimension names; xarray convention stores
        # them as _ARRAY_DIMENSIONS in the sibling .zattrs (which this
        # engine's writer emits) — read them back so stores whose dim
        # order is not a (t,c,z,y,x) suffix map to the right columns.
        dim_names = None
        if self.exists(f"{path}/.zattrs"):
            try:
                dim_names = self.get_json(f"{path}/.zattrs").get("_ARRAY_DIMENSIONS")
            except Exception:
                dim_names = None
        return ZarrArrayMeta(
            path=path,
            shape=tuple(doc["shape"]),
            chunks=tuple(doc["chunks"]),
            dtype=v2_dtype_to_np(doc["dtype"]),
            compressor=comp,
            fill_value=doc.get("fill_value", 0) or 0,
            zarr_format=2,
            dimension_names=list(dim_names) if dim_names else None,
        )

    def write_chunk(self, meta: ZarrArrayMeta, idx: tuple[int, ...], arr: np.ndarray) -> None:
        """Store one chunk; edge chunks are padded to full chunk shape
        with fill_value (zarr stores full-size chunks)."""
        if tuple(arr.shape) != tuple(meta.chunks):
            full = np.full(meta.chunks, meta.fill_value, dtype=meta.dtype)
            full[tuple(slice(0, s) for s in arr.shape)] = arr
            arr = full
        self.put(meta.chunk_key(idx), encode_chunk(arr.astype(meta.dtype), meta.compressor))

    def read_chunk(self, meta: ZarrArrayMeta, idx: tuple[int, ...]) -> np.ndarray:
        """Read one chunk, clipped to its valid extent (edge chunks)."""
        key = meta.chunk_key(idx)
        extent = meta.chunk_extent(idx)
        if not self.exists(key):
            return np.full(extent, meta.fill_value, dtype=meta.dtype)
        arr = decode_chunk(self.get(key), meta.dtype, meta.chunks, meta.compressor)
        return arr[tuple(slice(0, e) for e in extent)]

    # -- consolidated metadata (S10) ----------------------------------------

    def consolidate_metadata_v2(self) -> None:
        """Parity: zarr.consolidate_metadata (reference
        to_ngff_zarr.py:1177-1183): gather all JSON docs into .zmetadata."""
        meta = {}
        for key in self.list_keys():
            name = key.rsplit("/", 1)[-1]
            if name in (".zgroup", ".zattrs", ".zarray"):
                meta[key] = self.get_json(key)
        self.put_json(".zmetadata", {"zarr_consolidated_format": 1, "metadata": meta})
