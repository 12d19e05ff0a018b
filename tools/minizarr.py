"""An INDEPENDENT, stdlib-only Zarr v2/v3 reader+writer for interop
evidence.

The sandbox has no zarr-python/dask/ngff-zarr wheels and no network, so
byte-level interop with the real ecosystem stack cannot be exercised
directly (VERDICT r8 ask #1). This module is the closest admissible
stand-in: a from-scratch implementation of the PUBLIC Zarr v2 spec
(https://zarr-specs.readthedocs.io, v2 storage spec) and Zarr v3 core
spec, written against the spec documents only — it shares NO code with
``ngff_zarr_spark`` (only ``json``/``gzip``/``zlib``/``struct`` from
the stdlib plus numpy), so agreement between the two is evidence the
engine's stores follow the spec rather than merely round-tripping
through the engine's own codecs.

Deliberate scope: gzip/zlib/raw compressors, C order, regular chunk
grids, "." or "/" v2 separators, v3 "c/"-prefixed default chunk keys —
the layouts ngff_zarr_spark's writer emits and the reference stack's
zarr-python writes for the same configurations.
"""

from __future__ import annotations

import gzip
import json
import zlib
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# v2

def _v2_decompress(comp: dict | None, data: bytes) -> bytes:
    if comp is None:
        return data
    cid = comp.get("id")
    if cid == "gzip":
        return gzip.decompress(data)
    if cid == "zlib":
        return zlib.decompress(data)
    raise NotImplementedError(f"minizarr: unsupported v2 compressor {cid!r}")


def read_v2_array(root: str | Path, path: str = "") -> np.ndarray:
    """Assemble a full Zarr v2 array from ``root/path`` per the v2
    storage spec: .zarray metadata, chunk keys joined by the
    dimension_separator, trailing-edge chunks stored at full chunk
    shape and cropped on read."""
    base = Path(root) / path if path else Path(root)
    meta = json.loads((base / ".zarray").read_text())
    if meta["zarr_format"] != 2:
        raise ValueError("not a v2 array")
    if meta.get("order", "C") != "C":
        raise NotImplementedError("minizarr reads C order only")
    if meta.get("filters"):
        raise NotImplementedError("minizarr does not read v2 filters")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    sep = meta.get("dimension_separator", ".")
    fill = meta.get("fill_value", 0)
    if fill is None:
        fill = 0
    out = np.full(shape, fill, dtype=dtype)
    grid = [-(-s // c) for s, c in zip(shape, chunks)]
    for idx in np.ndindex(*grid):
        key = sep.join(str(i) for i in idx)
        f = base / key
        if not f.exists():
            continue  # fill_value chunk
        raw = _v2_decompress(meta.get("compressor"), f.read_bytes())
        block = np.frombuffer(raw, dtype=dtype).reshape(chunks)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        crop = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        out[sel] = block[crop]
    return out


def write_v2_array(
    root: str | Path,
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, ...],
    compressor: str | None = "gzip",
    dimension_separator: str = ".",
) -> None:
    """Write a spec-compliant v2 array (C order, zero fill)."""
    base = Path(root) / path if path else Path(root)
    base.mkdir(parents=True, exist_ok=True)
    comp_meta = None
    if compressor == "gzip":
        comp_meta = {"id": "gzip", "level": 5}
    elif compressor == "zlib":
        comp_meta = {"id": "zlib", "level": 5}
    elif compressor is not None:
        raise NotImplementedError(f"minizarr cannot write {compressor!r}")
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": comp_meta,
        "fill_value": 0,
        "order": "C",
        "filters": None,
        "dimension_separator": dimension_separator,
    }
    (base / ".zarray").write_text(json.dumps(meta))
    grid = [-(-s // c) for s, c in zip(arr.shape, chunks)]
    for idx in np.ndindex(*grid):
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, arr.shape)
        )
        block = np.zeros(chunks, dtype=arr.dtype)
        crop = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        block[crop] = arr[sel]
        raw = block.tobytes(order="C")
        if compressor == "gzip":
            raw = gzip.compress(raw, 5)
        elif compressor == "zlib":
            raw = zlib.compress(raw, 5)
        key = dimension_separator.join(str(i) for i in idx)
        (base / key).parent.mkdir(parents=True, exist_ok=True)
        (base / key).write_bytes(raw)


# ---------------------------------------------------------------------------
# v3

def read_v3_array(root: str | Path, path: str = "") -> np.ndarray:
    """Assemble a full Zarr v3 array per the core spec: zarr.json node
    metadata, regular chunk grid, default chunk key encoding
    ('c' + '/'-joined indices), bytes+gzip codec chain."""
    base = Path(root) / path if path else Path(root)
    meta = json.loads((base / "zarr.json").read_text())
    if meta.get("zarr_format") != 3 or meta.get("node_type") != "array":
        raise ValueError("not a v3 array node")
    shape = tuple(meta["shape"])
    dt = meta["data_type"]
    _V3_DTYPES = {
        "bool": "|b1", "int8": "|i1", "uint8": "|u1",
        "int16": "<i2", "uint16": "<u2", "int32": "<i4", "uint32": "<u4",
        "int64": "<i8", "uint64": "<u8",
        "float16": "<f2", "float32": "<f4", "float64": "<f8",
        "complex64": "<c8", "complex128": "<c16",
    }
    if dt not in _V3_DTYPES:
        raise NotImplementedError(f"minizarr: v3 data_type {dt!r}")
    dtype = np.dtype(_V3_DTYPES[dt])
    grid_cfg = meta["chunk_grid"]
    if grid_cfg["name"] != "regular":
        raise NotImplementedError("minizarr reads regular chunk grids only")
    chunks = tuple(grid_cfg["configuration"]["chunk_shape"])
    key_cfg = meta.get("chunk_key_encoding", {"name": "default"})
    if key_cfg.get("name") != "default":
        raise NotImplementedError("minizarr reads default chunk keys only")
    key_sep = key_cfg.get("configuration", {}).get("separator", "/")

    codecs = meta.get("codecs", [])
    names = [c["name"] for c in codecs]
    fill = meta.get("fill_value", 0)
    out = np.full(shape, fill, dtype=dtype)

    if names == ["sharding_indexed"]:
        # v3 sharding codec: each stored object is a SHARD of
        # inner chunks + a trailing (offset, nbytes) uint64-pair index,
        # itself protected by crc32c when index_codecs says so
        cfg = codecs[0]["configuration"]
        inner = tuple(cfg["chunk_shape"])
        inner_codecs = cfg["codecs"]
        if cfg.get("index_location", "end") != "end":
            raise NotImplementedError("minizarr reads end-located indexes only")
        idx_names = [c["name"] for c in cfg.get("index_codecs", [])]
        want_crc = "crc32c" in idx_names
        igrid = [s // i for s, i in zip(chunks, inner)]  # inner chunks per shard
        n_inner = int(np.prod(igrid))
        sgrid = [-(-s // c) for s, c in zip(shape, chunks)]
        for sidx in np.ndindex(*sgrid):
            key = "c" + key_sep + key_sep.join(str(i) for i in sidx)
            f = base / key
            if not f.exists():
                continue
            blob = f.read_bytes()
            isize = n_inner * 16 + (4 if want_crc else 0)
            index = blob[-isize:]
            if want_crc:
                stored = int.from_bytes(index[-4:], "little")
                if crc32c(index[:-4]) != stored:
                    raise ValueError(f"shard index crc32c mismatch in {key}")
                index = index[:-4]
            pairs = np.frombuffer(index, dtype="<u8").reshape(n_inner, 2)
            for flat, iidx in enumerate(np.ndindex(*igrid)):
                off, nb = int(pairs[flat, 0]), int(pairs[flat, 1])
                if off == 2**64 - 1 and nb == 2**64 - 1:
                    continue  # missing inner chunk -> fill
                raw = _v3_decode_chain(blob[off : off + nb], inner_codecs)
                block = np.frombuffer(raw, dtype=dtype).reshape(inner)
                origin = [
                    s * c + i * ic for s, c, i, ic in zip(sidx, chunks, iidx, inner)
                ]
                sel = tuple(
                    slice(o, min(o + ic, sh))
                    for o, ic, sh in zip(origin, inner, shape)
                )
                crop = tuple(slice(0, sl.stop - sl.start) for sl in sel)
                out[sel] = block[crop]
        return out

    if not names or names[0] != "bytes":
        raise NotImplementedError(f"minizarr: codec chain {names!r}")
    endian = codecs[0].get("configuration", {}).get("endian", "little")
    if endian != "little":
        raise NotImplementedError("minizarr reads little-endian only")
    post = codecs[1:]
    grid = [-(-s // c) for s, c in zip(shape, chunks)]
    for idx in np.ndindex(*grid):
        key = "c" + key_sep + key_sep.join(str(i) for i in idx)
        if not idx:  # 0-d
            key = "c"
        f = base / key
        if not f.exists():
            continue
        raw = f.read_bytes()
        for c in reversed(post):
            if c["name"] == "gzip":
                raw = gzip.decompress(raw)
            elif c["name"] == "zlib":
                raw = zlib.decompress(raw)
            else:
                raise NotImplementedError(f"minizarr: v3 codec {c['name']!r}")
        block = np.frombuffer(raw, dtype=dtype).reshape(chunks)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        crop = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        out[sel] = block[crop]
    return out


def _v3_decode_chain(raw: bytes, codecs: list[dict]) -> bytes:
    names = [c["name"] for c in codecs]
    if not names or names[0] != "bytes":
        raise NotImplementedError(f"minizarr: inner codec chain {names!r}")
    if codecs[0].get("configuration", {}).get("endian", "little") != "little":
        raise NotImplementedError("minizarr reads little-endian only")
    for c in reversed(codecs[1:]):
        if c["name"] == "gzip":
            raw = gzip.decompress(raw)
        elif c["name"] == "zlib":
            raw = zlib.decompress(raw)
        else:
            raise NotImplementedError(f"minizarr: v3 codec {c['name']!r}")
    return raw


_CRC32C_TABLE = None


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli, poly 0x1EDC6F41 reflected = 0x82F63B78),
    table-driven, from the public specification (RFC 3720 appendix) —
    independent of the engine's implementation."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# OME-NGFF attribute access (layout only — no engine parsing reused)

def read_ome_attrs(root: str | Path) -> tuple[dict, int]:
    """Return (multiscales entry, zarr_format) straight from the store
    files: v2 root .zattrs or v3 root zarr.json attributes."""
    root = Path(root)
    if (root / ".zattrs").exists():
        doc = json.loads((root / ".zattrs").read_text())
        return doc["multiscales"][0], 2
    doc = json.loads((root / "zarr.json").read_text())
    attrs = doc.get("attributes", {})
    if "ome" in attrs:
        return attrs["ome"]["multiscales"][0], 3
    return attrs["multiscales"][0], 3
