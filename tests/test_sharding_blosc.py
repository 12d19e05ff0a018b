"""Blosc codec (S9) and Zarr v3 sharding (S8) store-level tests.

Parity targets: reference codec translation
/root/reference py/ngff_zarr/to_ngff_zarr.py:193-256, shard assembly
:446-489 and :661-703, compression tests
py/test/test_to_ngff_zarr_v3_compression.py:25-152, sharding tests
py/test/test_to_ngff_zarr_sharding.py:27-147. (The real c-blosc /
zarr-python libraries are not installed in this image, so byte-golden
comparison against reference-written stores is done structurally: our
containers follow the public c-blosc chunk format and the Zarr v3
sharding_indexed spec, both verified field-by-field here.)
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from ngff_zarr_spark.sources.blosc import (
    blosc_compress,
    blosc_decompress,
    crc32c,
)
from ngff_zarr_spark.sources.zarr_store import (
    ZarrArrayMeta,
    ZarrStore,
    compressor_from_v2_json,
    compressor_from_v3_codecs,
    compressor_to_v2_json,
    compressor_to_v3_codec,
)


@pytest.mark.parametrize("cname", ["lz4", "zstd", "zlib", "snappy"])
@pytest.mark.parametrize("shuffle", [0, 1])
@pytest.mark.parametrize("dtype", ["uint8", "uint16", "float32", "float64"])
def test_blosc_roundtrip(cname, shuffle, dtype):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 250, 4097).astype(dtype)
    raw = arr.tobytes()
    enc = blosc_compress(raw, arr.dtype.itemsize, cname, 5, shuffle)
    assert blosc_decompress(enc) == raw


def test_blosc_header_fields():
    """Container header matches the public c-blosc chunk format."""
    arr = np.zeros(1000, dtype="uint16")
    enc = blosc_compress(arr.tobytes(), 2, "lz4", 5, 1)
    ver, verlz, flags, typesize, nbytes, blocksize, cbytes = struct.unpack_from(
        "<BBBBiii", enc, 0
    )
    assert typesize == 2
    assert nbytes == 2000
    assert cbytes == len(enc)
    assert flags & 0x1  # byte-shuffle bit
    assert (flags >> 5) & 0x7 == 1  # lz4 codec id


def test_blosc_incompressible_memcpy():
    rng = np.random.default_rng(3)
    raw = rng.bytes(4096)
    enc = blosc_compress(raw, 1, "lz4", 5, 0)
    flags = enc[2]
    assert flags & 0x2  # memcpy flag set for incompressible input
    assert blosc_decompress(enc) == raw


def test_crc32c_vectors():
    # RFC 3720 / iSCSI test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_compressor_json_translation():
    for spec in ["gzip", "zlib", "zstd", "blosc:lz4:5:1", "blosc:zstd:3:0"]:
        assert compressor_from_v2_json(compressor_to_v2_json(spec)) == spec
    assert compressor_to_v2_json("blosc:lz4:5:1") == {
        "id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1, "blocksize": 0,
    }
    v3 = compressor_to_v3_codec("blosc:lz4:5:1", typesize=2)
    assert v3["configuration"]["shuffle"] == "shuffle"
    assert compressor_from_v3_codecs([v3]) == "blosc:lz4:5:1"


def test_store_blosc_chunk_roundtrip(tmp_path):
    store = ZarrStore(str(tmp_path / "s.zarr"))
    meta = ZarrArrayMeta(
        path="a", shape=(10, 13), chunks=(4, 5), dtype=np.dtype("uint16"),
        compressor="blosc:lz4:5:1",
    )
    store.write_array_meta(meta)
    rng = np.random.default_rng(11)
    data = rng.integers(0, 1000, (10, 13)).astype("uint16")
    for iz in range(3):
        for ix in range(3):
            ext = meta.chunk_extent((iz, ix))
            store.write_chunk(meta, (iz, ix), data[iz * 4 : iz * 4 + ext[0], ix * 5 : ix * 5 + ext[1]])
    back = store.read_array_meta("a", 2)
    assert back.compressor == "blosc:lz4:5:1"
    got = np.zeros_like(data)
    for iz in range(3):
        for ix in range(3):
            ext = back.chunk_extent((iz, ix))
            got[iz * 4 : iz * 4 + ext[0], ix * 5 : ix * 5 + ext[1]] = store.read_chunk(back, (iz, ix))
    assert np.array_equal(got, data)


def test_sharded_store_layout_and_roundtrip(tmp_path):
    """Shard files follow the sharding_indexed binary layout: encoded
    chunks + uint64-LE (offset, nbytes) index + crc32c, index at end;
    missing chunks read as fill; metadata advertises the codec chain."""
    root = tmp_path / "sh.zarr"
    store = ZarrStore(str(root))
    meta = ZarrArrayMeta(
        path="a", shape=(8, 12), chunks=(2, 3), dtype=np.dtype("uint16"),
        compressor="zstd", zarr_format=3, chunks_per_shard=(2, 2),
    )
    store.write_array_meta(meta)
    doc = json.loads((root / "a/zarr.json").read_text())
    sh = doc["codecs"][0]
    assert sh["name"] == "sharding_indexed"
    assert sh["configuration"]["chunk_shape"] == [2, 3]
    assert sh["configuration"]["index_codecs"][1]["name"] == "crc32c"
    assert doc["chunk_grid"]["configuration"]["chunk_shape"] == [4, 6]  # shard shape

    rng = np.random.default_rng(5)
    data = rng.integers(0, 60000, (8, 12)).astype("uint16")
    # write shard (0,0) fully, shard (1,1) partially (one inner chunk)
    store.write_shard(
        meta, (0, 0),
        {(iz, ix): data[iz * 2 : iz * 2 + 2, ix * 3 : ix * 3 + 3] for iz in range(2) for ix in range(2)},
    )
    store.write_shard(meta, (1, 1), {(0, 0): data[4:6, 6:9]})

    # shard file structure: trailing index parses and crc verifies
    raw = (root / "a/c/0/0").read_bytes()
    idx = store._read_shard_index(meta, raw)
    assert idx.shape == (4, 2)
    assert not (idx == 0xFFFFFFFFFFFFFFFF).any()

    # chunk reads through the shard index
    for cz in range(2):
        for cx in range(2):
            got = store.read_chunk(meta, (cz, cx))
            assert np.array_equal(got, data[cz * 2 : cz * 2 + 2, cx * 3 : cx * 3 + 3])
    # present inner chunk of the partial shard
    assert np.array_equal(store.read_chunk(meta, (2, 2)), data[4:6, 6:9])
    # missing inner chunk in a present shard -> fill value
    assert (store.read_chunk(meta, (2, 3)) == 0).all()
    # missing shard entirely -> fill value
    assert (store.read_chunk(meta, (0, 2)) == 0).all()

    # round-trip through read_array_meta (chunks_per_shard recovered)
    back = store.read_array_meta("a", 3)
    assert back.chunks == (2, 3)
    assert back.chunks_per_shard == (2, 2)
    assert back.compressor == "zstd"


def test_shard_index_crc_mismatch(tmp_path):
    store = ZarrStore(str(tmp_path / "c.zarr"))
    meta = ZarrArrayMeta(
        path="a", shape=(4, 4), chunks=(2, 2), dtype=np.dtype("uint8"),
        zarr_format=3, chunks_per_shard=(2, 2),
    )
    store.write_shard(meta, (0, 0), {(0, 0): np.ones((2, 2), dtype="uint8")})
    key = meta.shard_key((0, 0))
    raw = bytearray(store.get(key))
    raw[-1] ^= 0xFF  # corrupt the crc
    store.put(key, bytes(raw))
    with pytest.raises(ValueError, match="crc32c"):
        store.read_chunk(meta, (0, 0))
