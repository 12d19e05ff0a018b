"""Spec-vector codec fixtures (J4 reference-compat evidence).

zarr-python / numcodecs / c-blosc are not installed in this image, so
cross-library byte checks can't run here. The next-best evidence is
committed KNOWN-ANSWER VECTORS whose layout is derived by hand from the
PUBLIC format documents — not produced by the engine's encoder — and
asserting the engine's decoder recovers the expected plaintext:

- c-blosc chunk container: README_CHUNK_FORMAT.rst (16-byte header
  [version, versionlz, flags, typesize, nbytes, blocksize, cbytes LE],
  int32 bstarts, int32-prefixed streams, raw stream when csize equals
  the uncompressed size, memcpy flag 0x2, shuffle flag 0x1,
  codec id in flags bits 5-7).
- CRC32C (Castagnoli): the canonical check value crc32c("123456789")
  = 0xE3069283 (RFC 3720 §B.4).
- Zarr v3 sharding_indexed: shard file = concatenated encoded chunks +
  little-endian uint64 (offset, nbytes) index + crc32c, index at end,
  missing chunks = 2^64-1 sentinel (zarr v3 codec spec).

Reference relies on these same formats via zarr-python/numcodecs
(/root/reference py/ngff_zarr/to_ngff_zarr.py:446-489,661-703).

The hex literals are BYTE-PINNED: a change in the decoder that breaks
real-world stores fails here even though the engine's own encoder/
decoder pair would still round-trip.
"""

import struct

import numpy as np

from ngff_zarr_spark.sources.blosc import blosc_decompress, crc32c
from ngff_zarr_spark.sources.zarr_store import ZarrArrayMeta, ZarrStore

# --- hand-derived c-blosc vectors -----------------------------------------

# memcpy container: flags 0x22 (memcpy | lz4 id), typesize 2, nbytes 8,
# payload = uint16 LE [1, 2, 3, 4] verbatim after the 16-byte header.
MEMCPY_VEC = bytes.fromhex(
    "020122020800000008000000180000000100020003000400"
)
MEMCPY_EXPECT = bytes([1, 0, 2, 0, 3, 0, 4, 0])

# split chunk with raw (incompressible-marked) streams: flags 0x21
# (byte-shuffle | lz4 id), typesize 2, single 512-byte block, bstarts
# [20], two int32(256)-prefixed 256-byte streams = the byte-shuffled
# halves of uint16 LE [0..255] (stream stored raw because csize == want).
_LOW_BYTES = bytes(range(256)).hex()          # low bytes of uint16 0..255
_HIGH_BYTES = "00" * 256                      # high bytes (all < 256)
SPLIT_RAW_VEC = bytes.fromhex(
    "0201210200020000000200001c02000014000000"  # header + bstarts [20]
    + "00010000" + _LOW_BYTES                   # stream 0: int32(256) + raw
    + "00010000" + _HIGH_BYTES                  # stream 1: int32(256) + raw
)
SPLIT_RAW_EXPECT = np.arange(256, dtype="<u2").tobytes()

# zlib-compressed non-split chunk: flags 0x61 (byte-shuffle | zlib id 3),
# typesize 8, one 512-byte block holding float64 LE [0², 1², … 63²]
# byte-shuffled then zlib-deflated (decode of a fixed deflate stream is
# deterministic regardless of zlib version).
ZLIB_VEC = bytes.fromhex(
    "020161080002000000020000a70000001400000"
    "08f000000785e6360180554000d0c0e40a8d0a0c020e03081618243074387c289"
    "060f050e0616011587940947185c263c7158d2e1c470a82348e1d389450d491e"
    "460a421c4c0c1f04940c2c9d3c024222e3925233720a8a4aca2aabeb1a9a9a5b"
    "db3aba7afa264c9c3479cad469d367ce9a3d67defc050b172d5abc64e9d265cb"
    "57ac5cb57acdda75eb19ec1d28020072614265"
)
ZLIB_EXPECT = (np.arange(64, dtype="<f8") ** 2).tobytes()


class TestCrc32c:
    def test_rfc3720_check_value(self):
        assert crc32c(b"123456789") == 0xE3069283

    def test_empty_and_zero(self):
        # standard CRC32C known answers
        assert crc32c(b"") == 0x00000000
        assert crc32c(b"\x00" * 32) == 0x8A9136AA


class TestBloscVectors:
    def test_memcpy_container(self):
        assert blosc_decompress(MEMCPY_VEC) == MEMCPY_EXPECT

    def test_split_raw_streams(self):
        assert len(SPLIT_RAW_VEC) == 540
        assert blosc_decompress(SPLIT_RAW_VEC) == SPLIT_RAW_EXPECT

    def test_zlib_stream(self):
        assert blosc_decompress(ZLIB_VEC) == ZLIB_EXPECT

    def test_header_fields_parse(self):
        ver, verlz, flags, typesize, nbytes, blocksize, cbytes = struct.unpack_from(
            "<BBBBiii", SPLIT_RAW_VEC, 0
        )
        assert (ver, flags, typesize, nbytes) == (2, 0x21, 2, 512)
        assert cbytes == len(SPLIT_RAW_VEC)


class TestShardLayoutVector:
    """Hand-computed sharding_indexed layout: 2 present + 2 missing
    chunks, uncompressed int32 payloads, trailing LE uint64 index +
    crc32c — written byte-by-byte from the zarr v3 spec, then read via
    the engine's shard reader."""

    def _build(self):
        c00 = np.array([[1, 2], [3, 4]], dtype="<i4").tobytes()
        c11 = np.array([[9, 8], [7, 6]], dtype="<i4").tobytes()
        body = c00 + c11
        sentinel = 0xFFFFFFFFFFFFFFFF
        # C-order inner grid (2,2): entries 00, 01, 10, 11
        index = struct.pack(
            "<8Q",
            0, 16,                 # chunk (0,0) at offset 0
            sentinel, sentinel,    # (0,1) missing
            sentinel, sentinel,    # (1,0) missing
            16, 16,                # chunk (1,1) at offset 16
        )
        index += struct.pack("<I", crc32c(index))
        return body + index

    def test_shard_reads(self, tmp_path):
        store = ZarrStore(str(tmp_path / "shard.zarr"))
        meta = ZarrArrayMeta(
            path="a", shape=(4, 4), chunks=(2, 2), dtype=np.dtype("int32"),
            compressor=None, zarr_format=3, chunks_per_shard=(2, 2),
        )
        store.put(meta.shard_key((0, 0)), self._build())
        # the single shard (0,0) holds inner chunks (0,0)..(1,1)
        assert np.array_equal(
            store.read_chunk(meta, (0, 0)), np.array([[1, 2], [3, 4]], np.int32)
        )
        assert np.array_equal(
            store.read_chunk(meta, (1, 1)), np.array([[9, 8], [7, 6]], np.int32)
        )
        # sentinel (missing) chunk inside an existing shard → fill value
        assert (store.read_chunk(meta, (0, 1)) == 0).all()

    def test_corrupt_index_crc_raises(self, tmp_path):
        store = ZarrStore(str(tmp_path / "bad.zarr"))
        meta = ZarrArrayMeta(
            path="a", shape=(4, 4), chunks=(2, 2), dtype=np.dtype("int32"),
            compressor=None, zarr_format=3, chunks_per_shard=(2, 2),
        )
        data = bytearray(self._build())
        data[-1] ^= 0xFF  # flip a crc byte
        store.put(meta.shard_key((0, 0)), bytes(data))
        import pytest

        with pytest.raises(ValueError, match="crc32c"):
            store.read_chunk(meta, (0, 0))
