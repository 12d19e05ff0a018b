"""Pure-Python Blosc1 chunk container codec (numpy + pyarrow inner
codecs) and a table-driven CRC32C — no c-blosc / numcodecs / crc32c
wheels exist in this image, but real-world OME-Zarr stores written by
zarr-python default to Blosc-compressed chunks (reference codec
translation: /root/reference py/ngff_zarr/to_ngff_zarr.py:193-256;
compression tests py/test/test_to_ngff_zarr_v3_compression.py:25-152),
so the engine implements the container format itself.

Format implemented per the public c-blosc chunk format spec
(c-blosc README_CHUNK_FORMAT.rst):

  16-byte header:
    0: format version   1: codec format version
    2: flags — bit0 byte-shuffle, bit1 memcpy, bit2 bit-shuffle,
       bits 5-7 codec id (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib,
       4 zstd)
    3: typesize
    4-7  nbytes (LE int32, uncompressed)
    8-11 blocksize (LE int32)
    12-15 cbytes (LE int32, total chunk bytes incl. header)
  then (unless memcpy): int32 LE block-start offsets (one per block),
  then the compressed blocks. Each block holds one stream — or
  ``typesize`` streams when the codec "splits" (c-blosc rule: codec in
  {blosclz, lz4}, typesize ≤ 16, blocksize/typesize ≥ 128) — and every
  stream is an int32 LE compressed-size prefix + payload; a stream
  whose csize equals its uncompressed size is stored raw.

Byte-shuffle is a numpy reshape/transpose; the inner codecs map to
pyarrow (lz4 block = 'lz4_raw', zstd, snappy) and stdlib zlib.
Unsupported on read: blosclz payloads and bit-shuffle (clear errors;
zarr-python's defaults use byte-shuffle + lz4, which round-trips).

The decoder keeps a parse fallback (try split, then non-split) so
chunks from c-blosc versions with a slightly different split heuristic
still decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

BLOSCLZ, LZ4, SNAPPY, ZLIB, ZSTD = 0, 1, 2, 3, 4
CODEC_NAMES = {"blosclz": BLOSCLZ, "lz4": LZ4, "lz4hc": LZ4, "snappy": SNAPPY, "zlib": ZLIB, "zstd": ZSTD}
# numcodecs Blosc shuffle constants
NOSHUFFLE, SHUFFLE, BITSHUFFLE = 0, 1, 2

_MAX_SPLITS = 16
_MIN_BUFFERSIZE = 128


def _split_block(codec: int, typesize: int, blocksize: int) -> bool:
    """c-blosc's split heuristic (blosc.c split_block)."""
    return (
        codec in (BLOSCLZ, LZ4)
        and 1 < typesize <= _MAX_SPLITS
        and blocksize // typesize >= _MIN_BUFFERSIZE
    )


def _byteshuffle(data: bytes, typesize: int) -> bytes:
    """Forward byte-shuffle of the element-aligned prefix; the trailing
    partial element (if any) is copied verbatim, matching c-blosc."""
    n = len(data) // typesize * typesize
    arr = np.frombuffer(data[:n], dtype=np.uint8).reshape(-1, typesize)
    return arr.T.tobytes() + data[n:]


def _byteunshuffle(data: bytes, typesize: int) -> bytes:
    n = len(data) // typesize * typesize
    arr = np.frombuffer(data[:n], dtype=np.uint8).reshape(typesize, -1)
    return arr.T.tobytes() + data[n:]


def _compress_stream(codec: int, data: bytes, clevel: int) -> bytes:
    if codec == LZ4:
        return pa.compress(data, codec="lz4_raw", asbytes=True)
    if codec == ZSTD:
        return pa.compress(data, codec="zstd", asbytes=True)
    if codec == SNAPPY:
        return pa.compress(data, codec="snappy", asbytes=True)
    if codec == ZLIB:
        return zlib.compress(data, clevel)
    raise ValueError(f"blosc: unsupported write codec id {codec}")


def _decompress_stream(codec: int, data: bytes, nbytes: int) -> bytes:
    if codec == LZ4:
        return pa.decompress(data, nbytes, codec="lz4_raw", asbytes=True)
    if codec == ZSTD:
        return pa.decompress(data, nbytes, codec="zstd", asbytes=True)
    if codec == SNAPPY:
        return pa.decompress(data, nbytes, codec="snappy", asbytes=True)
    if codec == ZLIB:
        return zlib.decompress(data)
    if codec == BLOSCLZ:
        raise ValueError(
            "blosc: blosclz payload decoding is not implemented in this "
            "engine (chunks written with cname='blosclz'); re-encode the "
            "store with lz4/zstd/zlib/snappy"
        )
    raise ValueError(f"blosc: unknown codec id {codec}")


def blosc_compress(
    raw: bytes, typesize: int, cname: str = "lz4", clevel: int = 5, shuffle: int = SHUFFLE
) -> bytes:
    """Encode one buffer as a Blosc1 chunk (single block — zarr chunks
    are already the parallelism unit, intra-chunk blocking buys nothing
    on a cluster). Follows the c-blosc split rule so foreign blosc
    readers parse the result."""
    codec = CODEC_NAMES[cname]
    typesize = max(1, int(typesize))
    if shuffle == BITSHUFFLE:
        raise ValueError("blosc: bit-shuffle write not supported (use shuffle=1)")
    nbytes = len(raw)
    blocksize = nbytes if nbytes > 0 else 0
    body = _byteshuffle(raw, typesize) if (shuffle == SHUFFLE and typesize > 1) else raw
    flags = (0x1 if (shuffle == SHUFFLE and typesize > 1) else 0) | (codec << 5)

    streams: list[bytes]
    if _split_block(codec, typesize, blocksize):
        per = nbytes // typesize
        streams = [body[i * per : (i + 1) * per] for i in range(typesize)]
        tail = body[typesize * per :]
        if tail:
            streams[-1] += tail  # keep leftover with the last stream
    else:
        streams = [body]

    out = bytearray()
    for s in streams:
        comp = _compress_stream(codec, s, clevel)
        if len(comp) >= len(s):  # incompressible stream stored raw
            comp = s
        out += struct.pack("<i", len(comp)) + comp

    header_len = 16 + 4  # one block → one bstart entry
    cbytes = header_len + len(out)
    if cbytes >= nbytes + 16:
        # whole chunk incompressible → memcpy container
        header = struct.pack("<BBBBiii", 2, 1, 0x2 | (codec << 5), typesize, nbytes, blocksize, nbytes + 16)
        return header + raw
    header = struct.pack("<BBBBiii", 2, 1, flags, typesize, nbytes, blocksize, cbytes)
    bstarts = struct.pack("<i", 20)  # single block starts right after bstarts
    return header + bstarts + bytes(out)


def _parse_block(buf: bytes, start: int, codec: int, bsize: int, typesize: int, nstreams: int) -> bytes:
    """Decode one block of ``nstreams`` int32-prefixed streams covering
    ``bsize`` uncompressed bytes."""
    out = bytearray()
    pos = start
    per = bsize // nstreams if nstreams > 1 else bsize
    for i in range(nstreams):
        want = per if i < nstreams - 1 else bsize - per * (nstreams - 1)
        (csize,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        payload = buf[pos : pos + csize]
        pos += csize
        if csize == want:
            out += payload
        else:
            out += _decompress_stream(codec, payload, want)
    return bytes(out)


def blosc_decompress(chunk: bytes) -> bytes:
    """Decode one Blosc1 chunk to its raw little-endian buffer."""
    if len(chunk) < 16:
        raise ValueError("blosc: truncated header")
    _ver, _verlz, flags, typesize, nbytes, blocksize, _cbytes = struct.unpack_from(
        "<BBBBiii", chunk, 0
    )
    codec = (flags >> 5) & 0x7
    if flags & 0x2:  # memcpy
        return chunk[16 : 16 + nbytes]
    if flags & 0x4:
        raise ValueError("blosc: bit-shuffle decode not supported")
    if blocksize <= 0:
        blocksize = nbytes
    nblocks = max(1, -(-nbytes // blocksize))
    bstarts = struct.unpack_from(f"<{nblocks}i", chunk, 16)
    # c-blosc 1.18+ records the split decision in flags bit 0x10
    # ("doesn't split"); older chunks rely on the heuristic alone
    dont_split = bool(flags & 0x10)

    unshuffle = bool(flags & 0x1) and typesize > 1

    def parse(split: bool):
        # c-blosc decides nstreams PER BLOCK (blosc_d leftoverblock):
        # the trailing partial block is never split even when the full
        # blocks are — a multi-block chunk mixes both parses. Likewise
        # byte-shuffle is applied PER BLOCK on compress (blosc_c), so
        # the inverse must run per block, not over the joined buffer.
        out = bytearray()
        for j in range(nblocks):
            bsize = min(blocksize, nbytes - j * blocksize)
            ns = typesize if (split and bsize == blocksize) else 1
            block = _parse_block(chunk, bstarts[j], codec, bsize, typesize, ns)
            if unshuffle:
                block = _byteunshuffle(block, typesize)
            out += block
        return bytes(out)

    primary = (not dont_split) and _split_block(codec, typesize, blocksize)
    try:
        body = parse(primary)
    except Exception:
        # fallback: other split interpretation (c-blosc versions differ
        # slightly in the heuristic; the stream framing disambiguates)
        body = parse(not primary)
    return body


# ---------------------------------------------------------------------------
# CRC32C (Castagnoli, reflected poly 0x82F63B78) — required by the Zarr
# v3 sharding index codec chain ["bytes", "crc32c"].

def _make_crc32c_table() -> np.ndarray:
    poly = np.uint32(0x82F63B78)
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        crc = np.uint32(i)
        for _ in range(8):
            crc = (crc >> np.uint32(1)) ^ (poly if crc & np.uint32(1) else np.uint32(0))
        table[i] = crc
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    table = _CRC32C_TABLE
    for b in data:
        crc = int(table[(crc ^ b) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF
