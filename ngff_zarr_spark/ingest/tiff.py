"""TIFF 6.0 codec (S11's tifffile backend stand-in).

Implements the public TIFF 6.0 spec surface the reference reaches via
tifffile's ``aszarr`` path (reference cli.py:409-436): multi-page IFD
chains (a page stack ingests as a z-stack, the microscopy series
shape), strip AND tile layouts, grayscale 8/16-bit + RGB 8-bit, both
byte orders, and the spec compressions — none (1), LZW (5, MSB-first
with early change, §13), Deflate (8 / legacy 32946), PackBits (32773,
§9) — plus the horizontal-differencing predictor (tag 317 = 2, §14).

Encoder writes the same surface (multi-page, strips or tiles, any of
the four compressions, optional predictor) so stores can be exported
back to TIFF; decode paths are additionally pinned against hand-packed
independent fixtures in tests/test_tiff_depth.py, not just roundtrips.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# tag ids (TIFF 6.0)
WIDTH, LENGTH, BITS, COMPRESSION, PHOTOMETRIC = 256, 257, 258, 259, 262
STRIP_OFFSETS, SAMPLES_PER_PIXEL, ROWS_PER_STRIP, STRIP_BYTE_COUNTS = 273, 277, 278, 279
PLANAR_CONFIG, PREDICTOR = 284, 317
TILE_WIDTH, TILE_LENGTH, TILE_OFFSETS, TILE_BYTE_COUNTS = 322, 323, 324, 325

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

# ---------------------------------------------------------------------------
# compression primitives (public spec algorithms)


def _packbits_decode(data: bytes) -> bytes:
    """PackBits (TIFF §9 / Apple RLE): n<128 → n+1 literals; n>128 →
    next byte repeated 257-n times; 128 → noop."""
    out = bytearray()
    i = 0
    n_total = len(data)
    while i < n_total:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Greedy run-length PackBits: runs of ≥3 become replicate packets,
    everything between becomes literal packets (≤128 each)."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    def flush_literals(end):
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(data[j : j + k])
            j += k
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(i)
    return bytes(out)


_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258


def _lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (§13): MSB-first bit packing, Clear=256 EOI=257, code
    width 9→12 with the spec's EARLY CHANGE (width grows when the next
    table index reaches 2^w − 1, one code before GIF's rule)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    next_code = _LZW_FIRST

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = _LZW_FIRST

    reset()
    bitpos = 0
    nbits = len(data) * 8
    prev: bytes | None = None
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_CLEAR:
            reset()
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < next_code:
            entry = table[code]
            table.append(prev + entry[:1])
            next_code += 1
        else:
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        out += entry
        prev = entry
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder matching the early-change decoder above."""
    out = bytearray()
    acc = 0
    accbits = 0
    width = 9

    def put(code):
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _LZW_FIRST
    put(_LZW_CLEAR)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        put(table[w])
        table[wc] = next_code
        next_code += 1
        # EARLY CHANGE (§13): the encoder widens after ASSIGNING entry
        # 2^w − 1 (decoder, one code behind, widens one entry earlier —
        # when its next free index reaches 2^w − 1)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: clear (spec practice)
            put(_LZW_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = _LZW_FIRST
            width = 9
        w = c
    if w:
        put(table[w])
    put(_LZW_EOI)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _decompress(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression in (8, 32946):  # Deflate (Adobe) / legacy Deflate
        return zlib.decompress(raw)
    if compression == 32773:
        return _packbits_decode(raw)
    if compression == 5:
        return _lzw_decode(raw)
    raise ValueError(f"unsupported TIFF compression {compression}")


def _compress(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression in (8, 32946):
        return zlib.compress(raw, 6)
    if compression == 32773:
        return _packbits_encode(raw)
    if compression == 5:
        return _lzw_encode(raw)
    raise ValueError(f"unsupported TIFF compression {compression}")


def _undo_predictor(block: np.ndarray) -> np.ndarray:
    """Predictor 2 (§14): each sample stores the delta to its left
    neighbor; integration is a wrapping cumulative sum along x.
    ``block`` is (h, w, spp)."""
    return np.add.accumulate(block, axis=1, dtype=block.dtype)


def _apply_predictor(block: np.ndarray) -> np.ndarray:
    out = block.copy()
    out[:, 1:, :] = block[:, 1:, :] - block[:, :-1, :]
    return out


# ---------------------------------------------------------------------------
# IFD parsing


def _read_value(buf, endian, typ, count, raw):
    size = _TYPE_SIZES.get(typ, 1) * count
    if size <= 4:
        data = raw[:size]
    else:
        (off,) = struct.unpack(f"{endian}I", raw)
        data = buf[off : off + size]
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        return None
    vals = struct.unpack(f"{endian}{count}{fmt}", data)
    return list(vals)


def _parse_ifds(data: bytes):
    """Walk the IFD chain: yields one tag dict per page."""
    order = data[:2]
    if order == b"II":
        endian = "<"
    elif order == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF file")
    magic, ifd_off = struct.unpack_from(f"{endian}HI", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF file (bad magic)")
    pages = []
    seen = set()
    while ifd_off and ifd_off not in seen:
        seen.add(ifd_off)  # cycle guard
        (n,) = struct.unpack_from(f"{endian}H", data, ifd_off)
        tags = {}
        for i in range(n):
            tag, typ, count = struct.unpack_from(
                f"{endian}HHI", data, ifd_off + 2 + i * 12
            )
            raw = data[ifd_off + 2 + i * 12 + 8 : ifd_off + 2 + i * 12 + 12]
            tags[tag] = _read_value(data, endian, typ, count, raw)
        (ifd_off,) = struct.unpack_from(
            f"{endian}I", data, ifd_off + 2 + n * 12
        )
        pages.append((endian, tags))
    return pages


def _decode_page(data: bytes, endian: str, tags: dict) -> np.ndarray:
    w = tags[WIDTH][0]
    h = tags[LENGTH][0]
    bits = tags.get(BITS, [8])[0]
    spp = tags.get(SAMPLES_PER_PIXEL, [1])[0]
    compression = tags.get(COMPRESSION, [1])[0]
    predictor = tags.get(PREDICTOR, [1])[0]
    planar = tags.get(PLANAR_CONFIG, [1])[0]
    if planar != 1:
        raise ValueError(f"unsupported TIFF planar configuration {planar}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    def segment(raw: bytes, sh, sw) -> np.ndarray:
        buf = _decompress(raw, compression)
        seg = np.frombuffer(buf, dtype=dtype, count=sh * sw * spp).reshape(
            sh, sw, spp
        )
        if predictor == 2:
            seg = _undo_predictor(seg)
        return seg

    # structural guards BEFORE the (h, w) allocation (r18 fuzz finding:
    # a bit-flipped ImageLength of 2^28 with one 16-row strip decoded
    # "successfully" into a gigabytes-of-zeros image — the declared
    # geometry must be covered by the segment tables, which for a
    # well-formed file it exactly is)
    if h <= 0 or w <= 0 or spp <= 0:
        raise ValueError(f"bad TIFF geometry h={h} w={w} spp={spp}")
    if bits not in (8, 16, 32):
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    # constructed only after the bits guard: a malformed depth like 0
    # or 24 must raise the ValueError above, not np.dtype's TypeError
    # (ADVICE r18 — the dtype construction left the guard partially dead)
    dtype = np.dtype(f"{endian}u{bits // 8}")
    # plausibility cap on declared pixel volume vs bytes actually
    # stored for the page: a flipped dimension bit declares a 10^7×
    # expansion and previously MemoryErrored on the output allocation;
    # 10^5 admits any real compression ratio (zlib ceiling 1032:1,
    # constant-image LZW ~10^4:1) with a 1 MB floor for tiny pages
    stored = sum(
        tags.get(TILE_BYTE_COUNTS, tags.get(STRIP_BYTE_COUNTS, [0]))
    )
    if h * w * spp * (bits // 8) > 100_000 * max(stored, 1) + (1 << 20):
        raise ValueError(
            f"TIFF declares {h}x{w}x{spp}@{bits}-bit "
            f"({h * w * spp * (bits // 8)} bytes) but stores only "
            f"{stored} segment bytes — implausible, refusing"
        )
    out = np.zeros((h, w, spp), dtype=dtype)
    if TILE_OFFSETS in tags:
        tw = tags[TILE_WIDTH][0]
        th = tags[TILE_LENGTH][0]
        offsets = tags[TILE_OFFSETS]
        counts = tags[TILE_BYTE_COUNTS]
        if tw <= 0 or th <= 0:
            raise ValueError(f"bad TIFF tile size {tw}x{th}")
        tiles_across = -(-w // tw)
        n_tiles = tiles_across * (-(-h // th))
        if len(offsets) != n_tiles or len(counts) != n_tiles:
            raise ValueError(
                f"TIFF tile table mismatch: {len(offsets)} offsets / "
                f"{len(counts)} counts for {n_tiles} declared tiles"
            )
        for i, (o, c) in enumerate(zip(offsets, counts)):
            ty, tx = divmod(i, tiles_across)
            tile = segment(data[o : o + c], th, tw)
            y0, x0 = ty * th, tx * tw
            out[y0 : y0 + th, x0 : x0 + tw] = tile[
                : min(th, h - y0), : min(tw, w - x0)
            ]
    else:
        rps = tags.get(ROWS_PER_STRIP, [h])[0]
        offsets = tags[STRIP_OFFSETS]
        counts = tags[STRIP_BYTE_COUNTS]
        if rps <= 0:
            raise ValueError(f"bad TIFF rows-per-strip {rps}")
        n_strips = -(-h // rps)
        if len(offsets) != n_strips or len(counts) != n_strips:
            raise ValueError(
                f"TIFF strip table mismatch: {len(offsets)} offsets / "
                f"{len(counts)} counts for {n_strips} declared strips"
            )
        y = 0
        for o, c in zip(offsets, counts):
            sh = min(rps, h - y)
            out[y : y + sh] = segment(data[o : o + c], sh, w)
            y += sh
    arr = out[:, :, 0] if spp == 1 else out
    return np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("=")))


def tiff_decode_pages(data: bytes) -> list[np.ndarray]:
    """Decode every page of the IFD chain (multi-page series shape —
    the reference's tifffile ``aszarr`` multi-IFD path)."""
    return [_decode_page(data, e, t) for e, t in _parse_ifds(data)]


def tiff_decode(data: bytes) -> np.ndarray:
    """First page (single-image compatibility surface)."""
    return tiff_decode_pages(data)[0]


# ---------------------------------------------------------------------------
# encoder


def tiff_encode_pages(
    arrs: list[np.ndarray],
    compression: int = 1,
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    rows_per_strip: int | None = None,
) -> bytes:
    """Encode pages as a little-endian TIFF IFD chain. Each page is
    (h, w) uint8/uint16 grayscale or (h, w, 3) uint8 RGB; strips by
    default (whole image, or ``rows_per_strip``), ``tile=(tw, th)``
    switches to the tiled layout."""
    blobs: list[bytes] = []
    page_meta = []
    for arr in arrs:
        if arr.ndim == 2:
            spp = 1
        elif arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
            spp = 3
        else:
            raise ValueError(f"unsupported TIFF array {arr.shape}/{arr.dtype}")
        if arr.dtype not in (np.dtype("uint8"), np.dtype("uint16")):
            raise ValueError(f"unsupported TIFF dtype {arr.dtype}")
        h, w = arr.shape[:2]
        px = arr.reshape(h, w, spp).astype(arr.dtype.newbyteorder("<"))
        segs = []
        if tile is not None:
            tw, th = tile
            for y0 in range(0, h, th):
                for x0 in range(0, w, tw):
                    t = np.zeros((th, tw, spp), dtype=px.dtype)
                    sub = px[y0 : y0 + th, x0 : x0 + tw]
                    t[: sub.shape[0], : sub.shape[1]] = sub
                    segs.append(t)
            seg_shape = (th, tw)
        else:
            rps = rows_per_strip or h
            for y0 in range(0, h, rps):
                segs.append(px[y0 : y0 + rps])
            seg_shape = None
        enc = []
        for s in segs:
            if predictor == 2:
                s = _apply_predictor(s.reshape(s.shape[0], s.shape[1], spp))
            enc.append(_compress(s.tobytes(), compression))
        blobs.append(enc)
        page_meta.append((h, w, spp, arr.dtype.itemsize * 8, seg_shape))

    # layout: header | page IFDs+overflow+data sequentially
    out = bytearray(struct.pack("<2sHI", b"II", 42, 0))
    ifd_offsets = []
    for pi, (enc, (h, w, spp, bits, seg_shape)) in enumerate(zip(blobs, page_meta)):
        entries = []  # (tag, typ, count, packed4 | None, overflow bytes)

        def entry(tag, typ, count, value4=None, overflow=None):
            entries.append([tag, typ, count, value4, overflow])

        n_segs = len(enc)
        entry(WIDTH, 4, 1, struct.pack("<I", w))
        entry(LENGTH, 4, 1, struct.pack("<I", h))
        if spp == 3:
            entry(BITS, 3, 3, None, struct.pack("<3H", 8, 8, 8))
        else:
            entry(BITS, 3, 1, struct.pack("<HH", bits, 0))
        entry(COMPRESSION, 3, 1, struct.pack("<HH", compression, 0))
        entry(PHOTOMETRIC, 3, 1, struct.pack("<HH", 2 if spp == 3 else 1, 0))
        entry(SAMPLES_PER_PIXEL, 3, 1, struct.pack("<HH", spp, 0))
        if predictor == 2:
            entry(PREDICTOR, 3, 1, struct.pack("<HH", 2, 0))
        if seg_shape is not None:
            th, tw = seg_shape
            entry(TILE_WIDTH, 4, 1, struct.pack("<I", tw))
            entry(TILE_LENGTH, 4, 1, struct.pack("<I", th))
            off_tag, cnt_tag = TILE_OFFSETS, TILE_BYTE_COUNTS
        else:
            rps = rows_per_strip or h
            entry(ROWS_PER_STRIP, 4, 1, struct.pack("<I", rps))
            off_tag, cnt_tag = STRIP_OFFSETS, STRIP_BYTE_COUNTS
        # offsets/counts filled after layout below
        entry(off_tag, 4, n_segs, None, b"")
        entry(cnt_tag, 4, n_segs, None, b"")
        entries.sort(key=lambda e: e[0])  # spec: ascending tag order

        ifd_off = len(out)
        ifd_offsets.append(ifd_off)
        ifd_size = 2 + len(entries) * 12 + 4
        cursor = ifd_off + ifd_size  # overflow region starts here
        overflow = bytearray()
        # first pass: reserve overflow space (offsets/counts arrays may
        # overflow when n_segs > 1)
        resolved = []
        for tag, typ, count, value4, ov in entries:
            if tag in (off_tag, cnt_tag):
                size = 4 * count
                ov = b"\0" * size if size > 4 else None
                value4 = None if size > 4 else b"\0\0\0\0"
            if ov is not None and value4 is None:
                resolved.append([tag, typ, count, struct.pack("<I", cursor + len(overflow)), len(overflow), len(ov)])
                overflow += ov
            else:
                resolved.append([tag, typ, count, value4, None, None])
        data_start = cursor + len(overflow)
        seg_offsets = []
        pos = data_start
        for e in enc:
            seg_offsets.append(pos)
            pos += len(e)
        # patch offsets/counts into their overflow slots (or inline)
        off_words = struct.pack(f"<{n_segs}I", *seg_offsets)
        cnt_words = struct.pack(f"<{n_segs}I", *[len(e) for e in enc])
        for r, (tag, typ, count, value4, ov_pos, ov_len) in enumerate(resolved):
            if tag == off_tag:
                if ov_pos is None:
                    resolved[r][3] = off_words
                else:
                    overflow[ov_pos : ov_pos + ov_len] = off_words
            elif tag == cnt_tag:
                if ov_pos is None:
                    resolved[r][3] = cnt_words
                else:
                    overflow[ov_pos : ov_pos + ov_len] = cnt_words
        next_ifd = pos if pi + 1 < len(blobs) else 0
        ifd = struct.pack("<H", len(resolved))
        for tag, typ, count, value4, _, _ in resolved:
            ifd += struct.pack("<HHI", tag, typ, count) + value4.ljust(4, b"\0")
        # next-IFD pointer patched on the following iteration via
        # placeholder: we know `pos` already, but the NEXT page's ifd
        # offset equals pos only if it is laid out immediately after —
        # which it is (sequential layout)
        ifd += struct.pack("<I", next_ifd)
        out += ifd + overflow
        for e in enc:
            out += e
    # patch the header's first-IFD pointer
    out[4:8] = struct.pack("<I", ifd_offsets[0])
    return bytes(out)


def tiff_encode(arr: np.ndarray) -> bytes:
    """Single-page uncompressed single-strip encode (compatibility
    surface; byte layout differs from the historical encoder only in
    tag order, which the spec mandates ascending anyway)."""
    return tiff_encode_pages([arr])


def tiff_to_ngff_image(spark, path, name: str = "image"):
    """S11 tifffile-backend equivalent: TIFF file → NgffImage pixel
    table with default dims/scale (reference cli_input_to_ngff_image.py:62-73
    + to_ngff_image defaulting). A multi-page chain ingests as a
    z-stack (the tifffile series shape, reference cli.py:409-436)."""
    from ..model import to_ngff_image
    from .nifti import array_to_pixel_df

    pages = tiff_decode_pages(open(path, "rb").read())
    if len(pages) == 1:
        arr = pages[0]
        dims = ["y", "x"] if arr.ndim == 2 else ["y", "x", "c"]
    else:
        if any(p.shape != pages[0].shape for p in pages):
            raise ValueError("multi-page TIFF with heterogeneous page shapes")
        # np.stack silently promotes mixed uint8/uint16 pages — the
        # NgffImage dtype claim must match the stored pages (ADVICE r14)
        if any(p.dtype != pages[0].dtype for p in pages):
            raise ValueError("multi-page TIFF with heterogeneous page dtypes")
        arr = np.stack(pages)
        dims = ["z", "y", "x"] if arr.ndim == 3 else ["z", "y", "x", "c"]
    df = array_to_pixel_df(spark, arr, dims)
    img = to_ngff_image(
        df, dims=dims, shape={d: int(s) for d, s in zip(dims, arr.shape)}, name=name
    )
    img.dtype = arr.dtype.name
    return img
