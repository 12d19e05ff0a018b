"""Minimal GIF87a/89a codec (stdlib only) for CLI ingest breadth (S11).

The reference routes ``.gif`` through the imageio fallback backend
(detect_cli_io_backend.py:124-128, cli_input_to_ngff_image.py:87-95);
in a bare environment this decodes the format natively: global/local
color tables, LZW-compressed image data, interlaced row order, the
89a graphic-control extension (transparency index, disposal methods
0-3), and multi-frame animations composited onto the logical-screen
canvas. A frame whose effective palette is the identity gray ramp
decodes to (h, w) uint8 grayscale; everything else decodes to
(h, w, 3) uint8 RGB. Animations decode to an (n, h, w[, 3]) stack.

The encoder exists to make deterministic test fixtures: non-interlaced
(or interlaced on request), single global color table, one image per
frame covering the full canvas, standard LZW with dictionary reset at
4096 codes.
"""

from __future__ import annotations

import struct

import numpy as np

_EXTENSION = 0x21
_IMAGE = 0x2C
_TRAILER = 0x3B
_GRAPHIC_CONTROL = 0xF9

# interlace passes: (start_row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW

def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """Decode GIF-variant LZW (ITU/CompuServe spec, Appendix F) into a
    uint8 index array of length ``n_pixels``. Tolerates streams that
    end early (missing EOI) by returning what was decoded."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # dictionary: code -> bytes; codes < clear are single literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    n_bits = 0
    pos = 0
    mask = (1 << code_size) - 1
    while n_out < n_pixels:
        while n_bits < code_size:
            if pos >= len(data):
                return out[:n_out] if n_out < n_pixels else out
            acc |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        code = acc & mask
        acc >>= code_size
        n_bits -= code_size

        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            mask = (1 << code_size) - 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
            mask = (1 << code_size) - 1
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """GIF-variant LZW encoder with a clear-code dictionary reset when
    the table fills (4096 entries)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    n_bits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += code_size
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    data = indices.astype(np.uint8).tobytes()
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container

def _read_color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    tbl = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos)
    return tbl.reshape(n, 3).copy(), pos + 3 * n


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos:pos + n])
        pos += n
    return b"".join(chunks), pos


def _write_sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_decode(data: bytes) -> np.ndarray:
    """Decode a GIF to (h, w) uint8 gray / (h, w, 3) uint8 RGB for a
    single frame, or (n, h, w[, 3]) for an animation. Frames are
    composited onto the logical screen per the 89a disposal model."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/89a magic)")
    sw, sh, flags, bg_index, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 0x07))

    # canvas of palette-resolved RGB; start transparent-as-background
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    prev_canvas = canvas.copy()

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            label = data[pos]
            pos += 1
            payload, pos = _read_sub_blocks(data, pos)
            if label == _GRAPHIC_CONTROL and len(payload) >= 4:
                gflags = payload[0]
                disposal = (gflags >> 2) & 0x07
                transparent = payload[3] if gflags & 0x01 else None
            continue
        if block != _IMAGE:
            raise ValueError(f"unsupported GIF block 0x{block:02x}")

        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"malformed GIF: frame ({left},{top})+({w}x{h}) exceeds "
                f"logical screen {sw}x{sh}"
            )
        if iflags & 0x80:
            pal, pos = _read_color_table(data, pos, 2 << (iflags & 0x07))
        elif gct is not None:
            pal = gct
        else:
            raise ValueError("GIF image with no color table")
        min_code_size = data[pos]
        pos += 1
        raw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(min_code_size, raw, w * h)
        if idx.size != w * h:
            raise ValueError(
                f"malformed GIF: LZW stream ended after {idx.size} of "
                f"{w * h} pixels"
            )
        idx = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced
            deinter = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, h, step))
                deinter[start::step] = idx[src:src + n_rows]
                src += n_rows
            idx = deinter

        prev_canvas = canvas.copy()
        region = canvas[top:top + h, left:left + w]
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[...] = rgb
        frames.append(canvas.copy())

        if disposal == 2:  # restore to background
            bg = gct[bg_index] if gct is not None and bg_index < len(gct) else 0
            canvas[top:top + h, left:left + w] = bg
        elif disposal == 3:  # restore to previous
            canvas = prev_canvas
        disposal = 0
        transparent = None

    if not frames:
        raise ValueError("GIF contains no image data")
    stack = np.stack(frames) if len(frames) > 1 else frames[0][None]
    # collapse to grayscale when every frame is R==G==B
    if (stack[..., 0] == stack[..., 1]).all() and (stack[..., 1] == stack[..., 2]).all():
        stack = stack[..., 0]
    return stack[0] if len(frames) == 1 else stack


def gif_encode(
    arr: np.ndarray, interlace: bool = False, frames: bool | None = None
) -> bytes:
    """Encode (h, w) uint8 gray, (h, w, 3) uint8 RGB, or a frame stack
    (n, h, w[, 3]) as GIF89a with one global color table. RGB input
    must use ≤256 distinct colors across all frames (GIF is paletted).

    A 3-D array is ambiguous when its last axis is 3: by default it is
    read as one (h, w, 3) RGB image. Pass ``frames=True`` to force the
    (n, h, w) grayscale-animation reading (e.g. a 3-pixel-wide stack),
    or ``frames=False`` to assert the RGB reading explicitly."""
    if arr.dtype != np.uint8:
        raise ValueError(f"gif_encode needs uint8, got {arr.dtype}")
    if arr.ndim == 2:
        if frames:
            raise ValueError("frames=True needs a (n, h, w[, 3]) stack")
        gray = True
    elif arr.ndim == 3:
        if frames is None:
            gray = arr.shape[-1] != 3  # (n, h, w) gray stack vs (h, w, 3) RGB
        else:
            gray = bool(frames)  # explicit: True=(n,h,w) gray, False=(h,w,3)
        if not gray and arr.shape[-1] != 3:
            raise ValueError(f"frames=False needs (h, w, 3), got {arr.shape}")
    elif arr.ndim == 4 and arr.shape[-1] == 3:
        gray = False
    else:
        raise ValueError(f"unsupported GIF array shape {arr.shape}")
    frames = arr[None] if arr.ndim == (2 if gray else 3) else arr
    if gray:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        index_frames = [f for f in frames]
    else:
        colors = np.unique(frames.reshape(-1, 3), axis=0)
        if len(colors) > 256:
            raise ValueError(f"GIF palette overflow: {len(colors)} colors > 256")
        pal = np.zeros((256, 3), dtype=np.uint8)
        pal[: len(colors)] = colors
        # map each pixel to its palette index via lexicographic search
        keys = (colors[:, 0].astype(np.int64) << 16) | (
            colors[:, 1].astype(np.int64) << 8) | colors[:, 2]
        index_frames = []
        for f in frames:
            fk = (f[..., 0].astype(np.int64) << 16) | (
                f[..., 1].astype(np.int64) << 8) | f[..., 2]
            index_frames.append(
                np.searchsorted(keys, fk.ravel()).astype(np.uint8).reshape(f.shape[:2])
            )
    h, w = frames.shape[1:3]
    if not (1 <= w <= 65535 and 1 <= h <= 65535):
        raise ValueError(f"GIF dimensions are 16-bit: {w}x{h} out of range")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)  # 256-entry GCT
    out += pal.tobytes()
    if len(frames) > 1:
        # NETSCAPE2.0 looping application extension
        out += bytes([_EXTENSION, 0xFF, 11]) + b"NETSCAPE2.0"
        out += _write_sub_blocks(struct.pack("<BH", 1, 0))
    for idx in index_frames:
        if len(frames) > 1:
            out += bytes([_EXTENSION, _GRAPHIC_CONTROL, 4])
            out += struct.pack("<BHB", 0x04, 4, 0) + b"\x00"  # disposal=1, 4cs delay
        iflags = 0x40 if interlace else 0
        out += struct.pack("<BHHHHB", _IMAGE, 0, 0, w, h, iflags)
        if interlace:
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.append(idx[start::step])
            idx = np.concatenate(rows, axis=0)
        out.append(8)  # min LZW code size
        out += _write_sub_blocks(_lzw_encode(8, idx.ravel()))
    out.append(_TRAILER)
    return bytes(out)
