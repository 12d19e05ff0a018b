"""Native WebP-lossless (VP8L) codec (stdlib + numpy only) for CLI
ingest breadth (S11).

The reference routes ``.webp`` through the imageio fallback backend
(detect_cli_io_backend.py:124-128); in a bare environment this decodes
the format natively. The decoder implements the full VP8L bitstream
(RFC 9649): LSB-first bit reading, simple and normal prefix codes with
the 19-symbol code-length code, meta prefix (entropy) images, the
color cache, LZ77 backward references with the 120-entry 2D distance
map, and all four transforms (predictor with the 14 modes, color,
subtract-green, color-indexing with pixel bundling) — enough to decode
what ``cwebp -lossless`` emits (verified bit-exactly against libwebp
in tests/test_webp.py). Lossy VP8 is rejected with a clear error.

The encoder emits a minimal legal VP8L stream — flat 8-bit literal
codes, optional subtract-green transform, optional distance-1 LZ77
runs — used for deterministic test/gate fixtures; libwebp decodes its
output bit-identically.
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code symbol transmission order (RFC 9649 §"Prefix codes";
# note 16 sits between 5 and 6, unlike DEFLATE's ordering)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40


def _plane_codes() -> list[tuple[int, int]]:
    """The 120-entry 2D distance map: every (dx, dy) with dy in 0..7,
    dx in -7..8 and (dy > 0 or dx > 0), ordered by (dx²+dy², |dx|,
    negative-after-positive) — exactly the table in RFC 9649 (verified
    against libwebp's kCodeToPlane in tests)."""
    cands = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cands[:120]


_PLANE = _plane_codes()
_PLANE_INDEX = {p: i + 1 for i, p in enumerate(_PLANE)}  # (dx,dy) -> plane code


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.data
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, n: int) -> None:
        """n bits of value, LSB first."""
        self.acc |= (value & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """A prefix code: MSB of the code goes first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


class _Huffman:
    """Canonical prefix decoder: {(length, code_msb_first): symbol}."""

    __slots__ = ("table", "single")

    def __init__(self, lengths):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 0:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            # 0-bit code: the symbol is implicit
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        nz.sort()
        table = {}
        code = 0
        prev_len = nz[0][0]
        for l, s in nz:
            code <<= l - prev_len
            table[(l, code)] = s
            code += 1
            prev_len = l
        if code != (1 << prev_len):
            raise ValueError("prefix code is not complete")
        self.table = table

    def decode(self, br: _BitReader) -> int:
        if self.table is None:
            return self.single
        code = 0
        length = 0
        tbl = self.table
        while True:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = tbl.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("corrupt prefix code stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    lengths = [0] * alphabet_size
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths[sym0] = 1
        if num_symbols == 2:
            lengths[br.read(8)] = 1
        # a single nonzero length builds the 0-bit single-symbol code
        return _Huffman(lengths)
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Huffman(clc_lengths)
    if br.read_bit():  # length-limited transmission
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        code_len = clc.decode(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("code length repeat overflow")
                lengths[symbol] = fill
                symbol += 1
    return _Huffman(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §"LZ77")."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_to_distance(xsize: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _PLANE[plane_code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(br: _BitReader, w: int, h: int, is_level0: bool):
    """One entropy-coded ARGB image (the spatially-coded format shared
    by the main image, transform tiles, entropy image, and palette).
    Returns a flat uint32 list of length w*h."""
    # stream order: color-cache info first, THEN the meta-prefix bit
    # (which itself is only present at level 0) — libwebp
    # DecodeImageStream steps 2 and 3
    cache_bits = 0
    cache = None
    meta = None
    meta_bits = 0
    mw = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color cache bits {cache_bits}")
        cache = [0] * (1 << cache_bits)
    if is_level0 and br.read_bit():  # meta prefix codes
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_image_stream(br, mw, mh, is_level0=False)
    num_groups = (
        max(((p >> 8) & 0xFFFF) for p in meta) + 1 if meta is not None else 1
    )
    green_size = _NUM_LITERALS + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, _NUM_LITERALS),  # red
            _read_prefix_code(br, _NUM_LITERALS),  # blue
            _read_prefix_code(br, _NUM_LITERALS),  # alpha
            _read_prefix_code(br, _NUM_DISTANCE_CODES),
        ))
    n = w * h
    out = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            mp = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            g = groups[(mp >> 8) & 0xFFFF]
        else:
            g = groups[0]
        sym = g[0].decode(br)
        if sym < _NUM_LITERALS:
            green = sym
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            px = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif sym < _NUM_LITERALS + _NUM_LENGTH_CODES:
            length = _prefix_value(sym - _NUM_LITERALS, br)
            dist_code = _prefix_value(g[4].decode(br), br)
            dist = _plane_to_distance(w, dist_code)
            if dist > pos:
                raise ValueError("LZ77 distance before image start")
            for _ in range(length):
                if pos >= n:
                    raise ValueError("LZ77 copy past image end")
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
                pos += 1
        else:
            px = cache[sym - _NUM_LITERALS - _NUM_LENGTH_CODES]
            out[pos] = px
            pos += 1
    return out


def _decode_image_stream(br: _BitReader, w: int, h: int, is_level0: bool):
    """decode_image_stream() from the spec: transforms (level 0 only)
    then the entropy-coded image, with inverse transforms applied in
    reverse reading order."""
    transforms = []
    xsize = w
    if is_level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError(f"duplicate transform {ttype}")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color
                size_bits = br.read(3) + 2
                tw = (xsize + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                tiles = _decode_image_stream(br, tw, th, is_level0=False)
                transforms.append((ttype, size_bits, tiles))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # color indexing
                pal_size = br.read(8) + 1
                pal = _decode_image_stream(br, pal_size, 1, is_level0=False)
                # palette entries are component-delta coded
                for i in range(1, pal_size):
                    prev, cur = pal[i - 1], pal[i]
                    pal[i] = (
                        (((cur >> 24) + (prev >> 24)) & 0xFF) << 24
                        | ((((cur >> 16) & 0xFF) + ((prev >> 16) & 0xFF)) & 0xFF) << 16
                        | ((((cur >> 8) & 0xFF) + ((prev >> 8) & 0xFF)) & 0xFF) << 8
                        | (((cur & 0xFF) + (prev & 0xFF)) & 0xFF)
                    )
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (pal, width_bits, xsize)))
                xsize = (xsize + (1 << width_bits) - 1) >> width_bits
    data = _decode_entropy_image(br, xsize, h, is_level0)
    for t in reversed(transforms):
        if t[0] == 3:
            pal, width_bits, full_w = t[1]
            data = _apply_inverse_palette(data, xsize, h, pal, width_bits, full_w)
            xsize = full_w
        elif t[0] == 2:
            data = _apply_inverse_subtract_green(data)
        elif t[0] == 1:
            data = _apply_inverse_color(data, xsize, h, t[1], t[2])
        else:
            data = _apply_inverse_predictor(data, xsize, h, t[1], t[2])
    return data


# ---------------------------------------------------------------------------
# inverse transforms


def _apply_inverse_subtract_green(data):
    out = data
    for i, px in enumerate(out):
        g = (px >> 8) & 0xFF
        r = ((px >> 16) & 0xFF) + g
        b = (px & 0xFF) + g
        out[i] = (px & 0xFF00FF00) | ((r & 0xFF) << 16) | (b & 0xFF)
    return out


def _ctdelta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5 with arithmetic shift."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _apply_inverse_color(data, w, h, size_bits, tiles):
    tw = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        trow = (y >> size_bits) * tw
        row = y * w
        for x in range(w):
            cte = tiles[trow + (x >> size_bits)]
            g2r = cte & 0xFF           # blue channel of tile pixel
            g2b = (cte >> 8) & 0xFF    # green channel
            r2b = (cte >> 16) & 0xFF   # red channel
            px = data[row + x]
            g = (px >> 8) & 0xFF
            r = ((px >> 16) & 0xFF) + _ctdelta(g2r, g)
            r &= 0xFF
            b = (px & 0xFF) + _ctdelta(g2b, g)
            b = (b + _ctdelta(r2b, r)) & 0xFF
            data[row + x] = (px & 0xFF00FF00) | (r << 16) | b
    return data


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _select(l: int, t: int, tl: int) -> int:  # noqa: E741
    p_l = 0
    p_t = 0
    for sh in (24, 16, 8, 0):
        lc, tc, tlc = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        pred = lc + tc - tlc
        p_l += abs(pred - lc)
        p_t += abs(pred - tc)
    return l if p_l < p_t else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:  # noqa: E741
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        v = a + (d // 2 if d >= 0 else -((-d) // 2))  # C-style truncation
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _apply_inverse_predictor(data, w, h, size_bits, tiles):
    tw = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        trow = (y >> size_bits) * tw
        row = y * w
        for x in range(w):
            i = row + x
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = data[i - 1]  # left
            elif x == 0:
                pred = data[i - w]  # top
            else:
                mode = (tiles[trow + (x >> size_bits)] >> 8) & 0xFF
                left = data[i - 1]
                top = data[i - w]
                tl = data[i - w - 1]
                tr = data[i - w + 1] if x + 1 < w else data[row]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(left, top), tl)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            px = data[i]
            data[i] = (
                ((((px >> 24) + (pred >> 24)) & 0xFF) << 24)
                | (((((px >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((px >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8)
                | (((px & 0xFF) + (pred & 0xFF)) & 0xFF)
            )
    return data


def _apply_inverse_palette(data, packed_w, h, pal, width_bits, full_w):
    out = [0] * (full_w * h)
    if width_bits == 0:
        for y in range(h):
            for x in range(full_w):
                idx = (data[y * packed_w + x] >> 8) & 0xFF
                out[y * full_w + x] = pal[idx] if idx < len(pal) else 0
        return out
    per = 1 << width_bits           # indices per packed pixel
    ibits = 8 >> width_bits         # bits per index
    mask = (1 << ibits) - 1
    for y in range(h):
        for x in range(full_w):
            packed = data[y * packed_w + (x >> width_bits)]
            g = (packed >> 8) & 0xFF
            idx = (g >> ((x & (per - 1)) * ibits)) & mask
            out[y * full_w + x] = pal[idx] if idx < len(pal) else 0
    return out


# ---------------------------------------------------------------------------
# container + public API


def webp_decode(data: bytes) -> np.ndarray:
    """Decode a lossless WebP to (h, w) uint8 gray, (h, w, 3) RGB, or
    (h, w, 4) RGBA (alpha kept only when not constant 255)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP magic)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            payload = body
            break
        if fourcc == b"VP8 ":
            raise ValueError("lossy VP8 WebP is not supported (lossless VP8L only)")
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk found")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    flat = _decode_image_stream(br, w, h, is_level0=True)
    arr = np.array(flat, dtype=np.uint64).astype(np.uint32).reshape(h, w)
    a = (arr >> 24).astype(np.uint8)
    r = ((arr >> 16) & 0xFF).astype(np.uint8)
    g = ((arr >> 8) & 0xFF).astype(np.uint8)
    b = (arr & 0xFF).astype(np.uint8)
    if (a == 255).all():
        if (r == g).all() and (g == b).all():
            return g
        return np.stack([r, g, b], axis=-1)
    return np.stack([r, g, b, a], axis=-1)


def _write_flat_code(bw: _BitWriter, alphabet_size: int, used: int = 256) -> None:
    """Normal prefix code with 8-bit lengths for symbols 0..255 and 0
    for the rest — canonical code of symbol s is s itself."""
    bw.write(0, 1)  # not simple
    bw.write(12 - 4, 4)  # 12 code-length-code lengths
    # order [17,18,0,1,2,3,4,5,16,6,7,8]: symbols 0 and 8 get length 1
    for sym_len in (0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1):
        bw.write(sym_len, 3)
    bw.write(0, 1)  # no length-limit
    # 256 x '8' (code 1) then zeros for the rest of the alphabet
    for _ in range(used):
        bw.write(1, 1)
    for _ in range(alphabet_size - used):
        bw.write(0, 1)


def _write_rle_green_code(bw: _BitWriter) -> None:
    """Complete prefix code over the 280-symbol green alphabet that
    keeps LZ77 length codes usable: literals 0..255 at 9 bits (canonical
    code 256+s), length symbols 256..263 at 5 bits (codes 0..7),
    264..279 at 6 bits (codes 16..31). Kraft: 256/512 + 8/32 + 16/64 =
    1."""
    bw.write(0, 1)  # not simple
    bw.write(13 - 4, 4)
    # order [17,18,0,1,2,3,4,5,16,6,7,8,9]: len(9)=1, len(5)=len(6)=2
    for sym_len in (0, 0, 0, 0, 0, 0, 0, 2, 0, 2, 0, 0, 1):
        bw.write(sym_len, 3)
    bw.write(0, 1)  # no length-limit
    # clc canonical: 9 -> '0', 5 -> '10', 6 -> '11'
    for _ in range(256):
        bw.write_code(0b0, 1)   # literal lengths: 9
    for _ in range(8):
        bw.write_code(0b10, 2)  # length codes 256..263: 5
    for _ in range(16):
        bw.write_code(0b11, 2)  # length codes 264..279: 6


def _rle_emit_literal(bw: _BitWriter, s: int) -> None:
    bw.write_code(256 + s, 9)


def _rle_emit_length(bw: _BitWriter, code: int, extra: int, nbits: int) -> None:
    if code < 8:
        bw.write_code(code, 5)
    else:
        bw.write_code(16 + (code - 8), 6)
    if nbits:
        bw.write(extra, nbits)


def _write_simple_code(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    bw.write(1, 1)  # 8-bit symbol
    bw.write(symbol, 8)


def webp_encode(arr: np.ndarray, subtract_green: bool = False,
                rle: bool = False) -> bytes:
    """Encode (h, w) uint8 gray or (h, w, 3) uint8 RGB as lossless
    WebP: flat 8-bit literal codes, no color cache, no meta codes;
    optional subtract-green transform and distance-1 LZ77 run-length
    coding (both exercised against libwebp in tests)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"webp_encode needs uint8, got {arr.dtype}")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported WebP array shape {arr.shape}")
    h, w = arr.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError(f"VP8L dimensions are 14-bit: {w}x{h} out of range")
    if gray:
        r = g = b = arr
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    r = r.astype(np.int64)
    g = g.astype(np.int64)
    b = b.astype(np.int64)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    if rle:
        _write_rle_green_code(bw)
    else:
        _write_flat_code(bw, _NUM_LITERALS + _NUM_LENGTH_CODES)
    _write_flat_code(bw, _NUM_LITERALS)    # red
    _write_flat_code(bw, _NUM_LITERALS)    # blue
    _write_simple_code(bw, 255)            # alpha: constant, 0-bit code
    if rle:
        # distance: 0-bit single-symbol code for prefix symbol 1 ->
        # prefix value 2 -> plane code 2 = (dx 1, dy 0) = distance 1
        _write_simple_code(bw, 1)
    else:
        _write_simple_code(bw, 0)
    gr = g.ravel()
    rr = r.ravel()
    brv = b.ravel()
    n = h * w
    i = 0
    while i < n:
        run = 0
        if rle and i > 0:
            j = i
            while (j < n and run < 4096 and gr[j] == gr[j - 1]
                   and rr[j] == rr[j - 1] and brv[j] == brv[j - 1]):
                j += 1
                run += 1
        if run >= 3:
            # length prefix code; the distance tree is a 0-bit
            # single-symbol code (prefix symbol 1 -> value 2 -> plane
            # code 2 = (dx 1, dy 0) = distance 1), so nothing follows
            _rle_emit_length(bw, *_length_to_prefix(run))
            i += run
            continue
        if rle:
            _rle_emit_literal(bw, int(gr[i]))
        else:
            bw.write_code(int(gr[i]), 8)
        bw.write_code(int(rr[i]), 8)
        bw.write_code(int(brv[i]), 8)
        i += 1
    payload = b"\x2f" + bw.finish()
    riff = bytearray()
    riff += b"RIFF" + struct.pack("<I", 4 + 8 + len(payload) + (len(payload) & 1))
    riff += b"WEBP" + b"VP8L" + struct.pack("<I", len(payload))
    riff += payload
    if len(payload) & 1:
        riff += b"\x00"
    return bytes(riff)


def _length_to_prefix(v: int) -> tuple[int, int, int]:
    """value -> (prefix code, extra bits value, extra bit count);
    inverse of _prefix_value."""
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    nbits = v.bit_length() - 2
    code = 2 + ((v >> nbits) & 1) + 2 * nbits
    return code, v - (((2 + ((v >> nbits) & 1)) << nbits)), nbits
