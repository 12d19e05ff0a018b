"""Native PNG/GIF/TIFF codecs vs the REAL system libraries (VERDICT r8
ask #2 pattern — the libwebp ctypes oracle extended to the rest of the
codec suite).

Each library is used ONLY as a test oracle via ctypes; the shipped
codecs are stdlib+numpy. Both directions where the library's API
allows: the real library decodes OUR encoder's output bit-exactly, and
our decoder reads the REAL library's output bit-exactly. Tests skip
cleanly when a library is absent.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from ngff_zarr_spark.ingest.gif import gif_decode, gif_encode
from ngff_zarr_spark.ingest.png import png_decode, png_encode
from ngff_zarr_spark.ingest.tiff import tiff_decode, tiff_encode


# ---------------------------------------------------------------------------
# libpng 1.6 simplified API (png_image struct is public, fixed ABI)

PNG_IMAGE_VERSION = 1
PNG_FORMAT_GRAY = 0
PNG_FORMAT_RGB = 2  # PNG_FORMAT_FLAG_COLOR


class PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def _load_libpng():
    for name in ("libpng16.so.16", "libpng16.so", ctypes.util.find_library("png")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        if not hasattr(lib, "png_image_begin_read_from_memory"):
            continue
        lib.png_image_begin_read_from_memory.restype = ctypes.c_int
        lib.png_image_begin_read_from_memory.argtypes = [
            ctypes.POINTER(PngImage), ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.png_image_finish_read.restype = ctypes.c_int
        lib.png_image_finish_read.argtypes = [
            ctypes.POINTER(PngImage), ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.png_image_write_to_memory.restype = ctypes.c_int
        lib.png_image_write_to_memory.argtypes = [
            ctypes.POINTER(PngImage), ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p,
        ]
        return lib
    return None


LIBPNG = _load_libpng()
png_oracle = pytest.mark.skipif(LIBPNG is None, reason="libpng16 not available")


def _libpng_decode(data: bytes, channels: int) -> np.ndarray:
    img = PngImage()
    img.version = PNG_IMAGE_VERSION
    assert LIBPNG.png_image_begin_read_from_memory(
        ctypes.byref(img), data, len(data)
    ), img.message
    img.format = PNG_FORMAT_GRAY if channels == 1 else PNG_FORMAT_RGB
    buf = np.empty(img.height * img.width * channels, dtype=np.uint8)
    assert LIBPNG.png_image_finish_read(
        ctypes.byref(img), None, buf.ctypes.data_as(ctypes.c_void_p), 0, None
    ), img.message
    shape = (img.height, img.width) if channels == 1 else (img.height, img.width, 3)
    return buf.reshape(shape)


def _libpng_encode(arr: np.ndarray) -> bytes:
    channels = 1 if arr.ndim == 2 else 3
    img = PngImage()
    img.version = PNG_IMAGE_VERSION
    img.width, img.height = arr.shape[1], arr.shape[0]
    img.format = PNG_FORMAT_GRAY if channels == 1 else PNG_FORMAT_RGB
    src = np.ascontiguousarray(arr)
    size = ctypes.c_size_t(0)
    # first call sizes the output; second writes it
    LIBPNG.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0,
        src.ctypes.data_as(ctypes.c_void_p), 0, None,
    )
    assert size.value > 0, img.message
    out = ctypes.create_string_buffer(size.value)
    assert LIBPNG.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), 0,
        src.ctypes.data_as(ctypes.c_void_p), 0, None,
    ), img.message
    return out.raw[: size.value]


@png_oracle
def test_png_encoder_read_by_real_libpng():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    assert np.array_equal(_libpng_decode(png_encode(gray), 1), gray)
    rgb = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    assert np.array_equal(_libpng_decode(png_encode(rgb), 3), rgb)


@png_oracle
def test_png_decoder_reads_real_libpng_output():
    rng = np.random.default_rng(12)
    gray = rng.integers(0, 256, (19, 27), dtype=np.uint8)
    assert np.array_equal(png_decode(_libpng_encode(gray)), gray)
    rgb = rng.integers(0, 256, (21, 15, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(_libpng_encode(rgb)), rgb)


# ---------------------------------------------------------------------------
# giflib 5 (DGifOpen with a memory-read callback + DGifSlurp; the
# public GifFileType/SavedImage ABI)

GifWord = ctypes.c_int


class GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte), ("Blue", ctypes.c_ubyte)]


class ColorMapObject(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int),
        ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_bool),
        ("Colors", ctypes.POINTER(GifColorType)),
    ]


class GifImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", GifWord), ("Top", GifWord), ("Width", GifWord), ("Height", GifWord),
        ("Interlace", ctypes.c_bool),
        ("ColorMap", ctypes.POINTER(ColorMapObject)),
    ]


class SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", GifImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
    ]


class GifFileType(ctypes.Structure):
    _fields_ = [
        ("SWidth", GifWord), ("SHeight", GifWord),
        ("SColorResolution", GifWord), ("SBackGroundColor", GifWord),
        ("AspectByte", ctypes.c_ubyte),
        ("SColorMap", ctypes.POINTER(ColorMapObject)),
        ("ImageCount", ctypes.c_int),
        ("Image", GifImageDesc),
        ("SavedImages", ctypes.POINTER(SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p),
        ("Private", ctypes.c_void_p),
    ]


GIF_READ_FUNC = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(GifFileType), ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int
)


def _load_libgif():
    for name in ("libgif.so.7", "libgif.so", ctypes.util.find_library("gif")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        if not hasattr(lib, "DGifOpen"):
            continue
        lib.DGifOpen.restype = ctypes.POINTER(GifFileType)
        lib.DGifOpen.argtypes = [ctypes.c_void_p, GIF_READ_FUNC, ctypes.POINTER(ctypes.c_int)]
        lib.DGifSlurp.restype = ctypes.c_int
        lib.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
        lib.DGifCloseFile.restype = ctypes.c_int
        lib.DGifCloseFile.argtypes = [ctypes.POINTER(GifFileType), ctypes.POINTER(ctypes.c_int)]
        return lib
    return None


LIBGIF = _load_libgif()
gif_oracle = pytest.mark.skipif(LIBGIF is None, reason="giflib not available")


def _giflib_decode_frames(data: bytes):
    """All frames' palette-resolved RGB via real giflib (no disposal
    compositing — raw per-frame rasters)."""
    pos = {"i": 0}

    @GIF_READ_FUNC
    def reader(_gf, buf, want):
        take = min(want, len(data) - pos["i"])
        if take > 0:
            ctypes.memmove(buf, data[pos["i"] : pos["i"] + take], take)
            pos["i"] += take
        return take

    err = ctypes.c_int(0)
    gf = LIBGIF.DGifOpen(None, reader, ctypes.byref(err))
    assert gf, f"DGifOpen error {err.value}"
    assert LIBGIF.DGifSlurp(gf) == 1, f"DGifSlurp error {gf.contents.Error}"
    frames = []
    g = gf.contents
    for i in range(g.ImageCount):
        si = g.SavedImages[i]
        d = si.ImageDesc
        cm = d.ColorMap if d.ColorMap else g.SColorMap
        assert cm, "no color table"
        ncol = cm.contents.ColorCount
        pal = np.array(
            [
                (cm.contents.Colors[j].Red, cm.contents.Colors[j].Green, cm.contents.Colors[j].Blue)
                for j in range(ncol)
            ],
            dtype=np.uint8,
        )
        n = d.Width * d.Height
        idx = np.ctypeslib.as_array(si.RasterBits, shape=(n,)).copy()
        frames.append(pal[np.minimum(idx, ncol - 1)].reshape(d.Height, d.Width, 3))
    LIBGIF.DGifCloseFile(gf, ctypes.byref(err))
    return frames


@gif_oracle
def test_gif_encoder_read_by_real_giflib():
    rng = np.random.default_rng(13)
    gray = rng.integers(0, 256, (14, 22), dtype=np.uint8)
    frames = _giflib_decode_frames(bytes(gif_encode(gray)))
    assert len(frames) == 1
    # gray palette: R==G==B==index
    assert np.array_equal(frames[0][..., 0], gray)
    assert np.array_equal(frames[0][..., 1], gray)

    # interlaced: giflib de-interlaces in DGifSlurp? It does NOT — it
    # stores rasters in file order; our non-interlaced stack compare
    # covers the LZW + palette path; interlace is covered vs our own
    # decoder in test_gif.py
    stack = rng.integers(0, 256, (3, 9, 11), dtype=np.uint8)
    frames = _giflib_decode_frames(bytes(gif_encode(stack, frames=True)))
    assert len(frames) == 3
    for k in range(3):
        assert np.array_equal(frames[k][..., 0], stack[k]), k


@gif_oracle
def test_gif_rgb_encoder_read_by_real_giflib():
    rng = np.random.default_rng(14)
    # <=256 distinct colors
    base = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    rgb = base[rng.integers(0, 16, (12, 18))]
    frames = _giflib_decode_frames(bytes(gif_encode(rgb)))
    assert len(frames) == 1
    assert np.array_equal(frames[0], rgb)


# ---------------------------------------------------------------------------
# libtiff (TIFFClientOpen on a memory buffer + TIFFReadScanline)

TIFF_READWRITE = ctypes.CFUNCTYPE(
    ctypes.c_ssize_t, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_ssize_t
)
TIFF_SEEK = ctypes.CFUNCTYPE(ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int)
TIFF_CLOSE = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)
TIFF_SIZE = ctypes.CFUNCTYPE(ctypes.c_uint64, ctypes.c_void_p)
TIFF_MAP = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64)
)
TIFF_UNMAP = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64)

TIFFTAG_IMAGEWIDTH = 256
TIFFTAG_IMAGELENGTH = 257
TIFFTAG_BITSPERSAMPLE = 258
TIFFTAG_SAMPLESPERPIXEL = 277


def _load_libtiff():
    for name in ("libtiff.so.6", "libtiff.so.5", ctypes.util.find_library("tiff")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        if not hasattr(lib, "TIFFClientOpen"):
            continue
        lib.TIFFClientOpen.restype = ctypes.c_void_p
        lib.TIFFClientOpen.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p,
            TIFF_READWRITE, TIFF_READWRITE, TIFF_SEEK, TIFF_CLOSE,
            TIFF_SIZE, TIFF_MAP, TIFF_UNMAP,
        ]
        lib.TIFFGetField.restype = ctypes.c_int
        lib.TIFFReadScanline.restype = ctypes.c_int
        lib.TIFFReadScanline.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16,
        ]
        lib.TIFFClose.restype = None
        lib.TIFFClose.argtypes = [ctypes.c_void_p]
        return lib
    return None


LIBTIFF = _load_libtiff()
tiff_oracle = pytest.mark.skipif(LIBTIFF is None, reason="libtiff not available")


def _libtiff_decode(data: bytes) -> np.ndarray:
    state = {"pos": 0}

    @TIFF_READWRITE
    def read_cb(_h, buf, n):
        take = min(n, len(data) - state["pos"])
        if take > 0:
            ctypes.memmove(buf, data[state["pos"] : state["pos"] + take], take)
            state["pos"] += take
        return take

    @TIFF_READWRITE
    def write_cb(_h, _buf, _n):
        return -1

    @TIFF_SEEK
    def seek_cb(_h, off, whence):
        if whence == 0:
            state["pos"] = off
        elif whence == 1:
            state["pos"] += off
        else:
            state["pos"] = len(data) + off
        return state["pos"]

    @TIFF_CLOSE
    def close_cb(_h):
        return 0

    @TIFF_SIZE
    def size_cb(_h):
        return len(data)

    @TIFF_MAP
    def map_cb(_h, _p, _n):
        return 0

    @TIFF_UNMAP
    def unmap_cb(_h, _p, _n):
        return None

    tif = LIBTIFF.TIFFClientOpen(
        b"mem", b"r", None, read_cb, write_cb, seek_cb, close_cb,
        size_cb, map_cb, unmap_cb,
    )
    assert tif, "TIFFClientOpen failed"
    w = ctypes.c_uint32(0)
    h = ctypes.c_uint32(0)
    bits = ctypes.c_uint16(0)
    spp = ctypes.c_uint16(1)
    assert LIBTIFF.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(TIFFTAG_IMAGEWIDTH), ctypes.byref(w))
    assert LIBTIFF.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(TIFFTAG_IMAGELENGTH), ctypes.byref(h))
    assert LIBTIFF.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(TIFFTAG_BITSPERSAMPLE), ctypes.byref(bits))
    LIBTIFF.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(TIFFTAG_SAMPLESPERPIXEL), ctypes.byref(spp))
    dtype = np.uint8 if bits.value == 8 else np.uint16
    out = np.empty((h.value, w.value * spp.value), dtype=dtype)
    row = np.empty(w.value * spp.value, dtype=dtype)
    for y in range(h.value):
        assert LIBTIFF.TIFFReadScanline(tif, row.ctypes.data_as(ctypes.c_void_p), y, 0) == 1
        out[y] = row
    LIBTIFF.TIFFClose(tif)
    if spp.value == 3:
        return out.reshape(h.value, w.value, 3)
    return out


@tiff_oracle
def test_tiff_encoder_read_by_real_libtiff():
    rng = np.random.default_rng(15)
    gray8 = rng.integers(0, 256, (13, 29), dtype=np.uint8)
    assert np.array_equal(_libtiff_decode(tiff_encode(gray8)), gray8)
    gray16 = rng.integers(0, 65536, (11, 17), dtype=np.uint16)
    assert np.array_equal(_libtiff_decode(tiff_encode(gray16)), gray16)
    rgb = rng.integers(0, 256, (9, 21, 3), dtype=np.uint8)
    assert np.array_equal(_libtiff_decode(tiff_encode(rgb)), rgb)


def _giflib_encode_gray(arr: np.ndarray) -> bytes:
    """Encode (h, w) gray via real giflib (EGif API) — exercises LZW
    code progressions our own encoder never emits."""
    out = bytearray()

    @GIF_READ_FUNC  # same signature as write: (GifFileType*, buf, len)
    def writer(_gf, buf, n):
        out.extend(ctypes.string_at(buf, n))
        return n

    LIBGIF.EGifOpen.restype = ctypes.POINTER(GifFileType)
    LIBGIF.EGifOpen.argtypes = [ctypes.c_void_p, GIF_READ_FUNC, ctypes.POINTER(ctypes.c_int)]
    err = ctypes.c_int(0)
    gf = LIBGIF.EGifOpen(None, writer, ctypes.byref(err))
    assert gf, f"EGifOpen error {err.value}"

    h, w = arr.shape
    ncol = 256
    colors = (GifColorType * ncol)()
    for i in range(ncol):
        colors[i].Red = colors[i].Green = colors[i].Blue = i
    LIBGIF.GifMakeMapObject.restype = ctypes.POINTER(ColorMapObject)
    cmap = LIBGIF.GifMakeMapObject(ncol, colors)
    assert cmap
    assert LIBGIF.EGifPutScreenDesc(gf, w, h, 8, 0, cmap) == 1
    assert LIBGIF.EGifPutImageDesc(gf, 0, 0, w, h, 0, None) == 1
    row = np.ascontiguousarray(arr, dtype=np.uint8)
    for y in range(h):
        assert LIBGIF.EGifPutLine(gf, row[y].ctypes.data_as(ctypes.c_void_p), w) == 1
    assert LIBGIF.EGifCloseFile(gf, ctypes.byref(err)) == 1
    LIBGIF.GifFreeMapObject(cmap)
    return bytes(out)


@gif_oracle
def test_gif_decoder_reads_real_giflib_output():
    rng = np.random.default_rng(16)
    gray = rng.integers(0, 256, (15, 23), dtype=np.uint8)
    data = _giflib_encode_gray(gray)
    assert data[:6] in (b"GIF87a", b"GIF89a")
    assert np.array_equal(gif_decode(data), gray)


def _libtiff_encode_gray8(arr: np.ndarray) -> bytes:
    """Encode via real libtiff through TIFFClientOpen('w') callbacks."""
    buf = bytearray()
    state = {"pos": 0}

    @TIFF_READWRITE
    def read_cb(_h, b, n):
        take = min(n, len(buf) - state["pos"])
        if take > 0:
            ctypes.memmove(b, bytes(buf[state["pos"] : state["pos"] + take]), take)
            state["pos"] += take
        return take

    @TIFF_READWRITE
    def write_cb(_h, b, n):
        data = ctypes.string_at(b, n)
        end = state["pos"] + n
        if end > len(buf):
            buf.extend(b"\x00" * (end - len(buf)))
        buf[state["pos"] : end] = data
        state["pos"] = end
        return n

    @TIFF_SEEK
    def seek_cb(_h, off, whence):
        if whence == 0:
            state["pos"] = off
        elif whence == 1:
            state["pos"] += off
        else:
            state["pos"] = len(buf) + off
        return state["pos"]

    @TIFF_CLOSE
    def close_cb(_h):
        return 0

    @TIFF_SIZE
    def size_cb(_h):
        return len(buf)

    @TIFF_MAP
    def map_cb(_h, _p, _n):
        return 0

    @TIFF_UNMAP
    def unmap_cb(_h, _p, _n):
        return None

    tif = LIBTIFF.TIFFClientOpen(
        b"mem", b"w", None, read_cb, write_cb, seek_cb, close_cb,
        size_cb, map_cb, unmap_cb,
    )
    assert tif, "TIFFClientOpen(w) failed"
    h, w = arr.shape
    # TIFFSetField is varargs; pass ints (promoted) — tag then value
    LIBTIFF.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(TIFFTAG_IMAGEWIDTH), ctypes.c_uint32(w))
    LIBTIFF.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(TIFFTAG_IMAGELENGTH), ctypes.c_uint32(h))
    LIBTIFF.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(TIFFTAG_BITSPERSAMPLE), ctypes.c_int(8))
    LIBTIFF.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(TIFFTAG_SAMPLESPERPIXEL), ctypes.c_int(1))
    LIBTIFF.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(259), ctypes.c_int(1))  # COMPRESSION_NONE
    LIBTIFF.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(262), ctypes.c_int(1))  # PHOTOMETRIC_MINISBLACK
    LIBTIFF.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(284), ctypes.c_int(1))  # PLANARCONFIG_CONTIG
    LIBTIFF.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(278), ctypes.c_uint32(h))  # ROWSPERSTRIP
    row = np.ascontiguousarray(arr, dtype=np.uint8)
    LIBTIFF.TIFFWriteScanline.restype = ctypes.c_int
    LIBTIFF.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16,
    ]
    for y in range(h):
        assert LIBTIFF.TIFFWriteScanline(tif, row[y].ctypes.data_as(ctypes.c_void_p), y, 0) == 1
    LIBTIFF.TIFFClose(tif)
    return bytes(buf)


@tiff_oracle
def test_tiff_decoder_reads_real_libtiff_output():
    rng = np.random.default_rng(17)
    gray = rng.integers(0, 256, (12, 19), dtype=np.uint8)
    data = _libtiff_encode_gray8(gray)
    assert data[:2] in (b"II", b"MM")
    assert np.array_equal(tiff_decode(data), gray)
