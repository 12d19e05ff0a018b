"""r18 decoder-robustness review: malformed-input behavior of the
native binary parsers (the ingest battery only ever feeds them
well-formed fixtures).

Findings from a truncation + bit-flip fuzz over every encoder/decoder
pair, fixed and pinned here:

1. TIFF: a bit-flipped ImageLength (e.g. 2^28 with one 16-row strip)
   decoded "successfully" into a gigabytes-of-zeros image — the strip/
   tile tables must cover the declared geometry exactly, and declared
   pixel volume is capped at 10^5× the page's stored segment bytes.
2. PNG: a bit-flipped IHDR dimension drove a multi-gigabyte unfilter
   allocation (MemoryError) — every PNG row is exactly 1 filter byte +
   stride bytes, so the decompressed length is checked exactly before
   any h-sized allocation.

A deterministic mini-fuzz (truncations + seeded bit flips) runs in CI
per format: decoders must either return or raise a regular exception
within an alarm budget — never hang, never MemoryError.
"""

from __future__ import annotations

import signal

import numpy as np
import pytest

from ngff_zarr_spark.ingest.png import png_decode, png_encode
from ngff_zarr_spark.ingest.tiff import tiff_decode, tiff_encode, tiff_encode_pages

IMG8 = (np.arange(24 * 17, dtype=np.uint8).reshape(24, 17) * 3) % 251
IMG16 = (np.arange(24 * 17, dtype=np.uint16).reshape(24, 17) * 997) % 60013
RGB = np.stack([IMG8, IMG8 // 2, 255 - IMG8], axis=-1).astype(np.uint8)


def _flip(data: bytes, off: int, xor: int) -> bytes:
    b = bytearray(data)
    b[off] ^= xor
    return bytes(b)


def test_tiff_inflated_length_rejected():
    """The exact r18 fuzz reproducer: byte 33 is ImageLength's third
    byte in this layout; ^16 declares h=268M rows against a one-strip
    table. Previously returned a 3.2 GB mostly-zeros array."""
    data = tiff_encode(IMG8[:16, :12])
    corrupt = _flip(data, 33, 16)
    with pytest.raises(ValueError, match="strip table mismatch|implausible"):
        tiff_decode(corrupt)


def test_tiff_strip_table_must_cover_geometry():
    # well-formed multi-strip file still decodes
    data = tiff_encode_pages([IMG8], rows_per_strip=5)
    assert np.array_equal(tiff_decode(data), IMG8)


def test_tiff_tiled_still_green():
    data = tiff_encode_pages([IMG8], tile=(8, 8))
    assert np.array_equal(tiff_decode(data), IMG8)


def test_png_dimension_corruption_rejected():
    """IHDR width/height live at bytes 16-23; flipping a high bit
    previously MemoryErrored in the unfilter allocation."""
    data = png_encode(RGB)
    for off in (16, 17, 20, 21):
        for xor in (0x10, 0x80):
            corrupt = _flip(data, off, xor)
            with pytest.raises(Exception) as exc:
                png_decode(corrupt)
            assert not isinstance(exc.value, MemoryError)


def test_png_exact_row_length_check():
    data = png_encode(IMG8)
    # height+1 declared: decompressed stream no longer matches h*(stride+1)
    corrupt = bytearray(data)
    corrupt[23] ^= 1  # low byte of IHDR height
    with pytest.raises(ValueError, match="pixel data length"):
        png_decode(bytes(corrupt))


def _all_variants():
    from ngff_zarr_spark.ingest.bmp import bmp_decode, bmp_encode
    from ngff_zarr_spark.ingest.dicom import dicom_read, dicom_write
    from ngff_zarr_spark.ingest.gif import gif_decode, gif_encode
    from ngff_zarr_spark.ingest.mgh import mgh_decode, mgh_encode
    from ngff_zarr_spark.ingest.mha import mha_read, mha_write
    from ngff_zarr_spark.ingest.mrc import mrc_decode, mrc_encode
    from ngff_zarr_spark.ingest.nrrd import nrrd_read, nrrd_write
    from ngff_zarr_spark.ingest.wav import wav_decode, wav_encode
    from ngff_zarr_spark.ingest.webp import webp_decode, webp_encode

    import gzip

    from ngff_zarr_spark.ingest.nifti import parse_nifti_bytes, write_nifti

    def _nifti_bytes(version: int) -> bytes:
        import tempfile
        from pathlib import Path

        with tempfile.TemporaryDirectory() as td:
            p = Path(td) / "v.nii"
            write_nifti(p, vol, version=version)
            return p.read_bytes()

    vol = ((np.arange(6 * 8 * 10, dtype=np.int32).reshape(6, 8, 10) * 997)
           % 30011).astype(np.int16)
    return [
        ("tiff8", tiff_encode(IMG8), tiff_decode),
        ("tiff16", tiff_encode(IMG16), tiff_decode),
        ("tiff-lzw", tiff_encode_pages([IMG16], compression=5, predictor=2), tiff_decode),
        ("tiff-tiled", tiff_encode_pages([IMG8], tile=(8, 8)), tiff_decode),
        ("png8", png_encode(IMG8), png_decode),
        ("png-rgb", png_encode(RGB), png_decode),
        ("bmp", bmp_encode(IMG8), bmp_decode),
        ("bmp-rgb", bmp_encode(RGB), bmp_decode),
        ("gif", gif_encode(IMG8), gif_decode),
        ("webp", webp_encode(RGB), webp_decode),
        ("wav", wav_encode(np.arange(2000, dtype=np.int16)),
         lambda d: wav_decode(d)[0]),
        ("mgh", mgh_encode(vol), mgh_decode),
        ("mrc", mrc_encode(vol), mrc_decode),
        ("nrrd-gz", nrrd_write(vol), lambda d: nrrd_read(d)[0]),
        ("nrrd-raw", nrrd_write(vol, encoding="raw"), lambda d: nrrd_read(d)[0]),
        ("mha", mha_write(vol), lambda d: mha_read(d)[0]),
        ("dicom", dicom_write(vol[0].astype(np.uint16)),
         lambda d: dicom_read(d)[0]),
        ("nifti1", _nifti_bytes(1), lambda d: parse_nifti_bytes(d).data),
        ("nifti2", _nifti_bytes(2), lambda d: parse_nifti_bytes(d).data),
        ("nifti1-gz", gzip.compress(_nifti_bytes(1)),
         lambda d: parse_nifti_bytes(d).data),
    ]


@pytest.mark.parametrize(
    "name,data,dec", _all_variants(), ids=lambda v: v if isinstance(v, str) else ""
)
def test_mini_fuzz_never_hangs_or_memerrors(name, data, dec):
    """Deterministic truncations + seeded bit flips: a regular
    exception or a successful decode within the alarm budget, never a
    hang and never a MemoryError."""

    class Hang(Exception):
        pass

    def onalarm(sig, frm):
        raise Hang()

    old = signal.signal(signal.SIGALRM, onalarm)
    rng = np.random.default_rng(13)
    n = len(data)
    try:
        offsets = list(range(0, n, max(1, n // 60)))
        for cut in offsets:
            signal.alarm(8)
            try:
                dec(data[:cut])
            except (Hang, MemoryError) as exc:
                raise AssertionError(
                    f"{name}: {type(exc).__name__} at truncation {cut}"
                ) from exc
            except Exception:
                pass
            finally:
                signal.alarm(0)
        for _ in range(150):
            i = int(rng.integers(0, n))
            signal.alarm(8)
            try:
                dec(_flip(data, i, int(rng.integers(1, 256))))
            except (Hang, MemoryError) as exc:
                raise AssertionError(
                    f"{name}: {type(exc).__name__} at flip {i}"
                ) from exc
            except Exception:
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.mark.parametrize("codec", ["lz4", "zstd", "zlib", "snappy"])
@pytest.mark.parametrize("shuffle", [0, 1])
def test_blosc_mini_fuzz(codec, shuffle):
    """Same discipline one layer down: the pure-Python Blosc codec must
    fail cleanly on corrupt frames (r18 sweep: 800 flips + full
    truncations per variant, zero hangs/MemoryErrors)."""
    from ngff_zarr_spark.sources.blosc import blosc_compress, blosc_decompress

    class Hang(Exception):
        pass

    def onalarm(sig, frm):
        raise Hang()

    payload = (np.arange(4096, dtype=np.uint16) * 997 % 60013).tobytes()
    data = blosc_compress(payload, cname=codec, shuffle=shuffle, typesize=2)
    assert blosc_decompress(data) == payload
    old = signal.signal(signal.SIGALRM, onalarm)
    rng = np.random.default_rng(31)
    n = len(data)
    try:
        for cut in range(0, n, max(1, n // 40)):
            signal.alarm(8)
            try:
                blosc_decompress(data[:cut])
            except (Hang, MemoryError) as exc:
                raise AssertionError(f"trunc {cut}: {type(exc).__name__}") from exc
            except Exception:
                pass
            finally:
                signal.alarm(0)
        for _ in range(120):
            i = int(rng.integers(0, n))
            signal.alarm(8)
            try:
                blosc_decompress(_flip(data, i, int(rng.integers(1, 256))))
            except (Hang, MemoryError) as exc:
                raise AssertionError(f"flip {i}: {type(exc).__name__}") from exc
            except Exception:
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
