"""Baseline JPEG codec (ingest/jpeg.py, public ITU-T T.81 subset):
encode/decode round-trips with quantization-bounded error, the
exact-round-trip property the driver gate relies on, subsampling,
restart markers, marker-level robustness, and the detect→cli route.
"""

import struct

import numpy as np
import pytest

from ngff_zarr_spark.ingest.jpeg import (
    STD_LUMA_QUANT,
    jpeg_decode,
    jpeg_encode,
)


def _gradient(h, w, a=2, b=1, off=40):
    yy, xx = np.indices((h, w))
    return np.clip(yy * a + xx * b + off, 0, 255).astype(np.uint8)


def test_block_constant_roundtrip_exact():
    """Per-8x8-block-constant + DC quant step 8 == EXACT round-trip:
    the property that gives the lossy codec a hash-exact driver
    oracle. Must hold for every possible uint8 value."""
    q = STD_LUMA_QUANT.copy()
    q[0, 0] = 8
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    out = jpeg_decode(jpeg_encode(img, luma_quant=q))
    np.testing.assert_array_equal(out, img)


def test_gray_gradient_bounded_error():
    img = _gradient(40, 56)
    out = jpeg_decode(jpeg_encode(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_gray_odd_dimensions():
    """Partial edge blocks (edge-replicated) decode to the right crop."""
    img = _gradient(37, 41)
    out = jpeg_decode(jpeg_encode(img))
    assert out.shape == (37, 41)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


@pytest.mark.parametrize("subsample", [True, False])
def test_rgb_roundtrip(subsample):
    """RGB through YCbCr with 4:2:0 and 4:4:4. Channels are constant
    per 16x16 block (so chroma subsampling averages constants and every
    luma/chroma 8x8 block is DC-only) and both quant tables use a DC
    step of 8 — the DC path is then integer-exact and the only residual
    error is the RGB↔YCbCr rounding, bounded by ±3."""
    q = STD_LUMA_QUANT.copy()
    q[0, 0] = 8
    by, bx = np.indices((3, 4))
    base = ((by * 37 + bx * 11) % 200 + 20).astype(np.uint8)
    mk = lambda b: np.repeat(np.repeat(b, 16, axis=0), 16, axis=1)
    rgb = np.stack([mk(base), mk(255 - base), mk(np.roll(base, 1, axis=0))], axis=-1)
    out = jpeg_decode(jpeg_encode(rgb, subsample=subsample, luma_quant=q, chroma_quant=q))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3


@pytest.mark.parametrize("shape", [(8, 8), (24, 24), (17, 24), (24, 9), (1, 1)])
def test_rgb_subsampled_non_mcu_aligned(shape):
    """4:2:0 RGB whose height/width mod 16 falls in 1..8: the last MCU's
    second luma block starts at or past the image edge. Regression — the
    per-block edge pad crashed on the resulting zero-size slice; planes
    are now MCU-aligned up front."""
    h, w = shape
    yy, xx = np.indices((h, w))
    rgb = np.stack(
        [
            ((yy * 7 + xx * 3) % 256).astype(np.uint8),
            ((yy * 2 + 100) % 256).astype(np.uint8),
            ((xx * 5 + 50) % 256).astype(np.uint8),
        ],
        axis=-1,
    )
    out = jpeg_decode(jpeg_encode(rgb, subsample=True))
    assert out.shape == rgb.shape
    # smooth-ish content through std tables: loosely bounded, no crash
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 60


def test_progressive_equals_baseline_gray():
    """jpeg_encode_progressive carries the SAME quantized coefficients
    as jpeg_encode through a multi-scan SOF2 stream (spectral selection
    + successive approximation, EOB runs) — decoding both must be
    bit-identical."""
    from ngff_zarr_spark.ingest.jpeg import jpeg_encode_progressive

    for shape in [(16, 16), (37, 41), (8, 8), (1, 1)]:
        img = _gradient(*shape)
        base = jpeg_decode(jpeg_encode(img))
        prog = jpeg_decode(jpeg_encode_progressive(img))
        np.testing.assert_array_equal(prog, base)


@pytest.mark.parametrize("subsample", [True, False])
def test_progressive_equals_baseline_rgb(subsample):
    from ngff_zarr_spark.ingest.jpeg import jpeg_encode_progressive

    yy, xx = np.indices((24, 17))
    rgb = np.stack(
        [
            ((yy * 7 + xx * 3) % 256).astype(np.uint8),
            ((yy * 2 + 100) % 256).astype(np.uint8),
            ((xx * 5 + 50) % 256).astype(np.uint8),
        ],
        axis=-1,
    )
    base = jpeg_decode(jpeg_encode(rgb, subsample=subsample))
    prog = jpeg_decode(jpeg_encode_progressive(rgb, subsample=subsample))
    np.testing.assert_array_equal(prog, base)


def test_progressive_sparse_and_flat_blocks():
    """Flat regions drive long EOB runs (incl. multi-block runs with
    buffered correction bits in refinement scans); a lone bright pixel
    drives high-frequency coefficients through every band."""
    from ngff_zarr_spark.ingest.jpeg import jpeg_encode_progressive

    img = np.full((48, 40), 128, np.uint8)
    img[5, 7] = 255
    img[30:38, 20:28] = 10
    base = jpeg_decode(jpeg_encode(img))
    prog = jpeg_decode(jpeg_encode_progressive(img))
    np.testing.assert_array_equal(prog, base)


def test_rgb_std_tables_bounded():
    """Standard Annex K tables on smooth colored content: error bounded
    by the (large) chroma DC quantization step, not exactness."""
    yy, xx = np.indices((32, 32))
    r = np.clip(yy * 3 + 30, 0, 255).astype(np.uint8)
    g = np.clip(xx * 3 + 30, 0, 255).astype(np.uint8)
    b = np.clip(yy + xx + 60, 0, 255).astype(np.uint8)
    rgb = np.stack([r, g, b], axis=-1)
    out = jpeg_decode(jpeg_encode(rgb))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 40


def test_decode_rejects_non_jpeg_and_malformed():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG\r\n\x1a\nnope")
    # a baseline stream whose SOF0 marker is flipped to SOF2 routes to
    # the progressive parser (r8), which rejects the baseline scan
    # header as a malformed progressive scan (Ss=0, Se=63 mixes bands)
    data = bytearray(jpeg_encode(_gradient(16, 16)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        jpeg_decode(bytes(data))
    # lossless (SOF3) stays out of scope
    data[idx + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF0/1.*SOF2|progressive"):
        jpeg_decode(bytes(data))


def test_decode_with_restart_markers():
    """Real DRI/RSTn round-trip: every restart interval resets the DC
    predictor and bit alignment on both sides; the decoded image must
    equal the no-restart encoding of the same pixels. Also covers >8
    restarts (RSTn cycles modulo 8) and a DRI=0 'no restarts' segment."""
    img = _gradient(40, 48)  # 5x6 = 30 MCUs
    plain = jpeg_decode(jpeg_encode(img))
    for interval in (1, 3, 7):
        with_rst = jpeg_decode(jpeg_encode(img, restart_interval=interval))
        np.testing.assert_array_equal(with_rst, plain)
    # 4:2:0 RGB with restarts (MCU = 16x16)
    rgb = np.stack([_gradient(32, 32)] * 3, axis=-1)
    np.testing.assert_array_equal(
        jpeg_decode(jpeg_encode(rgb, restart_interval=2)),
        jpeg_decode(jpeg_encode(rgb)),
    )
    # DRI=0 declares no restarts — decoder must just carry on
    data = bytearray(jpeg_encode(_gradient(16, 16)))
    idx = bytes(data).find(b"\xff\xda")
    data[idx:idx] = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 0)
    assert jpeg_decode(bytes(data)).shape == (16, 16)


def test_decode_skips_appn_and_comment():
    data = bytearray(jpeg_encode(_gradient(16, 16)))
    com = b"\xff\xfe" + struct.pack(">H", 2 + 11) + b"hello jpeg!"
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + 6) + b"Exif\x00\x00"
    idx = bytes(data).find(b"\xff\xdb")
    data[idx:idx] = com + app1
    out = jpeg_decode(bytes(data))
    np.testing.assert_array_equal(out, jpeg_decode(jpeg_encode(_gradient(16, 16))))


def test_detect_and_cli_route(spark, tmp_path):
    """S12 detect routes .jpg to the itk-wasm backend; the cli shim
    decodes it natively (magic-byte dispatch) into an NgffImage."""
    from ngff_zarr_spark.ingest import (
        ConversionBackend,
        cli_input_to_ngff_image,
        detect_cli_io_backend,
    )

    q = STD_LUMA_QUANT.copy()
    q[0, 0] = 8
    blocks = (np.arange(12, dtype=np.uint8).reshape(3, 4) * 17 + 5)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    p = tmp_path / "x.jpg"
    p.write_bytes(jpeg_encode(img, luma_quant=q))
    backend = detect_cli_io_backend([str(p)])
    assert backend == ConversionBackend.ITKWASM
    ngff = cli_input_to_ngff_image(spark, backend, [str(p)])
    assert ngff.dtype == "uint8"
    assert ngff.shape == {"y": 24, "x": 32}
    got = {(r.y, r.x): int(r.v) for r in ngff.data.collect()}
    for (y, x), v in got.items():
        assert v == int(img[y, x])


def test_imageio_fallback_magic_dispatch(spark, tmp_path):
    """A .unknown extension falls to the IMAGEIO backend; the decoder is
    picked from the magic bytes, so a JPEG body still decodes."""
    from ngff_zarr_spark.ingest import (
        ConversionBackend,
        cli_input_to_ngff_image,
        detect_cli_io_backend,
    )

    img = _gradient(16, 24)
    p = tmp_path / "mystery.rawimg"
    p.write_bytes(jpeg_encode(img))
    backend = detect_cli_io_backend([str(p)])
    assert backend == ConversionBackend.IMAGEIO
    ngff = cli_input_to_ngff_image(spark, backend, [str(p)])
    assert ngff.shape == {"y": 16, "x": 24}
