"""Native GIF codec (ingest/gif.py) + S11/S13 wiring.

Reference parity: .gif routes through the imageio fallback backend
(detect_cli_io_backend.py:124-128); here the decode is native LZW.
"""

import numpy as np
import pytest

from ngff_zarr_spark.ingest.gif import gif_decode, gif_encode

# the widely-published smallest valid GIF: 1x1, 2-entry palette,
# transparent pixel over background index 0 (spec vector, not ours)
MIN_GIF = bytes.fromhex(
    "474946383961010001008000000000" "00ffffff21f90401000000002c000000"
    "00010001000002024401003b"
)


def test_spec_vector_1x1():
    out = gif_decode(MIN_GIF)
    # transparent pixel -> background color (palette 0 = black)
    assert out.shape == (1, 1)
    assert out.dtype == np.uint8
    assert out[0, 0] == 0


def test_gray_roundtrip():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    assert np.array_equal(gif_decode(gif_encode(a)), a)


def test_interlaced_roundtrip():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    assert np.array_equal(gif_decode(gif_encode(a, interlace=True)), a)


def test_rgb_roundtrip():
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (17, 3), dtype=np.uint8)
    rgb = pal[rng.integers(0, 17, (25, 31))]
    out = gif_decode(gif_encode(rgb))
    assert out.shape == (25, 31, 3) and np.array_equal(out, rgb)


def test_animation_roundtrips():
    rng = np.random.default_rng(10)
    gray = rng.integers(0, 256, (4, 19, 23), dtype=np.uint8)
    out = gif_decode(gif_encode(gray))
    assert out.shape == (4, 19, 23) and np.array_equal(out, gray)
    pal = rng.integers(0, 256, (11, 3), dtype=np.uint8)
    rgb = pal[rng.integers(0, 11, (3, 12, 14))]
    out = gif_decode(gif_encode(rgb))
    assert out.shape == (3, 12, 14, 3) and np.array_equal(out, rgb)


def test_lzw_dictionary_reset():
    # >4096 distinct phrases forces the encoder's clear-code reset
    rng = np.random.default_rng(11)
    big = rng.integers(0, 256, (200, 300), dtype=np.uint8)
    assert np.array_equal(gif_decode(gif_encode(big)), big)


def test_palette_overflow_raises():
    rng = np.random.default_rng(12)
    rgb = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="palette overflow"):
        gif_encode(rgb)


def test_not_a_gif_raises():
    with pytest.raises(ValueError, match="magic"):
        gif_decode(b"NOTGIF" + b"\x00" * 32)


def test_series_scan_decodes_gif(spark, tmp_path):
    from pyspark.sql import functions as F

    from ngff_zarr_spark.ingest.series import series_to_pixel_df

    nz, h, w = 3, 9, 11
    yi, xi = np.indices((h, w))
    for z in range(nz):
        arr = ((z * 73 + yi * 179 + xi * 283) % 251).astype(np.uint8)
        (tmp_path / f"slice_{z:02d}.gif").write_bytes(gif_encode(arr))
    df = series_to_pixel_df(spark, str(tmp_path / "slice_*.gif"))
    rows = df.groupBy().agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    zi2, yi2, xi2 = np.indices((nz, h, w))
    expect = ((zi2 * 73 + yi2 * 179 + xi2 * 283) % 251).sum()
    assert rows["n"] == nz * h * w and int(rows["s"]) == int(expect)


def test_cli_single_animated_gif(spark, tmp_path):
    from ngff_zarr_spark.ingest import (
        ConversionBackend,
        cli_input_to_ngff_image,
        detect_cli_io_backend,
    )

    nt, h, w = 2, 7, 9
    ti, yi, xi = np.indices((nt, h, w))
    arr = ((ti * 73 + yi * 179 + xi * 283) % 251).astype(np.uint8)
    p = tmp_path / "anim.gif"
    p.write_bytes(gif_encode(arr))
    backend = detect_cli_io_backend([str(p)])
    assert backend == ConversionBackend.IMAGEIO
    img = cli_input_to_ngff_image(spark, backend, [str(p)])
    assert img.dims == ["t", "y", "x"] and img.dtype == "uint8"
    got = img.data.orderBy("t", "y", "x").toPandas()["v"].to_numpy()
    assert np.array_equal(got.astype(np.int64), arr.ravel().astype(np.int64))


def test_gif_gate_matches_oracle(spark):
    import duckdb

    from ngff_zarr_spark import gate, oracle

    df = gate.queries()["s11_gif_ingest"](spark, "/root/testdata/sf0.001")
    got = df.orderBy("t", "y", "x").toPandas()
    exp = duckdb.sql(
        oracle.oracles()["s11_gif_ingest"] + " ORDER BY t, y, x"
    ).df()
    assert (got["v"].to_numpy() == exp["v"].to_numpy()).all()
    assert len(got) == len(exp)


def test_width3_gray_stack_frames_flag():
    # ADVICE r8: a (n, h, 3) grayscale stack is shape-ambiguous with a
    # single (h, w, 3) RGB image. frames=True forces the animation
    # reading; the default stays RGB.
    rng = np.random.default_rng(9)
    stack = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    out = gif_decode(gif_encode(stack, frames=True))
    assert out.shape == (5, 7, 3)
    assert np.array_equal(out, stack)
    # default reading: one RGB image (needs <=256 colors to encode)
    rgb = np.zeros((5, 7, 3), dtype=np.uint8)
    rgb[..., 0] = np.arange(7, dtype=np.uint8)
    out2 = gif_decode(gif_encode(rgb))
    assert out2.shape == (5, 7, 3)
    assert np.array_equal(out2, rgb)


def test_frames_false_requires_rgb():
    with pytest.raises(ValueError, match="frames=False"):
        gif_encode(np.zeros((4, 4, 2), dtype=np.uint8), frames=False)
    with pytest.raises(ValueError, match="frames=True"):
        gif_encode(np.zeros((4, 4), dtype=np.uint8), frames=True)


def test_malformed_frame_out_of_bounds():
    # craft a GIF whose image descriptor extends past the 1x1 screen
    bad = bytearray(MIN_GIF)
    # image descriptor at the 2c block: left=0, top=0, w, h
    i = bad.index(0x2C)
    bad[i + 5] = 2  # w = 2 > screen w = 1
    with pytest.raises(ValueError, match="exceeds"):
        gif_decode(bytes(bad))


def test_truncated_lzw_stream():
    # truncate the LZW payload at a sub-block boundary so the stream
    # is structurally valid but ends before w*h pixels are decoded
    rng = np.random.default_rng(10)
    a = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    enc = bytes(gif_encode(a))
    i = 6 + 7 + 768  # header + LSD + 256-entry GCT -> image descriptor
    assert enc[i] == 0x2C
    lzw_start = i + 11  # 0x2C + descriptor (9) + min_code_size (1)
    # walk sub-blocks, keep only the first half of the first block
    n = enc[lzw_start]
    assert n > 4
    keep = n // 2
    bad = (
        enc[:lzw_start]
        + bytes([keep])
        + enc[lzw_start + 1 : lzw_start + 1 + keep]
        + bytes([0x00, 0x3B])
    )
    with pytest.raises(ValueError, match="ended"):
        gif_decode(bad)
