"""Minimal RIFF/WAVE PCM codec (stdlib struct only) for CLI ingest
breadth (S11) and real-container audio payloads.

The reference's CLI routes every unknown extension through its imageio
fallback (detect_cli_io_backend.py:124-128); in a bare environment this
decodes the canonical-layout WAV natively: RIFF/WAVE container, ``fmt``
chunk with WAVE_FORMAT_PCM (1) or WAVE_FORMAT_EXTENSIBLE (0xFFFE)
wrapping PCM, 8/16/32-bit integer samples, any channel count, chunks
walked in order with odd sizes padded to even per the RIFF spec.
Unknown chunks (LIST/INFO, fact, cue) are skipped, so files from
mainstream encoders parse as long as the sample data is integer PCM.
"""

from __future__ import annotations

import struct

import numpy as np

# WAVE format tags
_PCM = 0x0001
_EXTENSIBLE = 0xFFFE

_DTYPES = {8: np.dtype("u1"), 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode ``samples`` — shape (n,) mono or (n, channels) — of dtype
    uint8 / int16 / int32 as a canonical 44-byte-header PCM WAV
    (RIFF → fmt(16) → data, interleaved frames, little-endian)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"unsupported WAV array shape {samples.shape}")
    kind_bits = {np.dtype("u1"): 8, np.dtype("i2"): 16, np.dtype("i4"): 32}
    bits = kind_bits.get(np.dtype(samples.dtype.str.lstrip("<>=|")))
    if bits is None:
        raise ValueError(f"unsupported WAV dtype {samples.dtype} (uint8/int16/int32)")
    n, ch = samples.shape
    block_align = ch * bits // 8
    byte_rate = sample_rate * block_align
    data = np.ascontiguousarray(samples.astype(_DTYPES[bits])).tobytes()
    out = bytearray()
    out += struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    out += struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, _PCM, ch, sample_rate, byte_rate,
        block_align, bits,
    )
    out += struct.pack("<4sI", b"data", len(data))
    out += data
    if len(data) % 2:  # RIFF chunks pad to even length
        out += b"\x00"
    return bytes(out)


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to (samples, sample_rate): samples is (n,)
    int16/int32/uint8 for mono, (n, channels) otherwise."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE magic)")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid, csize = struct.unpack_from("<4sI", data, pos)
        pos += 8
        body = data[pos : pos + csize]
        if cid == b"fmt ":
            tag, ch, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag == _EXTENSIBLE:
                # valid-bits + channel mask + GUID; first 2 GUID bytes
                # carry the wrapped format tag
                if csize < 40:
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
                tag = struct.unpack_from("<H", body, 24)[0]
            if tag != _PCM:
                raise ValueError(f"unsupported WAV format tag 0x{tag:04x} (PCM only)")
            if bits not in _DTYPES:
                raise ValueError(f"unsupported WAV bit depth {bits}")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            payload = body
            if fmt is not None:
                break  # canonical layout: fmt precedes data
        pos += csize + (csize & 1)  # odd chunk sizes pad to even
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    ch, rate, bits = fmt
    dt = _DTYPES[bits]
    n_frames = len(payload) // (ch * dt.itemsize)
    arr = np.frombuffer(payload, dtype=dt, count=n_frames * ch)
    if ch > 1:
        arr = arr.reshape(n_frames, ch)
    return np.ascontiguousarray(arr), rate


def wav_to_ngff_image(spark, path: str):
    """WAV → NgffImage: samples land on the x axis (mono: dims [x];
    multichannel: [c, x] with channels first, matching the pixel
    table's c-before-x ordering)."""
    from ..model import to_ngff_image
    from .nifti import array_to_pixel_df

    samples, _rate = wav_decode(open(path, "rb").read())
    if samples.ndim == 1:
        dims = ["x"]
        arr = samples
    else:
        dims = ["c", "x"]
        arr = np.ascontiguousarray(samples.T)
    df = array_to_pixel_df(spark, arr, dims)
    img = to_ngff_image(
        df, dims=dims, shape={d: int(s) for d, s in zip(dims, arr.shape)}
    )
    img.dtype = arr.dtype.name
    return img
