"""r17 store-layer self-review fixes (zarr_store.py), each reproduced
by the review and pinned here.

Read-side tolerance for spec-legal stores this engine never writes:
big-endian v2 dtypes / v3 bytes-codec endian, v2 F-order; loud refusal
where decoding would corrupt: unknown v3 data codecs, v2 filters,
writes to big-endian/F-order stores. Plus: separator probe survives a
store whose exists() raises; v3 root rewrite preserves inline
consolidated metadata; single-round-trip chunk reads; spec-string
encoding of non-finite fill values.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pytest

from ngff_zarr_spark.sources.zarr_store import (
    ZarrArrayMeta,
    ZarrStore,
    decode_chunk,
    encode_chunk,
)


def _v2_store(tmp_path, dtype_s, raw, order="C", filters=None, shape=(2, 3)):
    st = ZarrStore(tmp_path / "s")
    st.put_json(".zgroup", {"zarr_format": 2})
    st.put_json(
        "a/.zarray",
        {
            "zarr_format": 2,
            "shape": list(shape),
            "chunks": list(shape),
            "dtype": dtype_s,
            "compressor": None,
            "fill_value": 0,
            "order": order,
            "filters": filters,
            "dimension_separator": "/",
        },
    )
    if raw is not None:
        st.put("a/0/0", raw)
    return st


def test_v2_big_endian_read(tmp_path):
    vals = np.arange(6, dtype=">u2").reshape(2, 3)
    st = _v2_store(tmp_path, ">u2", vals.tobytes())
    meta = st.read_array_meta("a", 2)
    assert meta.byte_order == ">"
    got = st.read_chunk(meta, (0, 0))
    assert got.dtype == np.dtype("uint16").newbyteorder("=")
    np.testing.assert_array_equal(got, np.arange(6).reshape(2, 3))


def test_v2_fortran_order_read(tmp_path):
    arr = np.arange(6, dtype="<u2").reshape(2, 3)
    st = _v2_store(tmp_path, "<u2", arr.tobytes(order="F"), order="F")
    meta = st.read_array_meta("a", 2)
    assert meta.order == "F"
    got = st.read_chunk(meta, (0, 0))
    np.testing.assert_array_equal(got, arr)
    assert got.flags["C_CONTIGUOUS"]  # downstream code assumes C layout


def test_v2_filters_refused(tmp_path):
    st = _v2_store(
        tmp_path, "<u1", None, filters=[{"id": "delta", "dtype": "<u1"}],
        shape=(4,),
    )
    with pytest.raises(NotImplementedError, match="filters"):
        st.read_array_meta("a", 2)


def _v3_store(tmp_path, codecs, raw, shape=(2, 3), dtype="uint16"):
    st = ZarrStore(tmp_path / "s3")
    st.put_json("zarr.json", {"zarr_format": 3, "node_type": "group", "attributes": {}})
    st.put_json(
        "a/zarr.json",
        {
            "zarr_format": 3,
            "node_type": "array",
            "shape": list(shape),
            "data_type": dtype,
            "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": list(shape)}},
            "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
            "fill_value": 0,
            "codecs": codecs,
        },
    )
    if raw is not None:
        st.put("a/c/0/0", raw)
    return st


def test_v3_big_endian_bytes_codec(tmp_path):
    vals = np.arange(6, dtype=">u2").reshape(2, 3)
    st = _v3_store(
        tmp_path,
        [{"name": "bytes", "configuration": {"endian": "big"}}],
        vals.tobytes(),
    )
    meta = st.read_array_meta("a", 3)
    assert meta.byte_order == ">"
    np.testing.assert_array_equal(
        st.read_chunk(meta, (0, 0)), np.arange(6).reshape(2, 3)
    )


def test_v3_unknown_codec_refused(tmp_path):
    st = _v3_store(
        tmp_path,
        [
            {"name": "transpose", "configuration": {"order": [1, 0]}},
            {"name": "bytes", "configuration": {"endian": "little"}},
        ],
        b"",
    )
    with pytest.raises(ValueError, match="transpose"):
        st.read_array_meta("a", 3)


def test_write_to_foreign_layout_refused(tmp_path):
    vals = np.arange(6, dtype=">u2").reshape(2, 3)
    st = _v2_store(tmp_path, ">u2", vals.tobytes())
    meta = st.read_array_meta("a", 2)
    with pytest.raises(NotImplementedError, match="big-endian"):
        st.write_chunk(meta, (0, 0), np.zeros((2, 3), dtype="u2"))


def test_probe_separator_survives_raising_exists(tmp_path):
    """A store whose exists() raises (S3 403 without ListBucket through
    HttpStore) must not turn a readable v2 array into an open error —
    the probe is best-effort."""
    st = _v2_store(tmp_path, "<u2", np.zeros(6, dtype="<u2").tobytes())

    class _NoExists(ZarrStore):
        def exists(self, key):
            raise RuntimeError("403 Forbidden")

    st2 = _NoExists(st.root)
    meta = st2.read_array_meta("a", 2)
    assert meta.dimension_separator == "/"  # declared value trusted


def test_v3_root_rewrite_preserves_consolidation(tmp_path):
    st = _v3_store(
        tmp_path,
        [{"name": "bytes", "configuration": {"endian": "little"}}],
        np.zeros(6, dtype="<u2").tobytes(),
    )
    st.consolidate_metadata_v3()
    before = json.loads(st.get("zarr.json"))
    assert "a" in before["consolidated_metadata"]["metadata"]
    # plate-attrs style root rewrite (hcs.to_hcs_zarr shape)
    st.write_group("", {"plate": {"name": "p1"}}, 3)
    after = json.loads(st.get("zarr.json"))
    assert after["attributes"] == {"plate": {"name": "p1"}}
    assert after["consolidated_metadata"] == before["consolidated_metadata"]


class _CountingStore(ZarrStore):
    def __init__(self, root):
        super().__init__(root)
        self.calls = []

    def get(self, key):
        self.calls.append(("get", key))
        return super().get(key)

    def exists(self, key):
        self.calls.append(("exists", key))
        return super().exists(key)


def test_read_chunk_single_round_trip(tmp_path):
    """Present chunk: exactly one byte op (no exists() probe); missing
    chunk: one attempted read then the fill path."""
    vals = np.arange(6, dtype="<u2").reshape(2, 3)
    base = _v2_store(tmp_path, "<u2", vals.tobytes())
    st = _CountingStore(base.root)
    meta = st.read_array_meta("a", 2)
    st.calls.clear()
    np.testing.assert_array_equal(st.read_chunk(meta, (0, 0)), vals)
    assert st.calls == [("get", "a/0/0")]
    st.calls.clear()
    missing = ZarrArrayMeta(**{**meta.__dict__, "shape": (4, 3)})
    got = st.read_chunk(missing, (1, 0))
    assert (got == 0).all()
    assert st.calls == [("get", "a/1/0")]  # one attempt, no HEAD/exists


def test_nonfinite_fill_value_spec_strings(tmp_path):
    meta = ZarrArrayMeta(
        path="a", shape=(2,), chunks=(2,), dtype=np.dtype("float32"),
        fill_value=float("nan"),
    )
    v2, v3 = meta.to_v2_json(), meta.to_v3_json()
    assert v2["fill_value"] == "NaN" and v3["fill_value"] == "NaN"
    # strict JSON round-trips (json.dumps with allow_nan=False would
    # previously have raised / emitted the invalid bare NaN literal)
    json.loads(json.dumps(v2, allow_nan=False))
    st = ZarrStore(tmp_path / "s")
    st.put_json(".zgroup", {"zarr_format": 2})
    st.put_json("a/.zarray", v2)
    back = st.read_array_meta("a", 2)
    assert isinstance(back.fill_value, float) and math.isnan(back.fill_value)
    inf = ZarrArrayMeta(
        path="a", shape=(2,), chunks=(2,), dtype=np.dtype("float32"),
        fill_value=float("-inf"),
    )
    assert inf.to_v3_json()["fill_value"] == "-Infinity"


def test_decode_chunk_roundtrip_unchanged():
    """The default little-endian C path is byte-identical to before."""
    arr = np.arange(24, dtype="<i4").reshape(2, 3, 4)
    data = encode_chunk(arr, "gzip")
    np.testing.assert_array_equal(
        decode_chunk(data, arr.dtype, arr.shape, "gzip"), arr
    )
