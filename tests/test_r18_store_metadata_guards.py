"""r18 malformed-metadata probe of the store layer: negative/zero
geometry fields in .zarray / zarr.json parsed silently and fed
nonsense into the chunk-grid planner (or surfaced as reshape errors
deep inside a task); a v3 shard shape that is not a whole multiple of
its inner chunk shape silently truncated chunks_per_shard. All now
rejected at read_array_meta with the contract named.
"""

from __future__ import annotations

import pytest

from ngff_zarr_spark.sources.zarr_store import ZarrStore

GOOD_V2 = {
    "zarr_format": 2, "shape": [4, 4], "chunks": [2, 2], "dtype": "<f8",
    "compressor": None, "fill_value": 0, "order": "C", "filters": None,
    "dimension_separator": "/",
}


def _store_v2(tmp_path, meta):
    st = ZarrStore(str(tmp_path / "s"))
    st.put_json(".zgroup", {"zarr_format": 2})
    st.put_json("a/.zarray", meta)
    return st


@pytest.mark.parametrize(
    "field,value,msg",
    [
        ("shape", [-4, 4], "negative shape"),
        ("chunks", [-2, 2], "non-positive chunks"),
        ("chunks", [0, 2], "non-positive chunks"),
        ("chunks", [2], "shape rank"),
    ],
)
def test_v2_bad_geometry_rejected(tmp_path, field, value, msg):
    st = _store_v2(tmp_path, {**GOOD_V2, field: value})
    with pytest.raises(ValueError, match=msg):
        st.read_array_meta("a", 2)


def test_v2_good_geometry_still_parses(tmp_path):
    st = _store_v2(tmp_path, GOOD_V2)
    assert st.read_array_meta("a", 2).shape == (4, 4)


def test_v3_shard_must_divide_inner_chunks(tmp_path):
    st = ZarrStore(str(tmp_path / "s3"))
    st.put_json("zarr.json", {"zarr_format": 3, "node_type": "group"})
    doc = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [12, 12],
        "data_type": "float64",
        "chunk_grid": {
            "name": "regular", "configuration": {"chunk_shape": [6, 6]}
        },
        "chunk_key_encoding": {
            "name": "default", "configuration": {"separator": "/"}
        },
        "fill_value": 0,
        "codecs": [
            {
                "name": "sharding_indexed",
                "configuration": {
                    # 6 % 4 != 0: chunks_per_shard previously truncated
                    # to (1, 1) silently
                    "chunk_shape": [4, 4],
                    "codecs": [{"name": "bytes",
                                "configuration": {"endian": "little"}}],
                    "index_codecs": [
                        {"name": "bytes",
                         "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                },
            }
        ],
    }
    st.put_json("a/zarr.json", doc)
    with pytest.raises(ValueError, match="whole multiple"):
        st.read_array_meta("a", 3)


def test_v3_negative_shape_rejected(tmp_path):
    st = ZarrStore(str(tmp_path / "s3b"))
    st.put_json("zarr.json", {"zarr_format": 3, "node_type": "group"})
    st.put_json(
        "a/zarr.json",
        {
            "zarr_format": 3,
            "node_type": "array",
            "shape": [-8, 8],
            "data_type": "float64",
            "chunk_grid": {
                "name": "regular", "configuration": {"chunk_shape": [4, 4]}
            },
            "chunk_key_encoding": {
                "name": "default", "configuration": {"separator": "/"}
            },
            "fill_value": 0,
            "codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}}
            ],
        },
    )
    with pytest.raises(ValueError, match="negative shape"):
        st.read_array_meta("a", 3)
