"""r17 DataSource (sources/ome_zarr.py) self-review fixes, pinned.

- rank > 5 refuses instead of silently reading all-fill
- foreign axis names fall back POSITIONALLY instead of zero-filling
  every coordinate (which collapsed all rows onto one key)
- NULL pixel values write as fill_value, never NaN→int garbage
- complex/plain v-column vs target-dtype mismatch raises a clear error
- schema() surfaces transient store errors (only genuinely-absent
  arrays fall back to the write-target default schema)
- one metadata fetch per load (schema + reader share it)
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import ngff_zarr_spark.sources.ome_zarr as oz
from ngff_zarr_spark.ome_zarr_api import write_image
from ngff_zarr_spark.sources.zarr_store import ZarrStore


def test_axis_map_rank_guard_and_foreign_names():
    assert oz._axis_map(None, 3) == ["z", "y", "x"]
    assert oz._axis_map(["c", "y", "x"], 3) == ["c", "y", "x"]
    # foreign names → positional fallback, never zero-fill
    assert oz._axis_map(["time", "lat", "lon"], 3) == ["z", "y", "x"]
    # duplicate names cannot key distinct columns → positional
    assert oz._axis_map(["x", "x"], 2) == ["y", "x"]
    with pytest.raises(ValueError, match="rank 6"):
        oz._axis_map(None, 6)


def test_foreign_dim_names_store_reads_distinct_coords(spark, tmp_path):
    """An xarray-style store with _ARRAY_DIMENSIONS=["time","lat","lon"]
    must read with distinct (z,y,x) coordinates — pre-fix every row got
    (0,0,0,0,0) and the pixels collapsed."""
    arr = np.arange(8, dtype="<f8").reshape(2, 2, 2)
    st = ZarrStore(tmp_path / "s")
    st.put_json(".zgroup", {"zarr_format": 2})
    st.put_json(
        "a/.zarray",
        {
            "zarr_format": 2, "shape": [2, 2, 2], "chunks": [2, 2, 2],
            "dtype": "<f8", "compressor": None, "fill_value": 0,
            "order": "C", "filters": None, "dimension_separator": "/",
        },
    )
    st.put_json("a/.zattrs", {"_ARRAY_DIMENSIONS": ["time", "lat", "lon"]})
    st.put("a/0/0/0", arr.tobytes())
    oz.register(spark)
    df = (
        spark.read.format("ome_zarr")
        .option("path", str(tmp_path / "s"))
        .option("array_path", "a")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 8
    coords = {(r.z, r.y, r.x) for r in rows}
    assert len(coords) == 8  # distinct, not collapsed
    by_coord = {(r.z, r.y, r.x): r.v for r in rows}
    assert by_coord[(1, 0, 1)] == arr[1, 0, 1]


def test_null_pixel_writes_fill_value(spark, tmp_path):
    path = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(0, 0, 0, 0, 0, 7.0), (0, 0, 0, 0, 1, None), (0, 0, 0, 1, 0, 3.0),
         (0, 0, 0, 1, 1, 9.0)],
        "t long, c long, z long, y long, x long, v double",
    )
    write_image(
        df, path, "scale0/image", {"y": 2, "x": 2}, ["y", "x"],
        {"y": 2, "x": 2}, dtype="uint16", compressor=None,
    )
    st = ZarrStore(path)
    meta = st.read_array_meta("scale0/image", 2)
    got = st.read_chunk(meta, (0, 0))
    np.testing.assert_array_equal(got, np.array([[7, 0], [3, 9]], dtype="u2"))


def test_complex_target_plain_column_clear_error(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 0, 0, 0, 0, 1.0)],
        "t long, c long, z long, y long, x long, v double",
    )
    with pytest.raises(Exception, match="struct<re,im>"):
        write_image(
            df, str(tmp_path / "bad"), "scale0/image", {"y": 1, "x": 1},
            ["y", "x"], {"y": 1, "x": 1}, dtype="complex64", compressor=None,
        )


def test_schema_surfaces_transient_store_errors(monkeypatch):
    """Only a genuinely-missing array falls back to PIXEL_SCHEMA; a
    transient store failure must raise at planning time instead of
    declaring the wrong schema and failing every task."""
    ds_missing = oz.OmeZarrDataSource({"path": "/nonexistent/store"})
    assert ds_missing.schema() == oz.PIXEL_SCHEMA

    def boom(path, so=None):
        raise RuntimeError("503 after retries")

    monkeypatch.setattr(oz, "open_store", boom)
    ds = oz.OmeZarrDataSource({"path": "/x"})
    with pytest.raises(RuntimeError, match="503"):
        ds.schema()


def test_one_metadata_fetch_per_load(tmp_path, monkeypatch):
    """schema() + reader() on one DataSource instance open the store
    ONCE (Spark 4 runs both in the same plan worker; pre-fix each paid
    its own open_store + metadata GET + v2 separator probes)."""
    arr = np.arange(4, dtype="<f8").reshape(2, 2)
    st = ZarrStore(tmp_path / "s")
    st.put_json(".zgroup", {"zarr_format": 2})
    st.put_json(
        "a/.zarray",
        {
            "zarr_format": 2, "shape": [2, 2], "chunks": [2, 2],
            "dtype": "<f8", "compressor": None, "fill_value": 0,
            "order": "C", "filters": None, "dimension_separator": "/",
        },
    )
    st.put("a/0/0", arr.tobytes())
    calls = []
    real = oz.open_store

    def counting(path, so=None):
        calls.append(path)
        return real(path, so)

    monkeypatch.setattr(oz, "open_store", counting)
    ds = oz.OmeZarrDataSource(
        {"path": str(tmp_path / "s"), "array_path": "a"}
    )
    assert ds.schema() == oz.PIXEL_SCHEMA
    reader = ds.reader(None)
    assert len(calls) == 1, calls
    assert reader.meta.shape == (2, 2)


def test_to_ngff_zarr_metadata_none(spark, tmp_path):
    """metadata-less Multiscales (the dataclass default) writes instead
    of crashing in group_attributes (the dataset loop already guarded
    None — the attrs build did not)."""
    from ngff_zarr_spark.model import Multiscales, NgffImage
    from ngff_zarr_spark.ome_zarr_api import to_ngff_zarr

    df = spark.createDataFrame(
        [(0, 0, 0, y, x, float(y * 4 + x)) for y in range(4) for x in range(4)],
        "t long, c long, z long, y long, x long, v double",
    )
    img = NgffImage(
        data=df, dims=["y", "x"], shape={"y": 4, "x": 4},
        scale={"y": 1.0, "x": 1.0}, translation={"y": 0.0, "x": 0.0},
        name="image",
    )
    path = str(tmp_path / "noneta")
    to_ngff_zarr(path, Multiscales(images=[img]), compressor=None)
    st = ZarrStore(path)
    meta = st.read_array_meta("scale0/image", 2)
    got = st.read_chunk(meta, (0,) * len(meta.shape))
    assert float(got.reshape(4, 4)[2, 3]) == 11.0


def test_to_multiscales_partial_chunks_dict(spark):
    from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
    from ngff_zarr_spark.model import NgffImage
    from ngff_zarr_spark.ome_zarr_api import to_multiscales

    spec = ImageSpec("pchunks", z=8, y=16, x=16)
    img = NgffImage(
        data=pixel_df(spark, spec).select("z", "y", "x", "v"),
        dims=["z", "y", "x"], shape={"z": 8, "y": 16, "x": 16},
        scale={"z": 1.0, "y": 1.0, "x": 1.0},
        translation={"z": 0.0, "y": 0.0, "x": 0.0}, name="image",
    )
    # omits z — previously KeyError inside pyramid_scale_factors
    ms = to_multiscales(img, scale_factors=8, chunks={"y": 8, "x": 8})
    assert ms.chunks["y"] == 8 and ms.chunks["z"] >= 1


def test_copy_array_preserves_sharding(spark, tmp_path):
    from ngff_zarr_spark.ome_zarr_api import copy_array, read_image, write_image

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(0, 0, z, y, x, float(z * 16 + y * 4 + x))
         for z in range(4) for y in range(4) for x in range(4)],
        "t long, c long, z long, y long, x long, v double",
    )
    write_image(
        df, src, "scale0/image", {"z": 4, "y": 4, "x": 4}, ["z", "y", "x"],
        {"z": 2, "y": 2, "x": 2}, dtype="float64", compressor="zstd",
        zarr_format=3, chunks_per_shard={"z": 2, "y": 2, "x": 2},
    )
    n = copy_array(spark, src, dst, "scale0/image", zarr_format=3)
    assert n == 8  # inner chunks
    meta = ZarrStore(dst).read_array_meta("scale0/image", 3)
    assert meta.chunks_per_shard == (2, 2, 2)  # sharding PRESERVED
    a = sorted(map(tuple, read_image(spark, src, "scale0/image", zarr_format=3).collect()))
    b = sorted(map(tuple, read_image(spark, dst, "scale0/image", zarr_format=3).collect()))
    assert a == b and len(a) == 64


def test_sparse_chunk_table_and_copy(spark, tmp_path):
    """Chunk table = STORED chunks only; a sparse source copies sparse
    (previously every never-written chunk was synthesized as a fill row
    and written out, densifying the copy)."""
    from ngff_zarr_spark.ome_zarr_api import copy_array, read_chunk_table

    src = str(tmp_path / "sparse")
    st = ZarrStore(src)
    st.put_json(".zgroup", {"zarr_format": 2})
    st.put_json(
        "a/.zarray",
        {
            "zarr_format": 2, "shape": [4, 4], "chunks": [2, 2],
            "dtype": "<f8", "compressor": None, "fill_value": 0,
            "order": "C", "filters": None, "dimension_separator": "/",
        },
    )
    st.put("a/1/0", np.arange(4, dtype="<f8").tobytes())  # 1 of 4 chunks
    tbl = read_chunk_table(spark, src, "a")
    assert tbl.count() == 1
    dst = str(tmp_path / "sparse_dst")
    n = copy_array(spark, src, dst, "a")
    assert n == 1
    dst_files = [
        k for k in ZarrStore(dst).list_keys("a") if not k.endswith((".zarray",))
    ]
    assert dst_files == ["a/1/0"]  # no densification
    # pixel reads of both stores agree (missing chunks reconstruct from
    # fill on either side)
    oz.register(spark)

    def px(p):
        return sorted(
            map(
                tuple,
                spark.read.format("ome_zarr")
                .option("path", p).option("array_path", "a").load()
                .collect(),
            )
        )

    assert px(src) == px(dst)
