"""Round-7 fixes from VERDICT/ADVICE r6: spread() is RDD-free (Spark
Connect compatible), optimize preserves the source codec on
rechunk-only runs, the events stream source starts on an empty
directory, and ivf centroids use identity (not truthiness) checks."""

import os

import numpy as np
import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.text import spread


def test_spread_never_touches_rdd_api(spark, monkeypatch):
    """Spark Connect has no DataFrame.rdd — spread must not touch it
    (VERDICT r6 #6). Poison the property and exercise both branches."""

    def _boom(self):  # pragma: no cover - must never run
        raise AssertionError("spread() accessed df.rdd")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))
    df = spark.createDataFrame([(i, f"t{i}") for i in range(10)], "doc_id long, text string")
    out = spread(df)  # in-memory input: repartitions, no RDD access
    assert out.count() == 10
    assert spread(df, min_partitions=4).count() == 10


def test_spread_noop_on_many_file_scan(spark, tmp_path):
    """A file-backed scan with >= target files already fans out — no
    repartition (the plan is the scan itself, no Exchange)."""
    src = spark.range(40).withColumn("text", F.lit("x"))
    src.repartition(8).write.parquet(str(tmp_path / "many"))
    df = spark.read.parquet(str(tmp_path / "many"))
    n_files = len(df.inputFiles())
    out = spread(df, min_partitions=n_files)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    out2 = spread(df, min_partitions=n_files + 1)
    assert "Exchange" in out2._jdf.queryExecution().executedPlan().toString()


def test_optimize_preserves_source_codec(spark, tmp_path):
    """A rechunk-only optimize (compression_codec=None) must keep the
    source store's codec instead of silently recompressing to gzip
    (ADVICE r6 #1)."""
    from ngff_zarr_spark.driver_api import convert_images_to_ome_zarr, optimize_ome_zarr_store
    from ngff_zarr_spark.ingest.tiff import tiff_encode
    from ngff_zarr_spark.metadata import parse_group_attributes
    from ngff_zarr_spark.sources.zarr_store import open_store

    arr = (np.arange(32 * 24, dtype=np.uint16) % 251).reshape(32, 24)
    tif = tmp_path / "img.tif"
    tif.write_bytes(tiff_encode(arr))
    base = str(tmp_path / "base.ome.zarr")
    assert convert_images_to_ome_zarr(
        spark, [str(tif)], base, chunks={"y": 16, "x": 16}
    ).success
    # give the source a non-default codec, then rechunk-only optimize
    zstd_src = str(tmp_path / "zstd.ome.zarr")
    assert optimize_ome_zarr_store(
        spark, base, zstd_src, compression_codec="zstd"
    ).success
    dst_path = str(tmp_path / "rechunked.ome.zarr")
    res = optimize_ome_zarr_store(
        spark, zstd_src, dst_path, compression_codec=None, chunks={"y": 8, "x": 8}
    )
    assert res.success, res.error
    dst = open_store(dst_path)
    meta, _ = parse_group_attributes(dst.get_json(".zattrs"))
    arrmeta = dst.read_array_meta(meta.datasets[0].path, 2)
    assert arrmeta.compressor == "zstd"
    assert tuple(arrmeta.chunks) == (8, 8)


def test_events_stream_source_empty_dir(spark, tmp_path):
    """Stream start on an empty source directory must not raise: the
    schema falls back to the documented long-ns layout (ADVICE r6 #2)."""
    from ngff_zarr_spark.functions.events import events_stream_source

    empty = tmp_path / "events"
    empty.mkdir()
    ev = events_stream_source(spark, str(empty))
    assert ev.isStreaming
    assert dict(ev.dtypes)["ts"] == "bigint"


def test_ivf_accepts_prebuilt_centroids_identity(spark):
    """centroids=(C, Cn) must be used verbatim — identity check, not
    truthiness (ADVICE r6 #3). A 1-cell centroid tuple whose array is
    falsy-adjacent still short-circuits training."""
    from ngff_zarr_spark.functions.similarity import ivf_cells

    rows = [(i, [float(i % 3), 1.0]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = np.zeros((1, 2), dtype=np.float64)
    C[0] = [1.0, 1.0]
    Cn = np.sqrt((C * C).sum(axis=1))
    out = ivf_cells(emb, dim=2, n_cells=1, centroids=(C, Cn))
    assert {r["cell"] for r in out.collect()} == {0}
