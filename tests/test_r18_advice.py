"""r18: the three ADVICE r17 hardening items, each with the failure
scenario the advice described.

1. compact_ref_index_inplace clears a crash-leftover partial gen
   directory before writing: previously only the exact batch=<hi>
   subdir was overwritten, so a refresh that raised the high-water
   mark between a crashed compaction and its retry left the crashed
   attempt's batch dirs inside the newly committed generation —
   passing the batch<=hi read filter and resurrecting duplicate rows.
2. docs_stream_source / events_stream_source only fall back to the
   documented default schema for missing/empty source dirs; a corrupt
   footer (or any other failure) on an EXISTING dir re-raises instead
   of silently starting the stream with a wrong hardcoded schema.
3. copy_array's sharded writer raises loudly if the same shard index
   is ever flushed twice in one task (write_shard overwrites the whole
   shard object, so a broken contiguity invariant would silently
   discard the first flush's chunks).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

import ngff_zarr_spark.functions.dedup as dedup_mod
from ngff_zarr_spark._io_errors import is_missing_or_empty_source
from ngff_zarr_spark.functions.dedup import (
    compact_ref_index_inplace,
    read_ref_index,
    read_ref_index_meta,
    refresh_ref_index,
    write_ref_index,
)


def _mkdocs(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, text string")


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# 1. crashed compaction + refresh + retry
# ---------------------------------------------------------------------------


def test_compaction_crash_refresh_retry_no_duplicates(spark, tmp_path):
    """Crash a compaction after its data writes but before the meta
    commit, admit a NEW batch (raising the high-water mark), then retry
    the compaction: the retry must not inherit the crashed attempt's
    stale batch=<old_hi> dirs — they would pass the batch<=hi filter
    and duplicate every pre-crash doc (ADVICE r17)."""
    path = str(tmp_path / "idx")
    a = _mkdocs(
        spark,
        [(i, f"first batch doc {i} words {i * 7}") for i in range(8)],
    )
    write_ref_index(a, path, max_bucket=3)
    b = _mkdocs(
        spark,
        [(50 + i, f"second batch doc {i} tokens {i * 13}") for i in range(4)],
    )
    refresh_ref_index(spark, path, b)
    old_hi = int(read_ref_index_meta(path)["max_doc_id"])

    class Boom(RuntimeError):
        pass

    real_meta_write = dedup_mod._write_index_meta

    def crash_on_commit(p, meta):
        raise Boom("injected crash before the gen commit")

    dedup_mod._write_index_meta = crash_on_commit
    try:
        with pytest.raises(Boom):
            compact_ref_index_inplace(spark, path)
    finally:
        dedup_mod._write_index_meta = real_meta_write

    # crash left an uncommitted gen=1 holding batch=<old_hi> data
    assert "gen" not in read_ref_index_meta(path)
    leftover = os.path.join(path, "gen=1", "wide")
    assert os.path.isdir(leftover)
    assert f"batch={old_hi}" in os.listdir(leftover)

    # a refresh raises the high-water mark past the crashed attempt
    c = _mkdocs(spark, [(90 + i, f"third crawl doc {i}") for i in range(3)])
    refresh_ref_index(spark, path, c)
    new_hi = int(read_ref_index_meta(path)["max_doc_id"])
    assert new_hi > old_hi

    # expected contents = what the live index serves just before retry
    w, bnd = read_ref_index(spark, path)
    wcols, bcols = sorted(w.columns), ["doc_id", "band", "band_key"]
    expect_w, expect_b = _sorted_rows(w, wcols), _sorted_rows(bnd, bcols)

    compact_ref_index_inplace(spark, path)

    meta = read_ref_index_meta(path)
    assert meta["gen"] == 1
    root = os.path.join(path, "gen=1")
    # the stale batch=<old_hi> dirs are GONE — only the retry's batch
    assert os.listdir(os.path.join(root, "wide")) == [f"batch={new_hi}"]
    assert os.listdir(os.path.join(root, "bands")) == [f"batch={new_hi}"]
    w2, b2 = read_ref_index(spark, path)
    assert _sorted_rows(w2, wcols) == expect_w
    assert _sorted_rows(b2, bcols) == expect_b
    # belt-and-braces: no duplicate doc_ids anywhere in the wide table
    dup = w2.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    assert dup == 0


# ---------------------------------------------------------------------------
# 2. narrow stream schema fallback
# ---------------------------------------------------------------------------


def test_docs_stream_empty_dir_falls_back(spark, tmp_path):
    """The documented start-before-producer case: the directory EXISTS
    but holds no files yet (a missing path fails in readStream itself —
    Spark requires the source path to exist)."""
    from ngff_zarr_spark.streaming.pipeline import docs_stream_source

    empty = tmp_path / "empty_docs"
    empty.mkdir()
    df = docs_stream_source(spark, str(empty))
    assert df.isStreaming and "doc_id" in df.columns


def test_docs_stream_corrupt_existing_dir_raises(spark, tmp_path):
    """A garbage footer in an EXISTING docs dir must surface, not
    silently fall back to the hardcoded 5-column schema (which would
    read all-null columns)."""
    from ngff_zarr_spark.streaming.pipeline import docs_stream_source

    bad = tmp_path / "docs"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception) as exc:
        docs_stream_source(spark, str(bad))
    assert not is_missing_or_empty_source(exc.value)


def test_events_stream_corrupt_existing_dir_raises(spark, tmp_path):
    from ngff_zarr_spark.functions.events import events_stream_source

    bad = tmp_path / "events"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"\x00\x01 definitely not parquet")
    with pytest.raises(Exception) as exc:
        events_stream_source(spark, str(bad))
    assert not is_missing_or_empty_source(exc.value)


def test_is_missing_or_empty_source_classification(spark, tmp_path):
    # real PATH_NOT_FOUND from a missing dir
    try:
        spark.read.parquet(str(tmp_path / "nope"))
        raise AssertionError("expected AnalysisException")
    except Exception as exc:
        assert is_missing_or_empty_source(exc)
    # real UNABLE_TO_INFER_SCHEMA from an empty dir
    empty = tmp_path / "empty"
    empty.mkdir()
    try:
        spark.read.parquet(str(empty))
        raise AssertionError("expected AnalysisException")
    except Exception as exc:
        assert is_missing_or_empty_source(exc)
    # non-source errors are NOT missing/empty
    assert not is_missing_or_empty_source(FileExistsError("x"))
    assert not is_missing_or_empty_source(ValueError("Path does not exist"))
    # local-FS miss counts
    assert is_missing_or_empty_source(FileNotFoundError("gone"))


# ---------------------------------------------------------------------------
# 3. copy_array double-flush guard
# ---------------------------------------------------------------------------


def test_copy_array_interleaved_shards_fail_loudly(spark, tmp_path, monkeypatch):
    """Break the reader's shard-contiguity invariant on purpose (rows
    reordered so shard indices interleave within one task): the sharded
    writer must raise, not overwrite shard objects silently."""
    import ngff_zarr_spark.ome_zarr_api as api
    from ngff_zarr_spark.ome_zarr_api import copy_array, write_image

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame(
        [
            (0, 0, z, y, x, float(z * 16 + y * 4 + x))
            for z in range(8)
            for y in range(4)
            for x in range(4)
        ],
        "t long, c long, z long, y long, x long, v double",
    )
    write_image(
        df, src, "scale0/image", {"z": 8, "y": 4, "x": 4}, ["z", "y", "x"],
        {"z": 2, "y": 2, "x": 2}, dtype="float64", compressor="zstd",
        zarr_format=3, chunks_per_shard={"z": 2, "y": 2, "x": 2},
    )

    real_read = api.read_chunk_table

    def interleaved(*args, **kwargs):
        tbl = real_read(*args, **kwargs)
        # shard index along z is ck_z // 2; ordering by ck_z % 2 makes
        # consecutive rows alternate between shards
        return tbl.coalesce(1).sortWithinPartitions(
            (F.col("ck_z") % 2), "ck_z", "ck_y", "ck_x"
        )

    monkeypatch.setattr(api, "read_chunk_table", interleaved)
    with pytest.raises(Exception, match="flushed twice"):
        copy_array(spark, src, dst, "scale0/image", zarr_format=3)


def test_copy_array_contiguous_shards_still_green(spark, tmp_path):
    """The guard must not fire on the real reader's contiguous order."""
    from ngff_zarr_spark.ome_zarr_api import copy_array, read_image, write_image
    from ngff_zarr_spark.sources.zarr_store import ZarrStore

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame(
        [
            (0, 0, z, y, x, float(z * 16 + y * 4 + x))
            for z in range(8)
            for y in range(4)
            for x in range(4)
        ],
        "t long, c long, z long, y long, x long, v double",
    )
    write_image(
        df, src, "scale0/image", {"z": 8, "y": 4, "x": 4}, ["z", "y", "x"],
        {"z": 2, "y": 2, "x": 2}, dtype="float64", compressor="zstd",
        zarr_format=3, chunks_per_shard={"z": 2, "y": 2, "x": 2},
    )
    n = copy_array(spark, src, dst, "scale0/image", zarr_format=3)
    assert n == 16  # 4*2*2 inner chunks
    meta = ZarrStore(dst).read_array_meta("scale0/image", 3)
    assert meta.chunks_per_shard == (2, 2, 2)
    a = sorted(
        map(tuple, read_image(spark, src, "scale0/image", zarr_format=3).collect())
    )
    b = sorted(
        map(tuple, read_image(spark, dst, "scale0/image", zarr_format=3).collect())
    )
    assert a == b and len(a) == 128
