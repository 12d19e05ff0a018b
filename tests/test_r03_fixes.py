"""Round-3 fixes: zarr v2 dimension_separator interop, range-arithmetic
partition planning, sharded read-modify-write, multi-block blosc decode,
and HTTP auth-failure surfacing.

Reference behaviors covered:
- v2 separator: the reference WRITES '/' (_zarr_kwargs.py:7-10, asserted
  by py/test/test_dimension_separator.py:38-40) but READS either via
  zarr-python, whose v2 spec default is '.'.
- c-blosc block semantics (public README_CHUNK_FORMAT.rst + blosc.c):
  split and shuffle are decided/applied PER BLOCK; the trailing partial
  block is never split.
"""

import struct
import threading
import time
from http.server import HTTPServer, SimpleHTTPRequestHandler

import numpy as np
import pytest

from ngff_zarr_spark.sources.blosc import (
    CODEC_NAMES,
    _byteshuffle,
    _compress_stream,
    _split_block,
    blosc_decompress,
)
from ngff_zarr_spark.sources.zarr_store import ZarrArrayMeta, ZarrStore


def _write_v2_fixture(tmp_path, separator, declare=True, name="dot.zarr"):
    """A small v2 store with the given chunk-key separator; optionally
    omit the .zarray field (legacy stores predate it)."""
    store = ZarrStore(str(tmp_path / name))
    vol = np.arange(4 * 6 * 5, dtype=np.int32).reshape(4, 6, 5)
    meta = ZarrArrayMeta(
        path="scale0/image",
        shape=vol.shape,
        chunks=(2, 4, 4),
        dtype=np.dtype("int32"),
        compressor="gzip",
        zarr_format=2,
        dimension_separator=separator,
    )
    store.write_group("", {}, 2)
    store.write_array_meta(meta)
    for iz in range(meta.chunk_grid[0]):
        for iy in range(meta.chunk_grid[1]):
            for ix in range(meta.chunk_grid[2]):
                idx = (iz, iy, ix)
                o, e = meta.chunk_origin(idx), meta.chunk_extent(idx)
                store.write_chunk(
                    meta, idx, vol[o[0] : o[0] + e[0], o[1] : o[1] + e[1], o[2] : o[2] + e[2]]
                )
    if not declare:
        doc = store.get_json("scale0/image/.zarray")
        doc.pop("dimension_separator", None)
        store.put_json("scale0/image/.zarray", doc)
    return store, meta, vol


def _read_all(store, meta):
    out = np.zeros(meta.shape, dtype=meta.dtype)
    for iz in range(meta.chunk_grid[0]):
        for iy in range(meta.chunk_grid[1]):
            for ix in range(meta.chunk_grid[2]):
                idx = (iz, iy, ix)
                o, e = meta.chunk_origin(idx), meta.chunk_extent(idx)
                out[o[0] : o[0] + e[0], o[1] : o[1] + e[1], o[2] : o[2] + e[2]] = (
                    store.read_chunk(meta, idx)
                )
    return out


class TestDimensionSeparator:
    def test_dot_keys_on_disk(self, tmp_path):
        store, meta, _ = _write_v2_fixture(tmp_path, ".")
        assert (tmp_path / "dot.zarr/scale0/image/0.0.0").exists()
        assert not (tmp_path / "dot.zarr/scale0/image/0/0/0").exists()

    def test_read_legacy_default_dot(self, tmp_path):
        """No dimension_separator field at all → spec default '.'."""
        store, meta, vol = _write_v2_fixture(tmp_path, ".", declare=False)
        back = store.read_array_meta("scale0/image", 2)
        assert back.dimension_separator == "."
        assert np.array_equal(_read_all(store, back), vol)

    def test_read_declared_slash(self, tmp_path):
        store, meta, vol = _write_v2_fixture(tmp_path, "/", name="slash.zarr")
        back = store.read_array_meta("scale0/image", 2)
        assert back.dimension_separator == "/"
        assert np.array_equal(_read_all(store, back), vol)

    def test_probe_flips_wrong_declaration(self, tmp_path):
        """Store declares '/' but its keys are dot-separated (writer
        bug / hand-edited store): the origin-chunk probe flips the
        separator instead of silently reading all-fill."""
        store, meta, vol = _write_v2_fixture(tmp_path, ".")
        doc = store.get_json("scale0/image/.zarray")
        doc["dimension_separator"] = "/"
        store.put_json("scale0/image/.zarray", doc)
        back = store.read_array_meta("scale0/image", 2)
        assert back.dimension_separator == "."
        assert np.array_equal(_read_all(store, back), vol)

    def test_v3_v2_key_encoding(self, tmp_path):
        """zarr v3 with chunk_key_encoding name 'v2': bare keys without
        the c/ prefix, separator default '.' under that encoding."""
        import json

        store = ZarrStore(str(tmp_path / "v3v2.zarr"))
        vol = np.arange(4 * 4, dtype=np.int32).reshape(4, 4)
        meta = ZarrArrayMeta(
            path="a", shape=(4, 4), chunks=(2, 2), dtype=np.dtype("int32"),
            compressor=None, zarr_format=3,
        )
        store.write_array_meta(meta)
        doc = store.get_json("a/zarr.json")
        doc["chunk_key_encoding"] = {"name": "v2"}
        store.put_json("a/zarr.json", doc)
        back = store.read_array_meta("a", 3)
        assert back.key_encoding == "v2" and back.dimension_separator == "."
        assert back.chunk_key((1, 0)) == "a/1.0"
        for iy in range(2):
            for ix in range(2):
                store.write_chunk(back, (iy, ix), vol[iy*2:(iy+1)*2, ix*2:(ix+1)*2])
        assert (tmp_path / "v3v2.zarr/a/0.1").exists()
        out = np.zeros((4, 4), dtype=np.int32)
        for iy in range(2):
            for ix in range(2):
                out[iy*2:(iy+1)*2, ix*2:(ix+1)*2] = store.read_chunk(back, (iy, ix))
        assert np.array_equal(out, vol)

    def test_datasource_reads_dot_store(self, spark, tmp_path):
        from ngff_zarr_spark.ome_zarr_api import read_image

        store, meta, vol = _write_v2_fixture(tmp_path, ".", declare=False)
        df = read_image(spark, str(tmp_path / "dot.zarr"), "scale0/image")
        rows = {(r.z, r.y, r.x): r.v for r in df.collect()}
        assert len(rows) == vol.size
        assert rows[(1, 2, 3)] == float(vol[1, 2, 3])
        assert rows[(3, 5, 4)] == float(vol[3, 5, 4])


class TestRangePartitions:
    def _reader(self, tmp_path, shape, chunks, options=None):
        from ngff_zarr_spark.sources.ome_zarr import OmeZarrReader

        store = ZarrStore(str(tmp_path / "meta.zarr"))
        meta = ZarrArrayMeta(
            path="a", shape=shape, chunks=chunks, dtype=np.dtype("uint8")
        )
        store.write_array_meta(meta)
        opts = {"path": str(tmp_path / "meta.zarr"), "array_path": "a"}
        opts.update(options or {})
        return OmeZarrReader(opts)

    def test_million_chunk_grid_plans_fast(self, tmp_path):
        """10^6-chunk metadata-only grid: planning is range arithmetic,
        bounded partition list, well under a second (VERDICT r02 #3)."""
        r = self._reader(tmp_path, (1024, 1024, 1024), (8, 8, 8))  # 128^3 ≈ 2.1e6 chunks
        t0 = time.time()
        parts = r.partitions()
        dt = time.time() - t0
        assert dt < 1.0, f"partitions() took {dt:.2f}s"
        # adaptive sizing: ceil(total / target_chunks=64) ranges
        assert len(parts) == -(-(128 ** 3) // 64)
        total = sum(p.end - p.start for p in parts)
        assert total == 128 ** 3

    def test_huge_grid_hits_hard_cap(self, tmp_path):
        # 512^3 = 1.3e8 chunks: the 65536-partition hard cap bounds the
        # driver plan; ~2048 chunks per range
        r = self._reader(tmp_path, (4096, 4096, 4096), (8, 8, 8))
        t0 = time.time()
        parts = r.partitions()
        assert time.time() - t0 < 2.0
        assert len(parts) == 65536
        assert sum(p.end - p.start for p in parts) == 512 ** 3

    def test_small_grid_stays_chunk_granular(self, tmp_path):
        r = self._reader(tmp_path, (16, 32, 32), (8, 16, 16))
        parts = r.partitions()
        assert len(parts) == 2 * 2 * 2
        assert all(p.end - p.start == 1 for p in parts)

    def test_pruning_box_arithmetic(self, tmp_path):
        from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

        r = self._reader(tmp_path, (1024, 1024, 1024), (8, 8, 8))
        r.pushFilters([LessThan(("z",), 16), GreaterThanOrEqual(("x",), 1016)])
        parts = r.partitions()
        # z: chunks [0,2), y: all 128, x: [127,128) → 2*128*1 = 256
        assert sum(p.end - p.start for p in parts) == 2 * 128 * 1

    def test_fully_pruned_returns_empty_partition(self, tmp_path):
        from pyspark.sql.datasource import GreaterThanOrEqual

        r = self._reader(tmp_path, (16, 32, 32), (8, 16, 16))
        r.pushFilters([GreaterThanOrEqual(("z",), 100)])
        parts = r.partitions()
        assert sum(p.end - p.start for p in parts) == 0


class TestShardedWriteChunk:
    def test_read_modify_write_preserves_others(self, tmp_path):
        """write_chunk into an existing shard merges instead of
        clobbering the shard's other chunks (ADVICE r02)."""
        store = ZarrStore(str(tmp_path / "s.zarr"))
        meta = ZarrArrayMeta(
            path="a",
            shape=(4, 4),
            chunks=(2, 2),
            dtype=np.dtype("int32"),
            compressor="zstd",
            zarr_format=3,
            chunks_per_shard=(2, 2),
        )
        a = np.arange(4, dtype=np.int32).reshape(2, 2)
        b = a + 100
        store.write_shard(meta, (0, 0), {(0, 0): a})
        store.write_chunk(meta, (1, 1), b)  # same shard file
        assert np.array_equal(store.read_chunk(meta, (0, 0)), a)
        assert np.array_equal(store.read_chunk(meta, (1, 1)), b)


def _synth_multiblock_chunk(raw, typesize, blocksize, cname="lz4", clevel=5):
    """Model c-blosc's writer for a multi-block chunk: per-block
    shuffle, per-block split decision (full blocks split when the
    heuristic says; the partial tail never splits)."""
    codec = CODEC_NAMES[cname]
    nbytes = len(raw)
    nblocks = -(-nbytes // blocksize)
    blocks = []
    for j in range(nblocks):
        bsize = min(blocksize, nbytes - j * blocksize)
        block = _byteshuffle(raw[j * blocksize : j * blocksize + bsize], typesize)
        ns = typesize if (_split_block(codec, typesize, blocksize) and bsize == blocksize) else 1
        per = bsize // ns
        out = b""
        pos = 0
        for i in range(ns):
            want = per if i < ns - 1 else bsize - per * (ns - 1)
            s = block[pos : pos + want]
            pos += want
            comp = _compress_stream(codec, s, clevel)
            if len(comp) >= len(s):
                comp = s
            out += struct.pack("<i", len(comp)) + comp
        blocks.append(out)
    header_len = 16 + 4 * nblocks
    bstarts, body = [], b""
    for b in blocks:
        bstarts.append(header_len + len(body))
        body += b
    flags = 0x1 | (codec << 5)  # byte-shuffle
    cbytes = header_len + len(body)
    header = struct.pack("<BBBBiii", 2, 1, flags, typesize, nbytes, blocksize, cbytes)
    return header + struct.pack(f"<{nblocks}i", *bstarts) + body


class TestBloscMultiBlock:
    def test_multiblock_with_partial_tail(self):
        """2 full split blocks + a non-split partial tail — the layout
        zarr-python's default Blosc(lz4, shuffle) produces for chunks
        larger than the auto blocksize (ADVICE r02 medium)."""
        n = 2048 * 2 + 1000  # two full 2048B blocks + 1000B tail
        raw = np.arange(n // 8, dtype="<f8").tobytes()
        chunk = _synth_multiblock_chunk(raw, typesize=8, blocksize=2048)
        assert blosc_decompress(chunk) == raw

    def test_multiblock_dont_split_flag(self):
        """flags bit 0x10 forces non-split parsing of full blocks."""
        n = 2048 * 2
        raw = np.arange(n // 4, dtype="<u4").tobytes()
        codec = CODEC_NAMES["lz4"]
        nblocks = 2
        blocks = []
        for j in range(nblocks):
            block = _byteshuffle(raw[j * 2048 : (j + 1) * 2048], 4)
            comp = _compress_stream(codec, block, 5)
            if len(comp) >= len(block):
                comp = block
            blocks.append(struct.pack("<i", len(comp)) + comp)
        header_len = 16 + 4 * nblocks
        bstarts, body = [], b""
        for b in blocks:
            bstarts.append(header_len + len(body))
            body += b
        flags = 0x1 | 0x10 | (codec << 5)
        header = struct.pack("<BBBBiii", 2, 1, flags, 4, n, 2048, header_len + len(body))
        chunk = header + struct.pack(f"<{nblocks}i", *bstarts) + body
        assert blosc_decompress(chunk) == raw

    def test_multiblock_multiple_of_blocksize(self):
        """No partial tail: every block full and split."""
        n = 2048 * 3
        raw = np.arange(n // 8, dtype="<f8").tobytes()
        chunk = _synth_multiblock_chunk(raw, typesize=8, blocksize=2048)
        assert blosc_decompress(chunk) == raw


class TestOldLayouts:
    """OME-Zarr 0.1-0.3 read layouts (reference from_ngff_zarr.py:38-307):
    0.1/0.2 have no axes; 0.3 axes are name strings; none carry
    coordinateTransformations."""

    V02_ATTRS = {
        "multiscales": [
            {"version": "0.2", "datasets": [{"path": "0"}, {"path": "1"}], "name": "old"}
        ]
    }
    V03_ATTRS = {
        "multiscales": [
            {
                "version": "0.3",
                "axes": ["t", "c", "z", "y", "x"],
                "datasets": [{"path": "0"}],
            }
        ]
    }

    def test_parse_v02_implicit_axes(self):
        from ngff_zarr_spark.metadata import parse_group_attributes

        meta, version = parse_group_attributes(self.V02_ATTRS)
        assert version == "0.2"
        assert [a.name for a in meta.axes] == ["t", "c", "z", "y", "x"]
        assert [a.type for a in meta.axes] == ["time", "channel", "space", "space", "space"]
        assert [d.path for d in meta.datasets] == ["0", "1"]
        assert meta.datasets[0].coordinateTransformations == []

    def test_parse_v03_string_axes(self):
        from ngff_zarr_spark.metadata import parse_group_attributes

        meta, version = parse_group_attributes(self.V03_ATTRS)
        assert version == "0.3"
        assert [a.name for a in meta.axes] == ["t", "c", "z", "y", "x"]
        assert meta.axes[0].unit is None

    def test_validate_old_layouts_green(self):
        from ngff_zarr_spark.validate import validate

        assert validate(self.V02_ATTRS) == []
        assert validate(self.V03_ATTRS) == []

    def test_validate_04_still_strict(self):
        from ngff_zarr_spark.validate import validate

        bad_04 = {
            "multiscales": [
                {"version": "0.4", "axes": ["y", "x"], "datasets": [{"path": "0"}]}
            ]
        }
        problems = validate(bad_04)
        assert any("must be objects" in p for p in problems)
        assert any("coordinateTransformations" in p for p in problems)

    def test_parse_omero_min_max_only(self):
        from ngff_zarr_spark.metadata import parse_group_attributes

        attrs = {
            "multiscales": [{"version": "0.2", "datasets": [{"path": "0"}]}],
            "omero": {"channels": [{"window": {"min": 0, "max": 255}}]},
        }
        meta, _ = parse_group_attributes(attrs)
        w = meta.omero.channels[0].window
        assert (w.min, w.max, w.start, w.end) == (0.0, 255.0, 0.0, 255.0)

    def test_read_v02_store_end_to_end(self, spark, tmp_path):
        """A flat 0.2-layout store (paths '0', no axes, 5-D arrays, no
        transforms) reads into a Multiscales with implicit dims and
        default scale/translation."""
        from ngff_zarr_spark.ome_zarr_api import from_ngff_zarr

        store = ZarrStore(str(tmp_path / "old.zarr"))
        vol = np.arange(1 * 1 * 2 * 4 * 5, dtype=np.int32).reshape(1, 1, 2, 4, 5)
        meta = ZarrArrayMeta(
            path="0", shape=vol.shape, chunks=vol.shape, dtype=np.dtype("int32"),
            compressor="gzip", zarr_format=2, dimension_separator=".",
        )
        attrs = {
            "multiscales": [
                {"version": "0.2", "datasets": [{"path": "0"}], "name": "old"}
            ]
        }
        store.write_group("", attrs, 2)
        store.write_array_meta(meta)
        # legacy stores also predate the dimension_separator field
        doc = store.get_json("0/.zarray")
        doc.pop("dimension_separator", None)
        store.put_json("0/.zarray", doc)
        store.write_chunk(meta, (0, 0, 0, 0, 0), vol)
        ms = from_ngff_zarr(spark, str(tmp_path / "old.zarr"), validate=True)
        img = ms.images[0]
        assert img.dims == ["t", "c", "z", "y", "x"]
        assert img.scale == {d: 1.0 for d in img.dims}
        got = {(r.z, r.y, r.x): r.v for r in img.data.collect()}
        assert got[(1, 3, 4)] == float(vol[0, 0, 1, 3, 4])


class TestLabelDownsampleLinear:
    """A3 ported algorithm: linear label interpolation at the resample
    point f*k + (f-1)/2 → only the per-dim center voxels vote."""

    def _run(self, spark, grid, f):
        from ngff_zarr_spark.operators import label_downsample

        ny, nx = len(grid), len(grid[0])
        rows = [
            (0, 0, 0, y, x, int(grid[y][x]))
            for y in range(ny)
            for x in range(nx)
        ]
        df = spark.createDataFrame(rows, "t long, c long, z long, y long, x long, v long")
        out = label_downsample(df, {"z": 1, "y": ny, "x": nx}, {"y": f, "x": f})
        return {(r.y, r.x): r.v for r in out.collect()}

    def test_hand_computed_4x4(self, spark):
        # f=4: sample point at block offset 1.5 per dim → voters are
        # offsets {1,2}×{1,2} = the 4 center voxels. Corner values never
        # matter no matter how frequent they are in the block.
        grid = [
            [9, 9, 9, 9],
            [9, 3, 3, 9],
            [9, 5, 7, 9],
            [9, 9, 9, 9],
        ]
        # votes: 3→2, 5→1, 7→1 → label 3 (9 has 12 cells but 0 votes)
        assert self._run(spark, grid, 4) == {(0, 0): 3}

    def test_hand_computed_tie_smallest(self, spark):
        grid = [
            [0, 0, 0, 0],
            [0, 5, 3, 0],
            [0, 3, 5, 0],
            [0, 0, 0, 0],
        ]
        # votes 3→2, 5→2 → tie → smallest label 3
        assert self._run(spark, grid, 4) == {(0, 0): 3}

    def test_odd_factor_is_center_voxel(self, spark):
        # f=3: sample point at offset 1.0 exactly → single voter (1,1)
        grid = [
            [7, 7, 7],
            [7, 2, 7],
            [7, 7, 7],
        ]
        assert self._run(spark, grid, 3) == {(0, 0): 2}

    def test_matches_oracle_formula_f2(self, spark):
        # f=2: all 4 voxels are center voxels (offsets {0,1}) → plain
        # block mode with smallest-label ties
        grid = [
            [1, 2],
            [2, 4],
        ]
        assert self._run(spark, grid, 2) == {(0, 0): 2}


class TestAutoLshAndMaxDf:
    def test_auto_band_planes_monotone_and_clamped(self):
        from ngff_zarr_spark.functions.similarity import BAND_PLANES, auto_band_planes

        assert auto_band_planes(0) == BAND_PLANES
        assert auto_band_planes(8_192) == BAND_PLANES  # floor at test scale
        assert auto_band_planes(10**6) == 15
        assert auto_band_planes(10**9) == 24  # max clamp
        vals = [auto_band_planes(10**k) for k in range(3, 10)]
        assert vals == sorted(vals)

    def test_auto_sizing_end_to_end(self, spark, sf_dir):
        """band_planes=None derives the knob from the corpus count; at
        test scale auto == BAND_PLANES so results match the pinned
        gate path exactly."""
        from ngff_zarr_spark.functions.similarity import lsh_bucket_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        auto = lsh_bucket_topk(emb, [0, 1], k=2, band_planes=None).collect()
        pinned = lsh_bucket_topk(emb, [0, 1], k=2).collect()
        assert sorted(map(tuple, auto)) == sorted(map(tuple, pinned))

    def test_ngram_max_df_default_on(self):
        import inspect

        from ngff_zarr_spark.functions.dedup import DEFAULT_MAX_DF, ngram_jaccard_pairs

        assert inspect.signature(ngram_jaccard_pairs).parameters["max_df"].default == DEFAULT_MAX_DF
        assert DEFAULT_MAX_DF == 10_000


class TestClustersAndIvf:
    def test_duplicate_clusters_hand_graph(self, spark):
        from ngff_zarr_spark.functions.dedup import duplicate_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        got = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_chain_graph_converges(self, spark):
        """Path graph 0-1-…-9: worst case for hash-min (label moves one
        hop per round); must converge inside max_iters with early exit."""
        from ngff_zarr_spark.functions.dedup import duplicate_clusters

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
        )
        got = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
        assert len(got) == 10 and set(got.values()) == {0}

    def test_keep_representatives(self, spark):
        from ngff_zarr_spark.functions.dedup import dedup_keep_representatives

        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([(0, 3), (3, 5)], "doc_a long, doc_b long")
        kept = sorted(r.doc_id for r in dedup_keep_representatives(docs, pairs).collect())
        assert kept == [0, 1, 2, 4]  # 3 and 5 fold into representative 0

    def test_ivf_recall_vs_exact(self, spark, sf_dir):
        """IVF with 4/16 probes finds most exact top-3 neighbors; exact
        re-rank means every returned cosine equals the true cosine."""
        from ngff_zarr_spark.functions.similarity import cosine_topk, ivf_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = [0, 1, 2, 3]
        exact = {
            (r.query_id, r.neighbor_id): r.cosine
            for r in cosine_topk(emb, qs, k=3).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id): r.cosine
            for r in ivf_topk(emb, qs, k=3).collect()
        }
        hits = set(exact) & set(approx)
        assert len(hits) / len(exact) >= 0.5
        for key in hits:
            assert exact[key] == approx[key]


class TestIvfPartitionedLayout:
    def test_partitioned_probe_equals_ivf_topk(self, spark, sf_dir, tmp_path):
        from ngff_zarr_spark.functions.similarity import (
            ivf_topk,
            ivf_topk_partitioned,
            write_ivf_partitioned,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        path = str(tmp_path / "corpus_ivf")
        write_ivf_partitioned(emb, path)
        got = sorted(
            map(tuple, ivf_topk_partitioned(spark, path, [0, 1, 2], k=3).collect())
        )
        want = sorted(map(tuple, ivf_topk(emb, [0, 1, 2], k=3).collect()))
        assert got == want

    def test_probe_scan_partition_prunes(self, spark, sf_dir, tmp_path):
        """cell IN (...) on the partitioned layout shows up as
        PartitionFilters — the scan reads only probed directories."""
        import contextlib
        import io

        from pyspark.sql import functions as F

        from ngff_zarr_spark.functions.similarity import write_ivf_partitioned

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        path = str(tmp_path / "corpus_ivf2")
        write_ivf_partitioned(emb, path)
        df = spark.read.parquet(path).filter(F.col("cell").isin([0, 3]))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan and "cell" in plan


class TestSketches:
    def test_kmv_estimate_accuracy(self, spark):
        from ngff_zarr_spark.functions.sketch import kmv_distinct

        n = 5000
        from pyspark.sql import functions as F

        df = spark.range(n).select(F.col("id").cast("string").alias("s"))
        row = kmv_distinct(df, "s", k=256).collect()[0]
        assert row.k_used == 256
        assert abs(row.est - n) / n < 0.2  # KMV stderr ~ 1/sqrt(k) ≈ 6%

    def test_kmv_small_cardinality_exact(self, spark):
        from ngff_zarr_spark.functions.sketch import kmv_distinct

        df = spark.createDataFrame([(str(i % 7),) for i in range(100)], "s string")
        row = kmv_distinct(df, "s", k=256).collect()[0]
        assert row.k_used == 7 and row.est == 7.0

    def test_count_min_upper_bound(self, spark):
        from ngff_zarr_spark.functions.sketch import count_min_estimate

        df = spark.createDataFrame(
            [(f"k{i % 10}",) for i in range(1000)], "v string"
        )
        rows = count_min_estimate(df, "v").collect()
        assert len(rows) == 10
        for r in rows:
            assert r.cm_est >= r.exact_n  # CM never underestimates
            assert r.exact_n == 100


class _Deny403Handler(SimpleHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_HEAD(self):
        self.send_error(403)

    def do_GET(self):
        self.send_error(403)


class TestHttp403:
    def test_403_surfaces_not_missing(self):
        import urllib.error

        from ngff_zarr_spark.sources.zarr_store import HttpStore

        srv = HTTPServer(("127.0.0.1", 0), _Deny403Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            store = HttpStore(f"http://127.0.0.1:{srv.server_port}")
            with pytest.raises(urllib.error.HTTPError):
                store.exists("some/chunk/0.0.0")
        finally:
            srv.shutdown()
