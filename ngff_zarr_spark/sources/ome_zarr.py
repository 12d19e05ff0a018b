"""``ome_zarr`` PySpark DataSource (Python DataSource API, Spark 4):

    spark.dataSource.register(OmeZarrDataSource)
    df = (spark.read.format("ome_zarr")
          .option("path", "/data/img.ome.zarr").option("scale", 0).load())
    # → pixel table (t, c, z, y, x, v)

Read side (S1): one ``InputPartition`` per Zarr chunk — the unit of
parallelism matches the storage grid, so a 100 TB store fans out to
millions of independent chunk reads with no driver materialization.
``pushFilters`` implements O11: comparison predicates on the coordinate
columns prune non-intersecting chunks *before* tasks launch (the classic
partition-pruning shape); all filters are still returned to Spark for
exact row-level re-evaluation inside surviving chunks. Chunk bytes are
decoded to numpy and emitted as Arrow RecordBatches (vectorized, no
per-row Python).

Write side (S4/S6): ``DataSourceArrowWriter`` — each task assembles the
chunks wholly contained in its partition and puts them to the store;
``commit`` runs once on the driver. Callers must pre-partition by chunk
key (ome_zarr_api.write_image does) so no chunk spans two tasks — the
same invariant the reference establishes by rechunking before write
(_align_chunks, to_ngff_zarr.py:1093-1101).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .zarr_store import (
    ZarrArrayMeta,
    ZarrStore,
    decode_chunk,
    encode_chunk,
    open_store,
)

PIXEL_DIMS = ("t", "c", "z", "y", "x")

PIXEL_SCHEMA = StructType(
    [StructField(d, LongType(), False) for d in PIXEL_DIMS]
    + [StructField("v", DoubleType(), True)]
)

# complex64/128 arrays (reference dtype map, to_ngff_zarr.py:89-117):
# Spark has no native complex type, so the pixel value surfaces as
# struct<re,im> (SURVEY §1.2) — disk keeps the true <c8/<c16 layout
COMPLEX_PIXEL_SCHEMA = StructType(
    [StructField(d, LongType(), False) for d in PIXEL_DIMS]
    + [
        StructField(
            "v",
            StructType(
                [
                    StructField("re", DoubleType(), True),
                    StructField("im", DoubleType(), True),
                ]
            ),
            True,
        )
    ]
)

# chunk-table representation (SURVEY §1.3): one row per stored chunk —
# chunk grid indices, valid (clipped) extents, and the chunk's RAW
# little-endian C-order buffer. ~40 bytes/voxel in the exploded pixel
# table vs itemsize bytes/voxel here: the representation for I/O-bound
# ops (store copy, rechunk, per-chunk kernels) at 100 TB.
from pyspark.sql.types import BinaryType  # noqa: E402

CHUNK_SCHEMA = StructType(
    [StructField(f"ck_{d}", LongType(), False) for d in PIXEL_DIMS]
    + [StructField(f"ex_{d}", LongType(), False) for d in PIXEL_DIMS]
    + [
        StructField("nbytes", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


@dataclass
class ChunkRangePartition(InputPartition):
    """A contiguous flat range [start, end) of chunk (or shard) indices
    inside the pruned index box ``box_lo + [0, box_shape)``.

    Partition planning is pure range arithmetic — the driver never
    enumerates individual chunks, so a 10⁸-chunk store plans in
    milliseconds with a bounded partition list; each task unravels its
    own flat range back to concrete grid indices."""

    box_lo: tuple
    box_shape: tuple
    start: int
    end: int


def _axis_map(dimension_names: Optional[list], ndim: int) -> list[str]:
    """Store axis order → pixel-dim names; positional (t,c,z,y,x) trailing
    default when the store has no dimension_names (v2 without
    _ARRAY_DIMENSIONS).

    Rank > 5 raises — the schema has five coordinate columns, and a
    shortened axes list would silently build wrong chunk keys / read
    all-fill (code-review r17). Foreign axis names (an xarray store
    with ["time","lat","lon"]) fall back to the POSITIONAL mapping:
    zero-filling unknown names would collapse every row onto the same
    (0,0,0,0,0) key (code-review r17)."""
    if ndim > len(PIXEL_DIMS):
        raise ValueError(
            f"array rank {ndim} exceeds the engine's {len(PIXEL_DIMS)}-dim "
            f"pixel schema {PIXEL_DIMS}"
        )
    if dimension_names:
        names = list(dimension_names)
        if all(n in PIXEL_DIMS for n in names) and len(set(names)) == len(names):
            return names
        return list(PIXEL_DIMS[5 - ndim:])
    return list(PIXEL_DIMS[5 - ndim:])


def _resolve_array_path(options: dict) -> str:
    """One source of truth for the default array node path — schema(),
    reader and writer previously each computed it (code-review r17)."""
    explicit = options.get("array_path")
    if explicit:
        return explicit
    return f"scale{int(options.get('scale', '0'))}/image"


def _parse_storage_options(options: dict) -> Optional[dict]:
    """S2: fsspec ``storage_options`` ride through the DataSource as a
    JSON string option (DataSource options are str→str); parsed once on
    the driver and shipped to executors inside the pickled reader."""
    raw = options.get("storage_options")
    if not raw:
        return None
    import json

    return json.loads(raw)


class OmeZarrReader(DataSourceReader):
    def __init__(self, options: dict, meta=None):
        self.path = options["path"]
        self.zarr_format = int(options.get("zarr_format", "2"))
        self.mode = options.get("mode", "pixel")  # pixel | chunk
        self.storage_options = _parse_storage_options(options)
        self.array_path = _resolve_array_path(options)
        if meta is None:
            store = open_store(self.path, self.storage_options)
            meta = store.read_array_meta(self.array_path, self.zarr_format)
        self.meta = meta
        # explicit dims option (from_ngff_zarr passes the multiscales
        # axes) wins over stored dimension_names / positional default
        explicit = options.get("dims")
        self.axes = (
            explicit.split(",")
            if explicit
            else _axis_map(self.meta.dimension_names, len(self.meta.shape))
        )
        # pruning ranges per pixel dim: [lo, hi) — refined by pushFilters
        self.bounds: dict[str, list] = {}
        # partition sizing: chunk-granular below ``min_partitions`` (a
        # small store should still use every core); above it, pack
        # ``target_chunks`` chunks per task (sequential streaming reads,
        # the parquet-split shape — ~64 × 1-8 MB chunks ≈ 0.1-0.5 GB of
        # I/O per task); hard cap ``max_partitions`` bounds the driver's
        # plan at any grid size (a 10^8-chunk store plans 65536 ranges,
        # ~1500 chunks each — hours of work still spread over 65 waves
        # of a 1000-executor cluster).
        self.min_partitions = int(options.get("min_partitions", "4096"))
        self.target_chunks = int(options.get("target_chunks_per_partition", "64"))
        self.max_partitions = int(options.get("max_partitions", "65536"))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """O11 chunk pruning: absorb comparison predicates on coordinate
        columns into per-dim ranges. All filters are returned (pruning is
        chunk-granular; Spark still applies exact row filters)."""
        for f in filters:
            col = None
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                if len(f.attribute) == 1 and f.attribute[0] in self.axes:
                    col = f.attribute[0]
            if col is None:
                continue
            lo, hi = self.bounds.get(col, [None, None])
            v = f.value
            if isinstance(f, EqualTo):
                lo = v if lo is None else max(lo, v)
                hi = v + 1 if hi is None else min(hi, v + 1)
            elif isinstance(f, GreaterThan):
                lo = v + 1 if lo is None else max(lo, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                lo = v if lo is None else max(lo, v)
            elif isinstance(f, LessThan):
                hi = v if hi is None else min(hi, v)
            elif isinstance(f, LessThanOrEqual):
                hi = v + 1 if hi is None else min(hi, v + 1)
            self.bounds[col] = [lo, hi]
        return filters

    def _pruned_box(self, units: tuple[int, ...]) -> tuple[tuple, tuple]:
        """Per-dim surviving index range [lo_i, hi_i) for chunks (or
        shards) of per-dim size ``units`` — the arithmetic form of
        per-chunk interval pruning: unit i intersects [lo, hi) iff
        i >= lo // c and i < ceil(hi / c)."""
        m = self.meta
        grid = tuple(-(-s // c) for s, c in zip(m.shape, units))
        lo_idx, hi_idx = [], []
        for ax, c, g in zip(self.axes, units, grid):
            lo, hi = (self.bounds.get(ax) or [None, None])
            i_lo = 0 if lo is None else max(0, int(lo) // c)
            i_hi = g if hi is None else min(g, -(-max(0, int(hi)) // c))
            lo_idx.append(min(i_lo, g))
            hi_idx.append(max(i_hi, min(i_lo, g)))
        box_lo = tuple(lo_idx)
        box_shape = tuple(h - l for l, h in zip(lo_idx, hi_idx))
        return box_lo, box_shape

    def partitions(self):
        """Range-arithmetic planning: prune to a per-dim index box, then
        split its flat index space into at most ``max_partitions``
        contiguous ranges. The I/O unit is the chunk — or the SHARD when
        sharded (one file open + one index fetch serves all its inner
        chunks). No per-chunk driver loop at any grid size."""
        m = self.meta
        units = m.shard_shape if m.chunks_per_shard is not None else m.chunks
        box_lo, box_shape = self._pruned_box(units)
        total = 1
        for s in box_shape:
            total *= s
        if total == 0:
            # fully pruned: one empty partition (Spark requires >= 1)
            return [ChunkRangePartition(box_lo, box_shape, 0, 0)]
        by_target = -(-total // self.target_chunks)
        n_parts = max(
            min(total, self.min_partitions), min(by_target, self.max_partitions)
        )
        per = -(-total // n_parts)
        return [
            ChunkRangePartition(box_lo, box_shape, s, min(s + per, total))
            for s in range(0, total, per)
        ]

    def _box_indices(self, part: ChunkRangePartition):
        for flat in range(part.start, part.end):
            rel = np.unravel_index(flat, part.box_shape)
            yield tuple(int(b + r) for b, r in zip(part.box_lo, rel))

    def _chunk_pruned(self, origin, extent) -> bool:
        for ax, o, e in zip(self.axes, origin, extent):
            b = self.bounds.get(ax)
            if not b:
                continue
            lo, hi = b
            if lo is not None and o + e <= lo:
                return True
            if hi is not None and o >= hi:
                return True
        return False

    def _chunk_batch(self, arr: np.ndarray, origin, extent) -> pa.RecordBatch:
        coords = np.meshgrid(
            *[np.arange(o, o + e, dtype=np.int64) for o, e in zip(origin, extent)],
            indexing="ij",
        )
        cols: dict[str, np.ndarray] = {}
        for ax, grid in zip(self.axes, coords):
            cols[ax] = grid.ravel()
        n = arr.size
        arrays = []
        for d in PIXEL_DIMS:
            arrays.append(pa.array(cols.get(d, np.zeros(n, dtype=np.int64))))
        if arr.dtype.kind == "c":
            flat = arr.ravel()
            arrays.append(
                pa.StructArray.from_arrays(
                    [
                        pa.array(flat.real.astype(np.float64)),
                        pa.array(flat.imag.astype(np.float64)),
                    ],
                    names=["re", "im"],
                )
            )
        else:
            arrays.append(pa.array(arr.astype(np.float64).ravel()))
        return pa.RecordBatch.from_arrays(arrays, names=list(PIXEL_DIMS) + ["v"])

    def _chunk_row_batch(self, arr: np.ndarray, cidx, extent) -> pa.RecordBatch:
        """One chunk-table row: indices + clipped extents + raw buffer.
        Payload bytes come from the canonical encoder (compressor=None ⇒
        raw little-endian C-order) so the chunk table can never diverge
        from what write paths produce (code-review r17)."""
        raw = encode_chunk(arr, None)
        idx_by_axis = dict(zip(self.axes, cidx))
        ext_by_axis = dict(zip(self.axes, extent))
        cols = []
        for d in PIXEL_DIMS:
            cols.append(pa.array([int(idx_by_axis.get(d, 0))], type=pa.int64()))
        for d in PIXEL_DIMS:
            cols.append(pa.array([int(ext_by_axis.get(d, 1))], type=pa.int64()))
        cols.append(pa.array([len(raw)], type=pa.int64()))
        cols.append(pa.array([raw], type=pa.binary()))
        names = (
            [f"ck_{d}" for d in PIXEL_DIMS]
            + [f"ex_{d}" for d in PIXEL_DIMS]
            + ["nbytes", "payload"]
        )
        return pa.RecordBatch.from_arrays(cols, names=names)

    def read(self, partition: ChunkRangePartition) -> Iterator[pa.RecordBatch]:
        store = open_store(self.path, self.storage_options)
        m = self.meta
        sharded = m.chunks_per_shard is not None
        for unit_idx in self._box_indices(partition):
            if sharded:
                # one shard: ONE index fetch serves every inner-chunk
                # ranged read (3 requests/chunk → 1/shard + 1/chunk)
                index = store.shard_index(m, unit_idx)
                if index is None and self.mode == "chunk":
                    continue  # never-written shard: no chunk-table rows
                cps = m.chunks_per_shard
                base = tuple(i * n for i, n in zip(unit_idx, cps))
                for flat in range(int(np.prod(cps))):
                    inner = np.unravel_index(flat, cps)
                    cidx = tuple(int(b + i) for b, i in zip(base, inner))
                    if any(ci >= g for ci, g in zip(cidx, m.chunk_grid)):
                        continue
                    origin = m.chunk_origin(cidx)
                    extent = m.chunk_extent(cidx)
                    if self._chunk_pruned(origin, extent):
                        continue
                    if self.mode == "chunk" and (
                        int(index[flat][0]) == 0xFFFFFFFFFFFFFFFF
                    ):
                        continue  # hole in the shard: not a stored chunk
                    arr = store.read_chunk_via_index(m, cidx, index)
                    if self.mode == "chunk":
                        yield self._chunk_row_batch(arr, cidx, extent)
                    else:
                        yield self._chunk_batch(arr, origin, extent)
            else:
                extent = m.chunk_extent(unit_idx)
                if self.mode == "chunk":
                    # chunk table = STORED chunks only: synthesizing
                    # fill rows for never-written chunks would densify
                    # every sparse copy prod(grid)/n_stored-fold
                    # (code-review r17); pixel mode stays dense — the
                    # pixel table IS the logical array contents
                    data = store.get_or_none(m.chunk_key(unit_idx))
                    if data is None:
                        continue
                    arr = decode_chunk(
                        data, m.dtype, m.chunks, m.compressor,
                        m.byte_order, m.order,
                    )[tuple(slice(0, e) for e in extent)]
                    yield self._chunk_row_batch(arr, unit_idx, extent)
                else:
                    arr = store.read_chunk(m, unit_idx)
                    yield self._chunk_batch(arr, m.chunk_origin(unit_idx), extent)


@dataclass
class ChunkWriteCommit(WriterCommitMessage):
    chunk_keys: list


class OmeZarrWriter(DataSourceArrowWriter):
    """Executor-side chunk assembly + put (S6 direct write shape)."""

    def __init__(self, options: dict, overwrite: bool):
        import json as _json

        self.path = options["path"]
        self.zarr_format = int(options.get("zarr_format", "2"))
        self.array_path = _resolve_array_path(options)
        # multi-array ("fleet") write: N same-shaped arrays in ONE job.
        # write_image_batch folds the array index into the packed chunk
        # key as its highest radix digit; array_paths[i] is array i's
        # node path. This is the plate-ingestion amortization — without
        # it a 384-field micro-batch pays 384 job schedulings.
        self.array_paths = (
            _json.loads(options["array_paths"]) if "array_paths" in options else None
        )
        self.packed = options.get("packed") == "true"
        self.storage_options = _parse_storage_options(options)
        if overwrite:
            # __init__ runs on the driver before tasks launch: clear the
            # array subtree so a rewrite with a different shape/chunk
            # grid can't leave stale chunk files behind (reference
            # semantics: zarr overwrite recreates the array node).
            st = open_store(self.path, self.storage_options)
            for p in self.array_paths or [self.array_path]:
                st.delete_prefix(p)
        shape = [int(s) for s in options["shape"].split(",")]
        chunks = [int(s) for s in options["chunks"].split(",")]
        dims = options.get("dims", ",".join(_axis_map(None, len(shape)))).split(",")
        self.dims = dims
        cps_opt = options.get("chunks_per_shard")
        cps = tuple(int(s) for s in cps_opt.split(",")) if cps_opt else None
        if self.array_paths is not None and cps is not None:
            raise ValueError("multi-array writes do not support sharding")
        self.meta = ZarrArrayMeta(
            path=self.array_path,
            shape=tuple(shape),
            chunks=tuple(chunks),
            dtype=np.dtype(options.get("dtype", "float64")),
            compressor=options.get("compressor") or None,
            zarr_format=self.zarr_format,
            dimension_names=dims if self.zarr_format == 3 else None,
            chunks_per_shard=cps,
        )

    def _meta_for(self, fid: int):
        """Per-array metadata in multi-array mode (same grid, different
        node path)."""
        if self.array_paths is None:
            return self.meta
        import dataclasses

        return dataclasses.replace(self.meta, path=self.array_paths[fid])

    def write(self, iterator: Iterator[pa.RecordBatch]) -> ChunkWriteCommit:
        """Input is pre-partitioned AND pre-sorted by chunk key
        (write_image), so each chunk's rows arrive contiguously: keep at
        most one chunk buffer in memory, flush when the key advances.
        (Unsorted input still works — a finished chunk just flushes and a
        reappearing key would overwrite, which sortedness precludes.)"""
        store = open_store(self.path, self.storage_options)
        m = self.meta
        multi = self.array_paths is not None
        if multi and not self.packed:
            raise ValueError("multi-array writes require the packed row form")
        n_chunks_per_array = int(np.prod(m.chunk_grid)) if multi else 0
        keys: list = []
        cur_fid: int = 0
        cur_idx: tuple | None = None
        cur_buf: np.ndarray | None = None
        # sharded writes buffer the current shard's finished chunks and
        # emit one shard file when the shard key advances (write_image
        # sorts rows by shard-then-chunk key, so both are contiguous)
        cur_shard: tuple | None = None
        shard_chunks: dict = {}

        def flush_shard():
            nonlocal cur_shard, shard_chunks
            if cur_shard is None or not shard_chunks:
                cur_shard, shard_chunks = None, {}
                return
            store.write_shard(m, cur_shard, shard_chunks)
            keys.append(m.shard_key(cur_shard))
            cur_shard, shard_chunks = None, {}

        def flush():
            nonlocal cur_idx, cur_buf, cur_shard
            if cur_idx is None:
                return
            mm = self._meta_for(cur_fid)
            extent = mm.chunk_extent(cur_idx)
            clipped = cur_buf[tuple(slice(0, e) for e in extent)]
            if mm.chunks_per_shard is not None:
                sidx, inner = mm.shard_index_of(cur_idx)
                if cur_shard is not None and sidx != cur_shard:
                    flush_shard()
                cur_shard = sidx
                shard_chunks[inner] = clipped
            else:
                store.write_chunk(mm, cur_idx, clipped)
                keys.append(mm.chunk_key(cur_idx))
            cur_idx, cur_buf = None, None

        for batch in iterator:
            if batch.num_rows == 0:
                continue
            # Arrow → numpy directly (vectorized, zero-copy for the
            # non-null numeric columns here); to_pydict would box every
            # cell into a Python object first — measured ~2s/8M rows
            vcol = batch.column("v")
            is_struct = pa.types.is_struct(vcol.type)
            if (m.dtype.kind == "c") != is_struct:
                # dispatching on the DECLARED dtype alone dies with an
                # opaque AttributeError deep in the task when the actual
                # column disagrees (code-review r17)
                raise ValueError(
                    f"write dtype {m.dtype} requires "
                    f"{'struct<re,im>' if m.dtype.kind == 'c' else 'numeric'}"
                    f" v column, got {vcol.type}"
                )
            if vcol.null_count and not is_struct:
                # NULL pixels reach numpy as NaN, and NaN.astype(int)
                # is platform-dependent garbage (code-review r17); a
                # missing value IS the fill value. (Complex targets are
                # float-based — their null→NaN path is representable.)
                vcol = vcol.fill_null(float(m.fill_value))
            if m.dtype.kind == "c":
                # struct<re,im> rows → native complex buffer (the only
                # place the two halves meet; disk gets true <c8/<c16)
                vals = vcol.field("re").to_numpy(
                    zero_copy_only=False
                ).astype(np.float64) + 1j * vcol.field("im").to_numpy(
                    zero_copy_only=False
                ).astype(np.float64)
            else:
                vals = vcol.to_numpy(zero_copy_only=False)
            if self.packed:
                # (ck, off) mixed-radix form from write_image: decode
                # per-dim chunk indices and within-chunk coords with
                # vectorized divmods (last dim fastest, matching the
                # fold order on the Spark side)
                ck = batch.column("ck").to_numpy(zero_copy_only=False).astype(np.int64)
                off = batch.column("off").to_numpy(zero_copy_only=False).astype(np.int64)
                if multi:
                    fids = ck // n_chunks_per_array
                    ck = ck % n_chunks_per_array
                else:
                    fids = None
                chunk_ids = [None] * len(m.chunks)
                rem = ck
                for i in range(len(m.chunk_grid) - 1, 0, -1):
                    chunk_ids[i] = rem % m.chunk_grid[i]
                    rem = rem // m.chunk_grid[i]
                chunk_ids[0] = rem
                local_cols = [None] * len(m.chunks)
                rem = off
                for i in range(len(m.chunks) - 1, 0, -1):
                    local_cols[i] = rem % m.chunks[i]
                    rem = rem // m.chunks[i]
                local_cols[0] = rem
                coord_cols = None
            else:
                coord_cols = [
                    batch.column(d).to_numpy(zero_copy_only=False).astype(np.int64)
                    for d in self.dims
                ]
                chunk_ids = [c // s for c, s in zip(coord_cols, m.chunks)]
                local_cols = None
            flat = chunk_ids[0]
            grid = m.chunk_grid
            for g, ci in zip(grid[1:], chunk_ids[1:]):
                flat = flat * g + ci
            if m.chunks_per_shard is not None:
                # order by (shard, chunk): flat chunk order interleaves
                # shards, which would flush (and overwrite) a shard file
                # more than once
                sgrid = m.shard_grid
                sflat = chunk_ids[0] // m.chunks_per_shard[0]
                for sg, ci, cp in zip(sgrid[1:], chunk_ids[1:], m.chunks_per_shard[1:]):
                    sflat = sflat * sg + ci // cp
                sortkey = sflat * int(np.prod(grid)) + flat
            elif multi:
                # fid is the highest radix digit, so same-array chunks
                # stay contiguous and each (fid, chunk) flushes once
                sortkey = fids * n_chunks_per_array + flat
            else:
                sortkey = flat
            order = np.argsort(sortkey, kind="stable")
            flat_sorted = sortkey[order]
            boundaries = np.flatnonzero(np.diff(flat_sorted)) + 1
            groups = np.split(order, boundaries)
            for grp in groups:
                i0 = grp[0]
                idx = tuple(int(ci[i0]) for ci in chunk_ids)
                fid = int(fids[i0]) if multi else 0
                if idx != cur_idx or fid != cur_fid:
                    flush()
                    cur_fid = fid
                    cur_idx = idx
                    cur_buf = np.full(m.chunks, m.fill_value, dtype=m.dtype)
                if local_cols is not None:
                    local = tuple(lc[grp] for lc in local_cols)
                else:
                    local = tuple(
                        c[grp] - i * s for c, i, s in zip(coord_cols, idx, m.chunks)
                    )
                cur_buf[local] = vals[grp].astype(m.dtype)
        flush()
        flush_shard()
        return ChunkWriteCommit(chunk_keys=keys)

    def commit(self, messages):
        """Publish every array's metadata in ONE batched store call:
        docs fan out concurrently and an existing consolidated document
        syncs once for the whole job (StoreBase.put_json_many) — at a
        384-field plate the old per-array write_array_meta loop issued
        768 serial PUTs, each with its own consolidated read-modify-
        write (VERDICT r15 ask #5)."""
        store = open_store(self.path, self.storage_options)
        attrs = None
        if self.zarr_format == 2:
            attrs = {"_ARRAY_DIMENSIONS": list(self.dims)}
        docs: dict = {}
        for fid in range(len(self.array_paths) if self.array_paths else 1):
            m = self._meta_for(fid)
            if m.zarr_format == 3:
                doc = m.to_v3_json()
                if attrs:
                    doc["attributes"] = attrs
                docs[f"{m.path}/zarr.json"] = doc
            else:
                docs[f"{m.path}/.zarray"] = m.to_v2_json()
                if attrs:
                    docs[f"{m.path}/.zattrs"] = attrs
        store.put_json_many(docs)

    def abort(self, messages):
        """Best-effort cleanup of chunks written by tasks that committed
        before the job failed (messages may contain None for failed
        tasks)."""
        store = open_store(self.path, self.storage_options)
        for msg in messages or []:
            if msg is None:
                continue
            for key in msg.chunk_keys:
                if store.exists(key):
                    store.delete(key)


class OmeZarrDataSource(DataSource):
    """spark.read.format("ome_zarr") / df.write.format("ome_zarr")."""

    @classmethod
    def name(cls) -> str:
        return "ome_zarr"

    def schema(self):
        if self.options.get("mode", "pixel") == "chunk":
            return CHUNK_SCHEMA
        # reads of a complex array surface v as struct<re,im>; a write
        # target may not exist yet (schema comes from the input df then)
        try:
            meta = self._read_meta()
            if np.dtype(meta.dtype).kind == "c":
                return COMPLEX_PIXEL_SCHEMA
        except (FileNotFoundError, KeyError):
            # genuinely absent array: the write-target case. Transient
            # store errors must SURFACE here — swallowing them declared
            # PIXEL_SCHEMA for a readable complex array and every read
            # task then died on an Arrow schema mismatch instead of the
            # real store failure (code-review r17)
            pass
        return PIXEL_SCHEMA

    def _read_meta(self):
        """Array metadata, fetched once per DataSource instance: schema()
        and the reader previously each paid their own open_store +
        metadata GET + v2 separator probes at planning time
        (code-review r17)."""
        cached = getattr(self, "_meta_cache", None)
        if cached is None:
            store = open_store(
                self.options["path"], _parse_storage_options(self.options)
            )
            cached = store.read_array_meta(
                _resolve_array_path(self.options),
                int(self.options.get("zarr_format", "2")),
            )
            self._meta_cache = cached
        return cached

    def reader(self, schema) -> OmeZarrReader:
        try:
            meta = self._read_meta()
        except (FileNotFoundError, KeyError):
            meta = None  # reader re-raises with its own open
        return OmeZarrReader(self.options, meta=meta)

    def writer(self, schema, overwrite: bool) -> OmeZarrWriter:
        return OmeZarrWriter(self.options, overwrite)


def register(spark) -> None:
    # chunk pruning via pushFilters needs the (off-by-default) Python
    # data source pushdown flag; runtime-settable
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # Idempotent: repeat registration on the same session (or a
    # streaming micro-batch clone that inherited it) raises
    # DATA_SOURCE_ALREADY_EXISTS — same datasource, nothing to do, and
    # catching it stays on public API (a JVM sessionState reach-through
    # breaks under Spark Connect).
    # NOTE: registration does NOT propagate into already-running
    # streaming queries (micro-batch clones copy the manager at stream
    # start), so any foreachBatch that writes format("ome_zarr") must
    # register before .start() — see streaming/pipeline.py.
    from pyspark.errors import AnalysisException

    try:
        spark.dataSource.register(OmeZarrDataSource)
    except AnalysisException as exc:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
            raise
