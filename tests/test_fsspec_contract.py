"""S2 object-store contract test: FsspecStore's key-bytes surface over
a fake in-memory filesystem implementing the fsspec API subset the
store uses (open/exists/rm/find). fsspec itself is not installed in
this image — the fake proves the s3/gs/az code path's byte logic
(keys, ranged reads, suffix reads, listing) without network or deps.
"""

import io

import numpy as np
import pytest

from ngff_zarr_spark.sources.zarr_store import FsspecStore, ZarrArrayMeta


class _FakeFile(io.BytesIO):
    def __init__(self, fs, path, mode, data=b""):
        super().__init__(data)
        self._fs = fs
        self._path = path
        self._mode = mode

    def close(self):
        if "w" in self._mode:
            self._fs.files[self._path] = self.getvalue()
        super().close()


class FakeFS:
    """In-memory stand-in for an fsspec AbstractFileSystem: flat
    key→bytes mapping, like an object store (no real directories)."""

    def __init__(self):
        self.files: dict[str, bytes] = {}

    def open(self, path, mode="rb"):
        if "r" in mode:
            if path not in self.files:
                raise FileNotFoundError(path)
            return _FakeFile(self, path, mode, self.files[path])
        return _FakeFile(self, path, mode)

    def exists(self, path):
        return path in self.files

    def rm(self, path):
        del self.files[path]

    def find(self, base):
        prefix = base.rstrip("/") + "/"
        hits = [p for p in self.files if p.startswith(prefix) or p == base.rstrip("/")]
        if not hits:
            raise FileNotFoundError(base)
        return sorted(hits)


@pytest.fixture()
def store():
    return FsspecStore(FakeFS(), "bucket/data/img.ome.zarr")


def test_put_get_exists_delete(store):
    assert not store.exists("a/b")
    store.put("a/b", b"hello")
    assert store.exists("a/b")
    assert store.get("a/b") == b"hello"
    # keys are rooted under the bucket prefix (the s3://bucket/... layout)
    assert "bucket/data/img.ome.zarr/a/b" in store.fs.files
    store.delete("a/b")
    assert not store.exists("a/b")


def test_ranged_and_suffix_reads(store):
    store.put("k", bytes(range(100)))
    assert store.get_range("k", 10, 5) == bytes(range(10, 15))
    assert store.get_suffix("k", 4) == bytes(range(96, 100))


def test_list_keys(store):
    store.put("scale0/image/.zarray", b"{}")
    store.put("scale0/image/0/0", b"x")
    store.put("scale1/image/.zarray", b"{}")
    assert store.list_keys("scale0") == ["scale0/image/.zarray", "scale0/image/0/0"]
    assert len(store.list_keys()) == 3
    assert store.list_keys("nope") == []


def test_array_roundtrip_through_fake_object_store(store):
    """Full array-level logic (metadata JSON, chunk encode/decode,
    edge-chunk clipping) over the object-store byte surface."""
    vol = np.arange(4 * 5, dtype=np.uint16).reshape(4, 5)
    meta = ZarrArrayMeta(
        path="scale0/image", shape=(4, 5), chunks=(2, 4),
        dtype=np.dtype("uint16"), compressor="blosc:lz4:5:1",
    )
    store.write_array_meta(meta)
    for iy in range(2):
        for ix in range(2):
            o = meta.chunk_origin((iy, ix))
            e = meta.chunk_extent((iy, ix))
            store.write_chunk(meta, (iy, ix), vol[o[0]:o[0]+e[0], o[1]:o[1]+e[1]])
    back = store.read_array_meta("scale0/image", 2)
    assert back.shape == (4, 5) and back.chunks == (2, 4)
    out = np.zeros_like(vol)
    for iy in range(2):
        for ix in range(2):
            o = meta.chunk_origin((iy, ix))
            e = meta.chunk_extent((iy, ix))
            out[o[0]:o[0]+e[0], o[1]:o[1]+e[1]] = store.read_chunk(back, (iy, ix))
    assert np.array_equal(out, vol)


def test_sharded_ranged_reads_on_object_store(store):
    """Sharded read path = one suffix GET (index) + one ranged GET per
    chunk — exactly the object-store access pattern S8 promises."""
    meta = ZarrArrayMeta(
        path="a", shape=(4, 4), chunks=(2, 2), dtype=np.dtype("int32"),
        compressor="zstd", zarr_format=3, chunks_per_shard=(2, 2),
    )
    vals = {
        (0, 0): np.full((2, 2), 1, np.int32),
        (1, 1): np.full((2, 2), 9, np.int32),
    }
    store.write_shard(meta, (0, 0), vals)
    idx = store.shard_index(meta, (0, 0))
    assert idx is not None
    a = store.read_chunk_via_index(meta, (0, 0), idx)
    b = store.read_chunk_via_index(meta, (1, 1), idx)
    missing = store.read_chunk_via_index(meta, (0, 1), idx)
    assert np.array_equal(a, vals[(0, 0)]) and np.array_equal(b, vals[(1, 1)])
    assert (missing == 0).all()


def test_storage_options_reach_datasource(monkeypatch):
    """S2 parity with the reference's storage_options passthrough
    (from_ngff_zarr.py:69-80): options serialized into the DataSource
    as JSON must reach fsspec's url_to_fs when the reader opens an
    object-store URL, and the reader must plan partitions through the
    resulting filesystem."""
    import json
    import sys
    import types

    fs = FakeFS()
    seeded = FsspecStore(fs, "bucket/img")
    meta = ZarrArrayMeta(
        path="scale0/image", shape=(4, 5), chunks=(2, 4),
        dtype=np.dtype("uint16"), compressor="gzip",
    )
    seeded.write_array_meta(meta)
    seeded.write_chunk(meta, (0, 0), np.arange(8, dtype=np.uint16).reshape(2, 4))

    captured = {}
    fake = types.ModuleType("fsspec")
    core = types.ModuleType("fsspec.core")

    def url_to_fs(url, **opts):
        captured.clear()
        captured.update(opts)
        return fs, url.split("://", 1)[1]

    core.url_to_fs = url_to_fs
    fake.core = core
    monkeypatch.setitem(sys.modules, "fsspec", fake)
    monkeypatch.setitem(sys.modules, "fsspec.core", core)

    from ngff_zarr_spark.sources.ome_zarr import OmeZarrReader

    opts = {"key": "AK", "secret": "xx", "client_kwargs": {"endpoint_url": "http://minio:9000"}}
    r = OmeZarrReader(
        {
            "path": "s3://bucket/img",
            "array_path": "scale0/image",
            "zarr_format": "2",
            "storage_options": json.dumps(opts),
        }
    )
    assert captured == opts
    assert r.meta.shape == (4, 5)
    assert len(r.partitions()) >= 1
    # executor read path uses the same handle shape: decode one chunk
    part = r.partitions()[0]
    batches = list(r.read(part))
    assert sum(b.num_rows for b in batches) > 0
