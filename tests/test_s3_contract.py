"""S2 end-to-end over an s3:// URL: the FULL DataSource path —
``spark.read.format("ome_zarr").load()`` with ``storage_options``,
partition planning, pushFilters pruning, and EXECUTOR-side chunk
decode — through an object-store scheme, not just OmeZarrReader unit
scope (VERDICT r7 ask #4).

fsspec/s3fs are not installed in this image, so the test ships a FAKE
``fsspec`` package to driver and executors (``sc.addPyFile``): its
``url_to_fs`` resolves ``s3://bucket/...`` keys onto a local directory
named by ``storage_options["base_dir"]`` and REFUSES to work without
it — so the read succeeding proves the credentials/options actually
reached every executor's store handle, and every byte moves through
FsspecStore's ranged-read surface exactly as it would over s3fs.
"""

import json
import os
import sys
import textwrap
import zipfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.sources.zarr_store import ZarrArrayMeta, ZarrStore

_FAKE_CORE = textwrap.dedent(
    '''
    """Fake fsspec.core for the s3:// contract test: maps bucket-rooted
    keys onto a local directory given by storage_options["base_dir"]
    (no option => error, proving options plumbing end-to-end)."""
    import os


    class _DirFS:
        def __init__(self, base):
            self.base = base

        def _p(self, path):
            parts = path.split("/")
            return os.path.join(self.base, *parts[1:])  # drop bucket

        def open(self, path, mode="rb"):
            p = self._p(path)
            if "w" in mode:
                os.makedirs(os.path.dirname(p), exist_ok=True)
            return open(p, mode if "b" in mode else mode + "b")

        def exists(self, path):
            return os.path.exists(self._p(path))

        def rm(self, path):
            os.remove(self._p(path))

        def find(self, base):
            root = self._p(base)
            bucket = base.split("/")[0]
            if os.path.isfile(root):
                return [base]
            if not os.path.isdir(root):
                raise FileNotFoundError(base)
            out = []
            for d, _, names in os.walk(root):
                for n in names:
                    rel = os.path.relpath(os.path.join(d, n), self.base)
                    out.append(bucket + "/" + rel.replace(os.sep, "/"))
            return sorted(out)


    def url_to_fs(url, **storage_options):
        if url.split("://", 1)[0] not in ("s3", "s3a", "gs", "gcs", "az", "abfs"):
            raise ValueError(f"fake fsspec only handles object schemes, got {url}")
        base = storage_options.get("base_dir")
        if not base:
            raise PermissionError(
                "storage_options did not reach url_to_fs (missing base_dir) "
                "- the credential plumbing is broken"
            )
        return _DirFS(base), url.split("://", 1)[1]
    '''
)


@pytest.fixture()
def fake_fsspec_zip(spark, tmp_path_factory):
    """Build the fake fsspec package zip, ship it to executors, and put
    it on the driver path; undo the driver side afterwards."""
    d = tmp_path_factory.mktemp("fakefsspec")
    # unique zip NAME per test: Spark refuses to re-add a file whose
    # basename was already registered from a different path
    zip_path = str(d / f"fake_fsspec_{os.path.basename(d)}.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        z.writestr("fsspec/__init__.py", "from . import core  # noqa: F401\n")
        z.writestr("fsspec/core.py", _FAKE_CORE)
    had = dict((k, sys.modules[k]) for k in ("fsspec", "fsspec.core") if k in sys.modules)
    spark.sparkContext.addPyFile(zip_path)  # executors + driver sys.path
    try:
        yield zip_path
    finally:
        for k in ("fsspec", "fsspec.core"):
            sys.modules.pop(k, None)
        sys.modules.update(had)
        sys.path[:] = [p for p in sys.path if "fake_fsspec" not in p]


def _seed_store(root: str) -> tuple[ZarrArrayMeta, np.ndarray]:
    """A (z=5, y=6, x=7) uint16 v2 array, chunks (2,3,4) — edge chunks
    on every axis — written with the local store layer."""
    store = ZarrStore(root)
    vol = (np.arange(5 * 6 * 7, dtype=np.uint16) * 7 % 251).reshape(5, 6, 7)
    meta = ZarrArrayMeta(
        path="scale0/image", shape=(5, 6, 7), chunks=(2, 3, 4),
        dtype=np.dtype("uint16"), compressor="gzip",
    )
    store.write_array_meta(meta)
    for idx in np.ndindex(*meta.chunk_grid):
        o = meta.chunk_origin(idx)
        e = meta.chunk_extent(idx)
        store.write_chunk(
            meta, idx,
            vol[o[0]:o[0]+e[0], o[1]:o[1]+e[1], o[2]:o[2]+e[2]],
        )
    return meta, vol


def test_s3_datasource_end_to_end(spark, tmp_path, fake_fsspec_zip):
    """spark.read.format('ome_zarr').load() over s3://bucket/... with
    storage_options: executor-side decode through the fsspec surface
    equals the local read, and ROI pushdown prunes partitions against
    the remote store."""
    from ngff_zarr_spark.ome_zarr_api import read_image

    root = str(tmp_path / "img.ome.zarr")
    _, vol = _seed_store(root)
    opts = {"base_dir": str(tmp_path)}
    url = "s3://bucket/img.ome.zarr"

    got = read_image(
        spark, url, "scale0/image", 2, storage_options=opts
    ).select("z", "y", "x", "v").collect()
    assert len(got) == vol.size
    for r in got[:: max(1, len(got) // 50)]:
        assert r.v == float(vol[r.z, r.y, r.x])

    # ROI predicate through the full SQL path: executor decode + exact
    # row filter agree with numpy
    roi = (
        read_image(spark, url, "scale0/image", 2, storage_options=opts)
        .filter((F.col("z") < 2) & (F.col("y") >= 3) & (F.col("x") < 4))
        .select("z", "y", "x", "v")
    )
    rows = sorted(map(tuple, roi.collect()))
    want = sorted(
        (z, y, x, float(vol[z, y, x]))
        for z in range(2) for y in range(3, 6) for x in range(4)
    )
    assert rows == want

    # pruning happened against the REMOTE store before task launch
    from pyspark.sql.datasource import LessThan

    from ngff_zarr_spark.sources.ome_zarr import OmeZarrReader

    r = OmeZarrReader(
        {
            "path": url,
            "array_path": "scale0/image",
            "zarr_format": "2",
            "storage_options": json.dumps(opts),
            "min_partitions": "1",
            "target_chunks_per_partition": "1",
        }
    )
    n_full = len(r.partitions())
    r.pushFilters([LessThan(("z",), 2), LessThan(("x",), 4)])
    assert len(r.partitions()) < n_full


def test_s3_requires_storage_options(spark, tmp_path, fake_fsspec_zip):
    """Without storage_options the fake filesystem refuses — the read
    must fail, proving options are not coming from anywhere else."""
    from ngff_zarr_spark.ome_zarr_api import read_image

    root = str(tmp_path / "img.ome.zarr")
    _seed_store(root)
    with pytest.raises(Exception, match="base_dir|PermissionError"):
        read_image(spark, "s3://bucket/img.ome.zarr", "scale0/image", 2).collect()
