"""S2 remote stores: HttpStore over a live local HTTP server.

The reference reads http(s) OME-Zarr URLs through fsspec
(from_ngff_zarr.py:69-80); this engine serves the same capability with
stdlib urllib so no extra dependency is needed. These tests run a real
HTTP server (one Range-capable, one Range-ignoring) over the
byte-pinned golden stores and prove the full read path — store layer,
sharded ranged reads, and from_ngff_zarr → pixel DataFrame — is
byte-identical to the local-filesystem path.
"""

import os
import threading
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler

import numpy as np
import pytest

from ngff_zarr_spark.sources.zarr_store import HttpStore, ZarrStore, open_store

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


class RangeHandler(SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler ignores Range; real object-store HTTP
    frontends honor it. This handler implements RFC-7233 single ranges
    (bytes=a-b and suffix bytes=-n) so the two-ranged-GET shard path is
    exercised the way it runs in production."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        rng = self.headers.get("Range")
        path = self.translate_path(self.path)
        if rng is None or not os.path.isfile(path):
            return super().do_GET()
        size = os.path.getsize(path)
        spec = rng.split("=", 1)[1]
        start_s, _, end_s = spec.partition("-")
        if start_s == "":  # suffix range: bytes=-n
            length = int(end_s)
            start = max(0, size - length)
            end = size - 1
        else:
            start = int(start_s)
            end = int(end_s) if end_s else size - 1
        end = min(end, size - 1)
        with open(path, "rb") as f:
            f.seek(start)
            body = f.read(end - start + 1)
        self.send_response(206)
        self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


class NoRangeHandler(SimpleHTTPRequestHandler):
    def log_message(self, *a):
        pass


def _serve(handler_cls):
    handler = partial(handler_cls, directory=GOLDEN)
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


@pytest.fixture(scope="module")
def http_base():
    srv, base = _serve(RangeHandler)
    yield base
    srv.shutdown()


@pytest.fixture(scope="module")
def http_base_norange():
    srv, base = _serve(NoRangeHandler)
    yield base
    srv.shutdown()


def test_open_store_schemes(http_base):
    assert isinstance(open_store("/tmp/x"), ZarrStore)
    assert isinstance(open_store("file:///tmp/x"), ZarrStore)
    assert isinstance(open_store(f"{http_base}/x"), HttpStore)


def test_http_get_and_ranges(http_base):
    store = HttpStore(f"{http_base}/v04_gzip.ome.zarr")
    local = ZarrStore(os.path.join(GOLDEN, "v04_gzip.ome.zarr"))
    key = ".zattrs"
    raw = local.get(key)
    assert store.get(key) == raw
    assert store.get_range(key, 5, 20) == raw[5:25]
    assert store.get_suffix(key, 13) == raw[-13:]
    assert store.exists(key)
    assert not store.exists("definitely/not/a/key")
    with pytest.raises(NotImplementedError):
        store.put("k", b"x")


def test_http_range_fallback(http_base_norange):
    """A server that ignores Range (responds 200 with the full body)
    must still produce correct ranged reads via the slice fallback."""
    store = HttpStore(f"{http_base_norange}/v04_gzip.ome.zarr")
    local = ZarrStore(os.path.join(GOLDEN, "v04_gzip.ome.zarr"))
    raw = local.get(".zattrs")
    assert store.get_range(".zattrs", 5, 20) == raw[5:25]
    assert store.get_suffix(".zattrs", 13) == raw[-13:]


@pytest.mark.parametrize("name,zfmt", [("v04_blosc_u16.ome.zarr", 2), ("v05_zstd_sharded.ome.zarr", 3)])
def test_http_chunks_match_local(http_base, name, zfmt):
    """Every chunk read over HTTP — including through the sharded
    two-ranged-GET path — equals the local-FS read."""
    remote = HttpStore(f"{http_base}/{name}")
    local = ZarrStore(os.path.join(GOLDEN, name))
    meta_l = local.read_array_meta("scale0/image", zfmt)
    meta_r = remote.read_array_meta("scale0/image", zfmt)
    assert meta_l == meta_r
    for flat in range(int(np.prod(meta_l.chunk_grid))):
        idx = tuple(int(i) for i in np.unravel_index(flat, meta_l.chunk_grid))
        np.testing.assert_array_equal(
            remote.read_chunk(meta_r, idx), local.read_chunk(meta_l, idx)
        )


def test_from_ngff_zarr_http(spark, http_base):
    """Full S1-over-S2: the pixel table read from an http:// URL is
    identical to the one read from the local path."""
    from ngff_zarr_spark.ome_zarr_api import from_ngff_zarr

    ms_http = from_ngff_zarr(spark, f"{http_base}/v05_zstd_sharded.ome.zarr")
    ms_local = from_ngff_zarr(spark, os.path.join(GOLDEN, "v05_zstd_sharded.ome.zarr"))
    cols = ms_local.images[0].data.columns
    rows_http = sorted(map(tuple, ms_http.images[0].data.select(*cols).collect()))
    rows_local = sorted(map(tuple, ms_local.images[0].data.select(*cols).collect()))
    assert rows_http == rows_local
    assert len(rows_local) > 0
