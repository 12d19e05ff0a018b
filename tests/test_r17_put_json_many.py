"""r17 (ADVICE r16 #2): put_json_many hardening.

- The pooled put path is opt-in via THREAD_SAFE_PUTS (True for the
  built-in local/fsspec stores; False on StoreBase, so an unknown
  subclass gets the serial path).
- A failed put no longer aborts the batch mid-flight: every put is
  attempted, then ONE aggregate error names the exact failed-key set,
  and the consolidated sync is skipped for a failed batch.
"""

from __future__ import annotations

import concurrent.futures
import json

import pytest

from ngff_zarr_spark.sources.zarr_store import (
    FsspecStore,
    HttpStore,
    StoreBase,
    ZarrStore,
)


class _FlakyStore(ZarrStore):
    """Local store that fails puts for a chosen key set."""

    def __init__(self, root, fail_keys):
        super().__init__(root)
        self.fail_keys = set(fail_keys)
        self.attempted = []

    def put(self, key, data):
        self.attempted.append(key)
        if key in self.fail_keys:
            raise IOError(f"injected put failure for {key}")
        super().put(key, data)


def _docs(n):
    return {f"{i}/.zattrs": {"i": i} for i in range(n)}


def test_thread_safety_flags():
    assert StoreBase.THREAD_SAFE_PUTS is False
    assert ZarrStore.THREAD_SAFE_PUTS is True
    assert FsspecStore.THREAD_SAFE_PUTS is True
    # read-only store: no pooled-write opt-in (its put raises anyway)
    assert HttpStore.THREAD_SAFE_PUTS is False


def test_aggregate_error_names_failed_keys(tmp_path):
    st = _FlakyStore(tmp_path / "s", ["2/.zattrs", "5/.zattrs"])
    docs = _docs(8)
    with pytest.raises(RuntimeError) as exc:
        st.put_json_many(docs)
    msg = str(exc.value)
    assert "2/8" in msg
    assert "2/.zattrs" in msg and "5/.zattrs" in msg
    # every put was attempted despite the failures — the landed set is
    # explicit, not whatever a mid-flight abort happened to reach
    assert sorted(st.attempted) == sorted(docs)
    for k in docs:
        assert st.exists(k) == (k not in st.fail_keys)
    # retry after the fault clears is a clean overwrite
    st.fail_keys.clear()
    st.put_json_many(docs)
    for k, d in docs.items():
        assert json.loads(st.get(k)) == d


def test_failed_batch_skips_consolidated_sync(tmp_path):
    st = _FlakyStore(tmp_path / "s", [])
    st.put_json(".zgroup", {"zarr_format": 2})
    st.consolidate_metadata_v2()
    st.fail_keys = {"1/.zattrs"}
    with pytest.raises(RuntimeError):
        st.put_json_many(_docs(3))
    zm = json.loads(st.get(".zmetadata"))
    # no failed batch's keys were published into the consolidated doc
    assert "0/.zattrs" not in zm["metadata"]


def test_serial_path_when_not_thread_safe(tmp_path, monkeypatch):
    """A THREAD_SAFE_PUTS=False store must never construct the pool."""

    class _Boom:
        def __init__(self, *a, **k):
            raise AssertionError("pool constructed for non-thread-safe store")

    monkeypatch.setattr(concurrent.futures, "ThreadPoolExecutor", _Boom)

    class _SerialStore(ZarrStore):
        THREAD_SAFE_PUTS = False

    st = _SerialStore(tmp_path / "s")
    docs = _docs(5)
    st.put_json_many(docs)
    for k, d in docs.items():
        assert json.loads(st.get(k)) == d

    # and the opted-in store DOES take the pooled path
    st2 = ZarrStore(tmp_path / "s2")
    with pytest.raises(AssertionError, match="pool constructed"):
        st2.put_json_many(docs)
