"""Golden-store byte parity (J4): rewriting the deterministic golden
inputs must reproduce the COMMITTED stores key-by-key, byte-for-byte
(chunks) and structurally (JSON metadata). Catches any unintended
change to chunk encoding, codec framing, shard layout, or metadata
across rounds — the engine's analog of the reference's committed
baseline stores (/root/reference py/test/_data.py:104-177).

Regenerate intentionally with: python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_golden import GOLDEN_DIR, write_golden_stores  # noqa: E402

from ngff_zarr_spark.compare import store_diff  # noqa: E402


@pytest.fixture(scope="module")
def fresh_stores(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("golden_fresh"))
    names = write_golden_stores(spark, base)
    return base, names


def test_golden_stores_exist():
    assert os.path.isdir(GOLDEN_DIR), "run tools/make_golden.py"
    assert any(n.endswith(".ome.zarr") for n in os.listdir(GOLDEN_DIR))


def test_fresh_write_matches_golden(fresh_stores):
    base, names = fresh_stores
    for name in names:
        golden = os.path.join(GOLDEN_DIR, name)
        fresh = os.path.join(base, name)
        assert os.path.isdir(golden), f"missing committed golden {name}"
        diff = store_diff(golden, fresh)
        assert diff == [], f"{name}: {diff}"
