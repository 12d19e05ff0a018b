"""Gate-sensitivity checks: the oracle comparison must actually FAIL
when the engine is subtly wrong — a gate that cannot fail is not
evidence. Two layers:

1. Comparator sensitivity (pure): the normalize/compare logic of
   tools/check_correctness.py flags a changed value, a dropped row, a
   renamed column, and a same-rowcount multiset change; the documented
   9-significant-digit float canon absorbs representation noise ONLY.
2. End-to-end operator sensitivity: three real gates are re-run
   against their DuckDB oracles with a subtly perturbed implementation
   (one convolution weight bumped, floor-crop removed, mode tie-break
   flipped) — each perturbation must produce a detected mismatch, and
   the unperturbed run must still match.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "check_correctness", os.path.join(REPO, "tools", "check_correctness.py")
)
_cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cc)
normalize = _cc.normalize


def _mismatch(s_rows, s_cols, d_rows, d_cols) -> bool:
    """The driver-gate verdict, mirroring tools/check_correctness.py."""
    if len(s_rows) != len(d_rows):
        return True
    if sorted(s_cols) != sorted(d_cols):
        return True
    return normalize(s_rows, s_cols) != normalize(d_rows, d_cols)


# ---------------------------------------------------------------- layer 1


def test_comparator_flags_each_defect_class():
    cols = ["a", "b"]
    rows = [(1, 10.0), (2, 20.0), (3, 20.0)]
    assert not _mismatch(rows, cols, list(rows), list(cols))
    # changed value
    assert _mismatch([(1, 10.0), (2, 21.0), (3, 20.0)], cols, rows, cols)
    # dropped row
    assert _mismatch(rows[:2], cols, rows, cols)
    # renamed column
    assert _mismatch(rows, ["a", "c"], rows, cols)
    # same rowcount, different multiset (a dup replacing a distinct row)
    assert _mismatch([(1, 10.0), (2, 20.0), (2, 20.0)], cols, rows, cols)
    # column ORDER is immaterial (driver sorts by name before hashing)
    assert not _mismatch(
        [(10.0, 1), (20.0, 2), (20.0, 3)], ["b", "a"], rows, cols
    )


def test_comparator_float_canon_is_9_significant_digits():
    """The documented tolerance: representation noise (≥10th sig digit)
    is absorbed; anything at the 9th digit or coarser is a mismatch.
    Queries are designed for exact equality anyway (integer/decimal
    outputs) — this pins that the rounding cannot mask a real diff in
    the digits that matter."""
    cols = ["v"]
    base = [(1.23456789012345,)]
    noise = [(1.23456789012399,)]      # differs past the 9th sig digit
    real = [(1.23456798,)]             # differs at the 8th-9th sig digit
    assert not _mismatch(base, cols, noise, cols)
    assert _mismatch(base, cols, real, cols)


# ---------------------------------------------------------------- layer 2

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con


def _gate_verdict(spark, oracle_con, key) -> bool:
    """True = mismatch detected for registry entry ``key``."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    sdf = entry.queries()[key](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(entry.oracle_sql()[key])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    return _mismatch(s_rows, s_cols, d_rows, d_cols)


def test_a1_gaussian_catches_wrong_weight(spark, oracle_con, monkeypatch):
    """+1 on one fixed-point convolution tap must hash-mismatch."""
    from ngff_zarr_spark.operators import gaussian as G

    assert not _gate_verdict(spark, oracle_con, "a1_gaussian")
    orig = G.kernel_weights

    def bumped(*a, **k):
        w = list(orig(*a, **k))
        w[1] = w[1] + 1
        return w

    monkeypatch.setattr(G, "kernel_weights", bumped)
    assert _gate_verdict(spark, oracle_con, "a1_gaussian")


def test_a2_bin_shrink_catches_missing_crop(spark, oracle_con, monkeypatch):
    """Dropping the floor-crop keeps trailing partial blocks (IMG3D's
    y=67/x=65 are not factor-divisible) — rowcount mismatch."""
    from ngff_zarr_spark.operators import downsample as DS

    assert not _gate_verdict(spark, oracle_con, "a2_bin_shrink")
    monkeypatch.setattr(DS, "crop_to_factor", lambda df, shape, factors: df)
    assert _gate_verdict(spark, oracle_con, "a2_bin_shrink")


def test_a3_label_catches_flipped_tiebreak(spark, oracle_con, monkeypatch):
    """Largest-label-wins instead of smallest must change some of the
    4096 blocks' argmax (4 center voxels per block, small label mod →
    count ties are plentiful in the deterministic fixture)."""
    from pyspark.sql import functions as F

    from ngff_zarr_spark.operators import downsample as DS

    assert not _gate_verdict(spark, oracle_con, "a3_label_downsample")

    def flipped(grouped_counts, weight_col):
        return grouped_counts.groupBy("t", "c", "z", "y", "x").agg(
            F.max_by("v", F.struct(F.col(weight_col), F.col("v"))).alias("v")
        )

    monkeypatch.setattr(DS, "_mode_over_blocks", flipped)
    assert _gate_verdict(spark, oracle_con, "a3_label_downsample")


def test_dedup_minhash_catches_wrong_signature_length(
    spark, oracle_con, monkeypatch
):
    """A mis-sized signature (8 perms instead of 16) must mismatch:
    the fixture's 15/16-agreement pairs (est_jaccard 0.9375) cannot be
    expressed as k/8, so their estimates necessarily change."""
    from ngff_zarr_spark.functions import dedup as D

    assert not _gate_verdict(spark, oracle_con, "dedup_minhash")
    orig = D.minhash_candidates
    monkeypatch.setattr(
        D, "minhash_candidates", lambda docs, **k: orig(docs, num_perm=8)
    )
    assert _gate_verdict(spark, oracle_con, "dedup_minhash")


def test_sessionize_catches_wrong_gap(spark, oracle_con, monkeypatch):
    """A halved inactivity gap keeps the per-user rowcount (15 users)
    but changes session counts — exercises the VALUE-hash compare path
    rather than the rowcount shortcut."""
    from ngff_zarr_spark.functions import events as E

    assert not _gate_verdict(spark, oracle_con, "events_sessionize")
    orig = E.sessionize_counts
    monkeypatch.setattr(
        E, "sessionize_counts", lambda df, gap: orig(df, gap // 2)
    )
    assert _gate_verdict(spark, oracle_con, "events_sessionize")
