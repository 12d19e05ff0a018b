"""Composed imaging-pipeline gate (r16, VERDICT r15 ask #2).

The driver value-checks the gate against the composed DuckDB twin;
these tests pin the composition contracts the digest rows can't show
alone — stage row-count geometry, agreement of the digest rows with a
live DuckDB run of the twin, and the store artifacts the chain claims
to produce (sharded v3 base, converted v2 twin).
"""

from __future__ import annotations

import duckdb
import pytest

from ngff_zarr_spark import gate, oracle


@pytest.fixture(scope="module")
def pipeline_rows(spark, sf_dir):
    rows = gate.q_imaging_pipeline_battery(spark, sf_dir).collect()
    return {r["gate"]: r for r in rows}


def test_stage_geometry(pipeline_rows):
    d = pipeline_rows
    assert set(d) == {
        "ipipe_ingest", "ipipe_pyramid", "ipipe_store",
        "ipipe_roi", "ipipe_convert", "ipipe_meta",
    }
    s = gate.IPIPE.shape
    assert d["ipipe_ingest"]["n_rows"] == s["z"] * s["y"] * s["x"]
    # floor-crop: 35→34→17, 31→30→15
    assert d["ipipe_pyramid"]["n_rows"] == (s["z"] // 2) * (s["y"] // 2) * (s["x"] // 2)
    assert d["ipipe_store"]["n_rows"] == d["ipipe_pyramid"]["n_rows"]
    # conversion copies data verbatim: identical digests, not just rows
    assert d["ipipe_convert"]["n_rows"] == d["ipipe_store"]["n_rows"]
    assert d["ipipe_convert"]["d1"] == d["ipipe_store"]["d1"]
    assert d["ipipe_convert"]["d2"] == d["ipipe_store"]["d2"]
    roi_n = 1
    for dim, (lo, hi) in gate.IPIPE_ROI.items():
        roi_n *= hi - lo
    assert d["ipipe_roi"]["n_rows"] == roi_n
    assert d["ipipe_meta"]["n_rows"] == 2


def test_matches_duckdb_twin(pipeline_rows):
    """Every stage digest equals a live DuckDB evaluation of the twin
    (the oracle is self-contained — derived from range(), no parquet)."""
    got = {
        r["gate"]: (r["n_rows"], r["d1"], r["d2"])
        for r in pipeline_rows.values()
    }
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(oracle.sql_imaging_pipeline_battery()).fetchall()
    }
    assert got == want


def test_renormalized_level_fits_base_dtype(spark, sf_dir):
    """The stored level-1 values are kernel-mass-renormalized back into
    the base uint16 range — the dtype-preserving pyramid contract."""
    from pyspark.sql import functions as F

    from ngff_zarr_spark.operators.kernels import gaussian_downsample_chunked

    l0 = gate.pixel_df(spark, gate.IPIPE)
    l1 = gaussian_downsample_chunked(
        l0, gate.IPIPE.shape, gate.F3D, chunks=dict(gate.IPIPE_CHUNKS),
        fixed_point_bits=8,
    )
    row = l1.agg(
        F.max(F.expr(f"v div {gate.IPIPE_S3}")).alias("mx"),
        F.min(F.expr(f"v div {gate.IPIPE_S3}")).alias("mn"),
    ).collect()[0]
    assert 0 <= row["mn"] <= row["mx"] <= 250
