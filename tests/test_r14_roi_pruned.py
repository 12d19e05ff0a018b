"""Scan-metrics twin of the s1_roi_pruned_read gate (VERDICT r13 ask
#8): the gate proves the pruned scan's VALUES against the oracle; this
test proves the pruning actually HAPPENED — the planner visits 2 of the
store's 18 chunks for exactly the gate's store geometry + ROI."""

import math

from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

from ngff_zarr_spark import gate
from ngff_zarr_spark.fixtures import IMG3D
from ngff_zarr_spark.sources.ome_zarr import OmeZarrReader


def test_gate_roi_plans_fewer_partitions_than_chunks(spark):
    # materialize the gate's store (idempotent overwrite), then plan the
    # same ROI through the DataSource's pushFilters directly
    gate.q_s1_roi_pruned_read(spark, "/root/testdata/sf0.001").count()
    store = gate._tmp_store("roi_pruned.ome.zarr")

    chunks = gate.ROI_PRUNED_CHUNKS
    grid = {d: math.ceil(getattr(IMG3D, d) / chunks[d]) for d in ("z", "y", "x")}
    total_chunks = grid["z"] * grid["y"] * grid["x"]
    assert total_chunks == 18  # the geometry the pin below assumes

    r = OmeZarrReader({"path": store, "array_path": "scale0/image"})
    assert len(r.partitions()) == total_chunks  # unfiltered: every chunk

    filters = []
    for d, (lo, hi) in gate.ROI_PRUNED_FILTER.items():
        filters.append(GreaterThanOrEqual((d,), lo))
        filters.append(LessThan((d,), hi))
    r2 = OmeZarrReader({"path": store, "array_path": "scale0/image"})
    r2.pushFilters(filters)
    planned = len(r2.partitions())
    # ROI z[0,16) y[32,64) x[32,65) → z chunk {0}, y chunk {1}, x {1,2}
    assert planned == 2
    assert planned < total_chunks


def test_gate_roi_rowcount_is_exact(spark):
    df = gate.q_s1_roi_pruned_read(spark, "/root/testdata/sf0.001")
    expect = 1
    for d, (lo, hi) in gate.ROI_PRUNED_FILTER.items():
        expect *= min(hi, getattr(IMG3D, d)) - lo
    assert df.count() == expect
