"""Plan contracts for the r14 operators — the physical shapes the 100 TB
posture claims rest on, pinned so a regression shows up as a test
failure, not a bench drift."""

import contextlib
import io
import re

import pyspark.sql.functions as F

from ngff_zarr_spark import gate


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_contamination_bench_side_broadcasts(spark, sf_dir):
    """The benchmark gram set must reach the corpus side as a
    BroadcastHashJoin — the corpus never shuffles for the membership
    test — and nothing in the plan is a cartesian/nested loop."""
    plan = plan_of(gate.q_dedup_contamination(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the only shuffles: per-doc hit aggregate + the final doc-keyed
    # join of totals×hits (plus AQE-inserted reads); no corpus-gram
    # SortMergeJoin anywhere
    assert "SortMergeJoin" not in plan


def test_line_dedup_nl_shuffles_hashes_not_text(spark, sf_dir):
    """The frequency join is keyed on the 64-bit line hash — the plan
    carries no join of the raw line strings (the hash column lh feeds
    both the aggregate and the join)."""
    plan = plan_of(gate.q_dedup_lines_nl(spark, sf_dir))
    assert "xxhash64" in plan.lower() or "lh" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_roi_pruned_read_no_exchange(spark):
    """A pruned ROI read is scan + filter — slicing must not introduce
    a shuffle."""
    df = gate.q_s1_roi_pruned_read(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "BatchScan" in plan
    assert n_exchanges(plan) == 0


def test_complex_roundtrip_read_no_exchange(spark):
    """The complex pixel read (struct rebuild happens inside the
    DataSource) adds no shuffle over the plain dtype reads."""
    df = gate.q_dtype_complex64_roundtrip(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "BatchScan" in plan
    assert n_exchanges(plan) == 0


def test_incremental_prebuilt_index_no_rewindow(spark, sf_dir):
    """With build_ref_index's precomputed index, the per-batch plan
    must contain NO Window node (the witness cap was applied offline)
    and no cartesian/nested-loop join."""
    from ngff_zarr_spark.functions import _scope
    from ngff_zarr_spark.functions.dedup import (
        build_ref_index,
        minhash_candidates_incremental,
    )

    docs = gate._docs(spark, sf_dir)
    wide, bands = build_ref_index(docs)
    new = docs.limit(5).select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    # the verdict plan is a checkpoint leaf; inspect the lazy candidate
    # stage via the inspection escape instead

    old = _scope.PLAN_INSPECTION
    _scope.PLAN_INSPECTION = True
    try:
        plan = plan_of(
            minhash_candidates_incremental(new, None, ref_wide=wide, ref_bands=bands)
        )
    finally:
        _scope.PLAN_INSPECTION = old
        spark.catalog.clearCache()
    assert re.findall(r"\(\d+\) Window", plan) == []
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
