"""Physical-plan pins for the r13 second-batch operators (the
test_plans.py convention): shuffle counts, join strategies, and the
absence of cartesian products, so a refactor that keeps results
correct but degrades the 100 TB posture fails loudly."""

from __future__ import annotations

import contextlib
import io
import re

from ngff_zarr_spark import gate


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_dedup_lines_plan(spark, sf_dir):
    """Line dedup: block construction is a projection (no explode-
    regroup shuffle), the frequency join is a hash join on 64-bit line
    hashes, reassembly is one doc-keyed aggregate — bounded exchanges,
    no cartesian, no nested loop."""
    plan = plan_of(gate.q_dedup_lines(spark, sf_dir))
    assert n_exchanges(plan) <= 6
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 0


def test_graph_triangles_plan(spark, sf_dir):
    """Triangles: every join is an equi hash/sort-merge join on ids —
    the degree-ordered orientation exists precisely so no neighbor-pair
    cartesian is ever needed. canon/oriented persist, so the upstream
    candidate pipeline plans once per cache, not once per consumer
    (unpersisted it inlined ~6 copies: 56 exchanges vs 16)."""
    plan = plan_of(gate.q_graph_triangles(spark, sf_dir))
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert n_exchanges(plan) <= 20


def test_corpus_priority_sample_plan(spark, sf_dir):
    """Priority sample: pure projection + two bounded windows — NO
    join node of any kind, and only the two top-k exchanges."""
    plan = plan_of(gate.q_corpus_priority_sample(spark, sf_dir))
    assert "Join" not in plan
    assert n_exchanges(plan) <= 3


def test_ann_sq8_topk_plan(spark, sf_dir):
    """SQ8 serving: the request-sized quantized query side broadcasts
    onto one corpus pass (the != predicate plans as a broadcast nested
    loop — over a 10-row broadcast, deliberately); no sort-merge join,
    two-phase top-k exchanges only."""
    plan = plan_of(gate.q_ann_sq8_topk(spark, sf_dir))
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("CartesianProduct") == 0
    assert "BroadcastNestedLoopJoin" in plan
    assert n_exchanges(plan) <= 5


def test_ann_mmr_rerank_plan(spark, sf_dir):
    """MMR: after the pool tables checkpoint to leaves, the final plan
    is exactly the cogrouped pandas selection over request-bounded
    state — two group exchanges, no joins."""
    plan = plan_of(gate.q_ann_mmr_rerank(spark, sf_dir))
    assert "FlatMapCoGroupsInPandas" in plan
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("CartesianProduct") == 0
    assert n_exchanges(plan) <= 4
