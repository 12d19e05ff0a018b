"""Physical-plan pins: the scale claims in PLANS.md, CI-enforced.

Each test captures `.explain("formatted")` and asserts the plan SHAPE —
shuffle counts, broadcast joins, filter pushdown — so a regression that
keeps results correct but degrades the 100 TB posture (an extra
exchange, a broadcast that became a sort-merge join, a filter that
stopped pushing down) fails loudly.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark import gate
from ngff_zarr_spark.fixtures import IMG3D, pixel_df
from ngff_zarr_spark.operators import bin_shrink, nearest


@pytest.fixture()
def lazy_plans(spark):
    """r14 cache scoping makes scoped operators return checkpoint
    LEAVES, which hide their plan from .explain — tests that pin the
    plan shape flip the inspection escape to receive the lazy plan,
    then clear the deliberately-unreleased caches."""
    from ngff_zarr_spark.functions import _scope

    old = _scope.PLAN_INSPECTION
    _scope.PLAN_INSPECTION = True
    yield
    _scope.PLAN_INSPECTION = old
    spark.catalog.clearCache()


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    # formatted explain prints each node twice (tree + detail section);
    # count the unique "(N) Exchange" detail headers
    import re

    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_bin_shrink_single_exchange(spark):
    """A2 is ONE hash aggregate: exactly one shuffle, with a map-side
    partial aggregate before it."""
    plan = plan_of(bin_shrink(pixel_df(spark, IMG3D), IMG3D.shape, {"z": 2, "y": 2, "x": 2}))
    assert n_exchanges(plan) == 1
    assert "HashAggregate" in plan


def test_nearest_zero_exchange(spark):
    """A7 is a pure filter + projection: NO shuffle anywhere."""
    plan = plan_of(nearest(pixel_df(spark, IMG3D), IMG3D.shape, {"z": 2, "y": 2, "x": 2}))
    assert n_exchanges(plan) == 0


def test_tpch_q5_broadcasts_dimensions(spark, sf_dir):
    """Q5's small sides broadcast; the fact table is never broadcast
    and shuffles only for joins/aggregate, never more than once per
    operator."""
    plan = plan_of(gate.q_tpch_q5(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    # date-range predicate reaches the parquet scan
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_tpch_q1_pushdown_and_partial_agg(spark, sf_dir):
    plan = plan_of(gate.q_tpch_q1(spark, sf_dir))
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert n_exchanges(plan) == 1  # one shuffle for the final agg


def test_exact_dedup_single_exchange(spark, sf_dir):
    """Exact dedup: digest computed map-side, one shuffle of digests —
    document text never moves."""
    plan = plan_of(gate.q_dedup_exact(spark, sf_dir))
    assert n_exchanges(plan) == 1


def test_minhash_no_cartesian(spark, sf_dir):
    """The LSH candidate join must be an equi-join on (band, band_key) —
    never a cartesian/broadcast-nested-loop over documents."""
    plan = plan_of(gate.q_dedup_minhash(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pixel_scan_filter_reaches_source(spark, tmp_path):
    """Coordinate predicates appear as a Filter directly over the
    ome_zarr BatchScan (and prune partitions, proven by counts in
    test_zarr_source); no exchange is introduced by slicing."""
    from ngff_zarr_spark.ome_zarr_api import read_image, write_image

    spec_shape = {"z": 8, "y": 16, "x": 16}
    store = str(tmp_path / "p.ome.zarr")
    from ngff_zarr_spark.fixtures import ImageSpec

    spec = ImageSpec("pp", z=8, y=16, x=16)
    write_image(
        pixel_df(spark, spec).select("t", "c", "z", "y", "x", "v"),
        store, "scale0/image", spec_shape, ["z", "y", "x"], {"z": 4, "y": 8, "x": 8},
    )
    df = read_image(spark, store, "scale0/image").filter((F.col("z") < 4) & (F.col("x") >= 8))
    plan = plan_of(df)
    assert "BatchScan" in plan
    assert n_exchanges(plan) == 0


def test_capped_band_pairs_no_extra_aggregate_join(spark, sf_dir, lazy_plans):
    """The r7 bucket-occupancy cap must ride a WINDOW over the band
    exchange — not a separate occupancy aggregate joined back (that
    shape cost ~2x on the candidate path). r8 pin tightened: the
    windowed band table feeds three consumers (pairwise side a/b, star
    branch) and MUST be cached before branching — uncached, Catalyst
    re-executed the exchange+sort+window once per consumer (3 Window +
    3 Sort + 6 Exchange, zero ReusedExchange: the aliased self-join
    sides don't canonicalize to one subplan), which regressed
    dedup_clusters 2.4x in BENCH_r07. Pin: exactly ONE Window node,
    at most one Sort, the cached scan present, and no cartesian."""
    import re

    from ngff_zarr_spark.functions.dedup import minhash_candidates

    # from-scratch shape: leftover caches from OTHER operators sharing
    # the banded-window subplan (e.g. pagerank's persisted edge table)
    # make cache substitution split the window across consumers in the
    # pre-AQE explain — runtime still serves from cache, but the shape
    # pin must be deterministic
    spark.catalog.clearCache()
    docs = gate._docs(spark, sf_dir)
    plan = plan_of(minhash_candidates(docs))
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert len(re.findall(r"\(\d+\) Sort", plan)) <= 1
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gopher_two_hash_aggregates_no_python(spark, sf_dir):
    """gopher_quality = exploded-words aggregate + exploded-bigrams
    aggregate + one join; everything JVM-side (no Python UDF nodes)."""
    from ngff_zarr_spark.functions.text import gopher_quality

    plan = plan_of(gopher_quality(gate._docs(spark, sf_dir)))
    assert "HashAggregate" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert bad not in plan
    assert "CartesianProduct" not in plan


def test_dup_shingle_frac_inverted_index_shape(spark, sf_dir, lazy_plans):
    """dup_shingle_frac: document-frequency aggregate + df-bounded join
    + per-doc aggregate. No pairwise doc-doc join may appear (join keys
    are shingle/doc_id only), no Python."""
    from ngff_zarr_spark.functions.dedup import dup_shingle_frac

    plan = plan_of(dup_shingle_frac(gate._docs(spark, sf_dir)))
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan


def test_dup_spans_two_keyed_exchanges_one_sort(spark, sf_dir):
    """duplicated_spans: exactly the designed shuffles — gram-hash for
    the count-agg + 1:1 join back, doc_id for the stacked windows (ONE
    sort feeds both), and no pairwise join or Python anywhere."""
    from ngff_zarr_spark.functions.spans import duplicated_spans

    plan = plan_of(duplicated_spans(gate._docs(spark, sf_dir)))
    assert plan.count("Exchange hashpartitioning") <= 4  # tree+detail dup
    assert "CartesianProduct" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan


def test_funnel_broadcasts_shrinking_stages(spark, sf_dir):
    """funnel: each stage's completion table broadcasts into the next
    step's filter-join — no sort-merge join, no cartesian."""
    from ngff_zarr_spark.functions.events import funnel

    plan = plan_of(funnel(gate._events(spark, sf_dir)))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hll_bounded_aggregate(spark, sf_dir):
    """hll_distinct: hash projection → m-row aggregate → singleton; no
    Python, no join, no window."""
    from ngff_zarr_spark.functions.sketch import hll_distinct

    plan = plan_of(hll_distinct(gate._events(spark, sf_dir), "event_id"))
    assert "HashAggregate" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Window", "Join"):
        assert bad not in plan


def test_tpch_q6_full_pushdown(spark, sf_dir):
    """q6: every predicate reaches the parquet scan and only the four
    referenced columns are read."""
    plan = plan_of(gate.q_tpch_q6(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:300]


def test_decontaminate_broadcast_semi_join(spark, sf_dir):
    """decontaminate's train-vs-benchmark membership test must be a
    BROADCAST left-semi join on the gram hash (the benchmark side is
    eval-set-sized by definition) — never a shuffled sort-merge join or
    a cartesian — and the gram arrays must be deduped per-row
    (array_distinct) BEFORE the explode, so the only exchanges are the
    benchmark distinct and the per-doc hit aggregate."""
    from ngff_zarr_spark.functions.corpus import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 3)
    plan = plan_of(decontaminate(docs, bench))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "array_distinct" in plan
    assert "SortMergeJoin" not in plan.split("LeftSemi")[0]


def test_write_image_batch_single_exchange(spark):
    """The multi-array write plan: N per-field projections union into
    ONE repartition on the packed key — exactly one exchange however
    many fields batch together."""
    from ngff_zarr_spark.fixtures import ImageSpec

    spec = ImageSpec("wb", z=2, y=8, x=8)
    fields = [
        (
            pixel_df(spark, spec).select("t", "c", "z", "y", "x", "v"),
            f"arr{i}",
        )
        for i in range(4)
    ]
    # rebuild the packed union exactly as write_image_batch does, minus
    # the save() (the writer node isn't explainable pre-save)
    import math

    dims = ["z", "y", "x"]
    shape = {"z": 2, "y": 8, "x": 8}
    chunks = {"z": 2, "y": 4, "x": 4}
    grid = [-(-shape[d] // chunks[d]) for d in dims]
    n_chunks = math.prod(grid)
    ck_sql = f"({dims[0]} div {chunks[dims[0]]})"
    for d, g in zip(dims[1:], grid[1:]):
        ck_sql = f"({ck_sql} * {g} + ({d} div {chunks[d]}))"
    off_sql = f"({dims[0]} % {chunks[dims[0]]})"
    for d in dims[1:]:
        off_sql = f"({off_sql} * {chunks[d]} + ({d} % {chunks[d]}))"
    packed = None
    for fid, (df, _) in enumerate(fields):
        p = df.selectExpr(
            f"CAST({ck_sql} + {fid * n_chunks} AS BIGINT) AS ck",
            f"CAST({off_sql} AS BIGINT) AS off",
            "v",
        ).coalesce(1)
        packed = p if packed is None else packed.unionByName(p)
    plan = plan_of(packed.repartition(8, "ck").sortWithinPartitions("ck"))
    assert n_exchanges(plan) == 1
    assert "Union" in plan


def test_substring_cut_no_python_no_cartesian(spark, sf_dir):
    """substring_dedup_stats: gram aggregate + cardinality-preserving
    join + per-doc aggregate — all JVM-side, no pairwise doc-doc join,
    text never in a shuffle key."""
    from ngff_zarr_spark.functions.spans import substring_dedup_stats

    plan = plan_of(substring_dedup_stats(gate._docs(spark, sf_dir)))
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert bad not in plan


def test_temperature_mix_broadcast_plan_only(spark, sf_dir):
    """temperature_mixture: the corpus side joins the per-group plan by
    BROADCAST (the plan table is groups-sized); the only nested-loop
    joins are the deliberate 1-row scalar broadcasts. No sort of the
    corpus anywhere."""
    import re

    from ngff_zarr_spark.functions.corpus import temperature_mixture

    plan = plan_of(temperature_mixture(gate._docs(spark, sf_dir)))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan
    assert not re.search(r"\(\d+\) Sort", plan)


def test_seeded_shuffle_no_corpus_window(spark, sf_dir):
    """seeded_shuffle: the ONLY unpartitioned windows run over the
    bucket-count summary (≤ n_buckets rows); the corpus-sized window is
    partitioned by bucket. The offsets join back is a broadcast."""
    from ngff_zarr_spark.functions.sampling import seeded_shuffle

    plan = plan_of(seeded_shuffle(gate._docs(spark, sf_dir)))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the corpus window is keyed: its spec must mention the bucket col
    assert "windowspecdefinition(b#" in plan or "partitionBy" not in plan


def test_lm_scoring_no_python(spark, sf_dir, lazy_plans):
    """LM perplexity / DSIR: hash aggregates + joins, zero Python nodes
    (the whole bigram pipeline is codegen transforms + md5)."""
    from pyspark.sql import functions as F

    from ngff_zarr_spark.functions.lm import dsir_importance, lm_perplexity

    docs = gate._docs(spark, sf_dir)
    for df in (
        lm_perplexity(docs),
        dsir_importance(docs, docs.filter(F.col("lang") == "en")),
    ):
        plan = plan_of(df)
        assert "HashAggregate" in plan
        assert "CartesianProduct" not in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
            assert bad not in plan


def test_ann_serving_plan_shapes(spark, sf_dir):
    """VERDICT r10 ask #3: pin the ANN serving plans' physical shape so
    a refactor can't silently add an exchange/sort premium. Counts
    verified IDENTICAL between the r9 boundary commit and HEAD in a
    paired A/B (PLANS.md r12); the r10 timing drift was box variance,
    not plan change. No BroadcastNestedLoopJoin anywhere — the only
    joins are hash joins on cell/band/code keys."""
    for fn, max_exchanges in (
        (gate.q_ann_pq_topk, 3),
        (gate.q_ann_ivf_topk, 5),
        (gate.q_ann_lsh_topk, 5),
    ):
        plan = plan_of(fn(spark, sf_dir))
        assert n_exchanges(plan) <= max_exchanges, fn.__name__
        import re

        assert len(re.findall(r"\(\d+\) Sort\b", plan)) <= 4, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_r12_tpch_sweep_plan_shapes(spark, sf_dir):
    """r12 relational sweep: every join in q7/q8/q9/q18 broadcasts its
    dimension or qualifying-key side — no cartesian anywhere, and no
    nested-loop join except a deliberate 1-row scalar broadcast
    (q15's global max)."""
    for fn, bnlj_ok in (
        (gate.q_tpch_q7, 0),
        (gate.q_tpch_q8, 0),
        (gate.q_tpch_q9, 0),
        (gate.q_tpch_q13, 0),
        (gate.q_tpch_q15, 2),  # 1-row max broadcast may plan as BNLJ
        (gate.q_tpch_q18, 0),
    ):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("CartesianProduct") == 0, fn.__name__
        assert plan.count("BroadcastNestedLoopJoin") <= bnlj_ok, fn.__name__
        assert "PushedFilters" in plan, fn.__name__


def test_r12_tpch_standins_plan_shapes(spark, sf_dir):
    """q2/q11/q12/q16/q20 (partsupp/shipmode stand-ins): no cartesian;
    q11's global-total 1-row broadcast is the only nested loop; q16's
    NOT IN is a broadcast ANTI join and q20's nested IN a SEMI join —
    never per-row subquery scans."""
    for fn, bnlj_ok in (
        (gate.q_tpch_q2, 0),
        (gate.q_tpch_q11, 2),  # 1-row total broadcast
        (gate.q_tpch_q12, 0),
        (gate.q_tpch_q16, 0),
        (gate.q_tpch_q20, 0),
    ):
        plan = plan_of(fn(spark, sf_dir))
        assert plan.count("CartesianProduct") == 0, fn.__name__
        assert plan.count("BroadcastNestedLoopJoin") <= bnlj_ok, fn.__name__
    assert "LeftAnti" in plan_of(gate.q_tpch_q16(spark, sf_dir))
    assert "LeftSemi" in plan_of(gate.q_tpch_q20(spark, sf_dir))
