"""Plan contracts for the r15 operators — the physical shapes the
100 TB posture claims rest on, pinned so a regression shows up as a
test failure, not a bench drift."""

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


def test_heavy_hitters_candidates_broadcast(spark, sf_dir):
    """Pass 2's semi-join of the stream against the candidate set must
    be a BroadcastHashJoin (candidates are ≤ k×P rows by construction);
    the distinct-key space never rides a SortMergeJoin, and the total
    count reaches the threshold filter as a broadcast cross of ONE row
    — no cartesian/nested-loop over data."""
    plan = plan_of(gate.q_sketch_heavy_hitters(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the 1-row total legitimately arrives via BroadcastNestedLoopJoin
    # (no join key); allow at most that one node (formatted output
    # repeats each node in the detail section — count detail headers)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1


def test_heavy_hitters_candidate_rows_bounded(spark, sf_dir):
    """The candidate set itself — the only thing pass 1 shuffles — is
    ≤ k × input partitions rows."""
    from ngff_zarr_spark.functions.sketch import mg_candidates

    toks = gate._hh_tokens(gate._docs(spark, sf_dir))
    n_parts = toks.rdd.getNumPartitions()
    n_cand = mg_candidates(toks, ("lang", "token"), gate.HH_K).count()
    assert n_cand <= gate.HH_K * n_parts


def test_web_url_dedup_single_aggregate_no_udf(spark, sf_dir):
    """Canonicalization is pure JVM expression work: the plan is scan →
    project → ONE hash-aggregate exchange. No Python UDF node (the
    whole pass stays in whole-stage codegen), no join, no sort."""
    plan = plan_of(gate.q_web_url_dedup(spark, sf_dir))
    for bad in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInPandas",
        "SortMergeJoin",
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
    ):
        assert bad not in plan, bad
    assert "HashAggregate" in plan
    # two exchanges: the countDistinct(raw) partial on (canonical, raw)
    # then the canonical-key final — the standard two-phase distinct
    # aggregate, both map-side combined
    assert n_exchanges(plan) <= 2
    # column pruning reaches the scan: the synthesized-URL projection
    # needs only (doc_id, lang, source); text never leaves the footer
    assert "ReadSchema: struct<doc_id:bigint,lang:string,source:string>" in plan


def test_web_host_stats_bounded_shuffles(spark, sf_dir):
    plan = plan_of(gate.q_web_host_stats(spark, sf_dir))
    for bad in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin",
                "CartesianProduct"):
        assert bad not in plan, bad
    # distinct-count over canonical urls + host aggregate: ≤ 2 shuffles
    assert n_exchanges(plan) <= 2


def test_events_pipeline_engaged_side_broadcasts(spark, sf_dir):
    """The engaged-user cut joins a user-count-sized set onto the
    events stream — the gate hints broadcast, and the composed plan
    must contain no cartesian/nested-loop anywhere across its stages.
    Stage tables are localCheckpoint leaves, so inspect the stage-2
    construction directly."""
    from ngff_zarr_spark.functions.events import sessionize_counts_segmented

    ev = gate._events(spark, sf_dir)
    sess = sessionize_counts_segmented(
        ev.select("user_id", F.col("ts").alias("ns")),
        int(gate.SESSION_GAP_S) * 1_000_000_000,
        gate.EPIPE_SEGMENT_NS,
    )
    engaged = sess.filter(
        F.col("n_sessions") >= gate.EPIPE_MIN_SESSIONS
    ).select("user_id")
    plan = plan_of(ev.join(F.broadcast(engaged), "user_id"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_packed_batch_write_zero_shuffle(spark):
    """The r15 zero-shuffle contract: a many-small-fields plate batch
    (fields >= writer tasks) plans with NO Exchange — the per-branch
    COALESCE(1) single-partition guarantee plus fid-as-highest-radix
    chunk keys make a partition-count coalesce chunk-local. A
    few-huge-fields batch keeps the exchange (parallelism above the
    branch count needs it)."""
    from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
    from ngff_zarr_spark.ome_zarr_api import _pack_batch_plan

    spec = ImageSpec("pln", z=2, y=16, x=16)
    fp = pixel_df(spark, spec).select("z", "y", "x", "v")
    dims, chunks = ["z", "y", "x"], {"z": 2, "y": 16, "x": 16}

    def union_sql(n_fields, hint="/*+ COALESCE(1) */ "):
        names = []
        for fid in range(n_fields):
            nm = f"_plan_zs_{fid}"
            fp.createOrReplaceTempView(nm)
            names.append(nm)
        return " UNION ALL ".join(
            f"SELECT {hint}CAST((z div 2) + {fid} AS BIGINT) AS ck, "
            f"CAST(((z % 2) * 16 + y % 16) * 16 + x % 16 AS BIGINT) AS off, v "
            f"FROM {names[fid]}"
            for fid in range(n_fields)
        )

    # 64 tiny fields, 1 chunk each: fields >= n_tasks -> coalesce path
    many = _pack_batch_plan(
        spark, union_sql(64), 64, 1, dims, chunks, "float64", "gzip"
    )
    assert n_exchanges(plan_of(many)) == 0
    # byte volume still routes through the writer correctly: the plan
    # retains the in-task sort
    assert "Sort" in plan_of(many)

    # 2 fields x 4096 chunks of 2 MiB each: n_tasks > fields -> the
    # exchange is REQUIRED to spread each field over many writers, and
    # the production SQL builder omits the per-branch hint on this path
    # (a COALESCE(1) would serialize each field's upstream compute onto
    # one task — code-review r17); mirror that here
    from ngff_zarr_spark.ome_zarr_api import _batch_task_sizing

    big_chunks = {"z": 64, "y": 64, "x": 64}
    n_tasks, use_coalesce = _batch_task_sizing(
        2, 4096, ["z", "y", "x"], big_chunks, "float64", "gzip"
    )
    assert not use_coalesce and n_tasks > 2
    few = _pack_batch_plan(
        spark, union_sql(2, hint=""), 2, 4096, ["z", "y", "x"], big_chunks,
        "float64", "gzip",
    )
    assert n_exchanges(plan_of(few)) >= 1
