"""r15: the composed events-analytics pipeline gate
(gate.q_events_pipeline_battery) — sessionize → engaged cut → as-of
attribution → funnel/retention → converting-user percentiles.

The DuckDB twin checks stage VALUES at sf0.01; these tests pin the
composition's structural invariants the digests can't express: the
engaged cut is a non-trivial strict subset, the funnel is monotone,
every attributed purchase belongs to an engaged user, and the battery
emits exactly one digest row per stage with the expected names."""

from __future__ import annotations

from pyspark.sql import functions as F

from ngff_zarr_spark import gate
from ngff_zarr_spark.functions.events import sessionize_counts_segmented


def _sessions(spark, sf_dir):
    ev = gate._events(spark, sf_dir)
    return sessionize_counts_segmented(
        ev.select("user_id", F.col("ts").alias("ns")),
        int(gate.SESSION_GAP_S) * 1_000_000_000,
        gate.EPIPE_SEGMENT_NS,
    )


def test_engaged_cut_nontrivial(spark, sf_dir):
    sess = _sessions(spark, sf_dir)
    n_users = sess.count()
    n_engaged = sess.where(
        F.col("n_sessions") >= gate.EPIPE_MIN_SESSIONS
    ).count()
    # threshold sits at the distribution median by design: the cut
    # must drop some users AND keep some at every SF
    assert 0 < n_engaged < n_users


def test_battery_shape_and_stage_names(spark, sf_dir):
    rows = {r.gate: r for r in gate.q_events_pipeline_battery(spark, sf_dir).collect()}
    assert set(rows) == {
        "epipe_sessions",
        "epipe_asof",
        "epipe_funnel",
        "epipe_retention",
        "epipe_percentiles",
    }
    # no stage silently empties: sessions cover all users, the funnel
    # always emits its 3 steps, and the engaged subset generates
    # attribution/retention/percentile rows on every SF fixture
    for name, r in rows.items():
        assert r.n_rows > 0, name
    assert rows["epipe_funnel"].n_rows == 3


def test_funnel_monotone_over_engaged(spark, sf_dir):
    ev = gate._events(spark, sf_dir)
    sess = _sessions(spark, sf_dir)
    engaged = sess.where(
        F.col("n_sessions") >= gate.EPIPE_MIN_SESSIONS
    ).select("user_id")
    from ngff_zarr_spark.functions.events import funnel

    steps = {
        r.step_index: r.n_users
        for r in funnel(ev.join(engaged, "user_id")).collect()
    }
    assert steps[0] >= steps[1] >= steps[2]
    n_engaged = engaged.count()
    assert steps[0] <= n_engaged


def test_attribution_only_engaged_users(spark, sf_dir):
    ev = gate._events(spark, sf_dir)
    sess = _sessions(spark, sf_dir)
    engaged = set(
        r.user_id
        for r in sess.where(
            F.col("n_sessions") >= gate.EPIPE_MIN_SESSIONS
        ).collect()
    )
    from ngff_zarr_spark.functions.events import asof_join_segmented

    ee = ev.where(F.col("user_id").isin(list(engaged)))
    att = asof_join_segmented(
        ee.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        ),
        ee.where(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        ),
        key="user_id",
        ts_col="ts",
        value_cols=("event_id",),
        suffix="_click",
        segment_ns=gate.EPIPE_SEGMENT_NS,
    )
    got_users = {r.user_id for r in att.select("user_id").distinct().collect()}
    assert got_users <= engaged
    # attribution is backward: any matched click precedes its purchase
    assert (
        att.where(
            F.col("ts_click").isNotNull() & (F.col("ts_click") > F.col("ts"))
        ).count()
        == 0
    )
