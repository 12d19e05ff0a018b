"""Funnel/cohort at hot-user scale (VERDICT r9 ask #8).

The r9 skew audit claims funnel() and cohort_retention() need no
skew-safe twin because their plans are aggregate-only — every shuffle
is id-/cohort-keyed min/count aggregation with map-side partial
combine, and no ``Window.partitionBy(user)`` (or any other per-user
sort) ever materializes a user's full history in one task. These tests
pin that claim instead of asserting it:

* structurally — the optimized plan of both operators contains no
  Window node;
* empirically — a single user with 10^6 events (generated
  executor-side via ``spark.range``, never through the driver) flows
  through both operators alongside small hand-built users, and every
  output row matches counts derived by construction.

A mega-user makes a per-user-window plan slow/OOM-prone; an
aggregate-only plan just sees 10^6 more rows in a hash aggregate.
"""

import pandas as pd
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.events import cohort_retention, funnel

WEEK_NS = 7 * 86400 * 1_000_000_000
N_MEGA = 1_000_000


def _mega_user_events(spark):
    """10^6 events for user 0, built executor-side: event i is
    view/click/purchase cycling with i, at ts = i (ns) — so the first
    view (i=0) < first at-or-after click (i=1) < first at-or-after
    purchase (i=2): the user completes every funnel step. Week buckets:
    ts stays inside epoch-week 0 for all 10^6 events; a separate
    signup row (also week 0) anchors the cohort."""
    mega = spark.range(N_MEGA).select(
        F.lit(0).cast("long").alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.col("id").cast("long").alias("ts"),
    )
    signup = spark.range(1).select(
        F.lit(0).cast("long").alias("user_id"),
        F.lit("signup").alias("event_type"),
        F.lit(0).cast("long").alias("ts"),
    )
    return mega.unionByName(signup)


def _small_users(spark):
    """Hand-built users exercising every funnel drop-off mode:
    user 1 only views; user 2's purchase PRECEDES its click (step-order
    violation: view+click count, purchase must not); user 3 completes
    all three steps with same-ts click/purchase ties."""
    rows = [
        (1, "view", 100),
        (2, "view", 100), (2, "purchase", 150), (2, "click", 200),
        (3, "view", 100), (3, "click", 100), (3, "purchase", 100),
        # cohort data: users 1-3 sign up in week 1, user 1 returns in
        # weeks 2 and 4, user 2 in week 2, user 3 never
        (1, "signup", WEEK_NS + 1), (1, "view", 2 * WEEK_NS + 1),
        (1, "view", 4 * WEEK_NS + 5),
        (2, "signup", WEEK_NS + 2), (2, "click", 2 * WEEK_NS + 2),
        (3, "signup", WEEK_NS + 3),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    ).select(
        F.col("user_id").cast("long"),
        "event_type",
        F.col("ts").cast("long"),
    )


def _no_window(df):
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_funnel_mega_user(spark):
    ev = _mega_user_events(spark).unionByName(_small_users(spark))
    out = funnel(ev, steps=("view", "click", "purchase"))
    _no_window(out)
    got = {r.step: (r.step_index, r.n_users) for r in out.collect()}
    # view: users 0,1,2,3; click at-or-after view: 0,2,3;
    # purchase at-or-after click: 0,3 (user 2's purchase precedes its
    # click; user 3's same-ts tie counts)
    assert got == {
        "view": (0, 4),
        "click": (1, 3),
        "purchase": (2, 2),
    }


def test_cohort_mega_user(spark):
    ev = _mega_user_events(spark).unionByName(_small_users(spark))
    out = cohort_retention(ev, signup_type="signup")
    _no_window(out)
    got = {
        (r.cohort_week, r.week_offset): r.n_users for r in out.collect()
    }
    # user 0: cohort week 0, its 10^6 events all land in week 0 —
    # exactly ONE retained-user row despite 10^6 input rows (the
    # distinct (user, week) projection collapses the hot user before
    # any join)
    # users 1,2,3: cohort week 1; offset 0 = all 3 (signup itself),
    # offset 1 = users 1,2; offset 3 = user 1
    assert got == {
        (0, 0): 1,
        (1, 0): 3,
        (1, 1): 2,
        (1, 3): 1,
    }
