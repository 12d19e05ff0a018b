"""Skew-safe sessionization (functions/events.py
sessionize_counts_segmented): exact equality with the single-window
form, including on an adversarial mega-user, plus the structural
property the rewrite exists for — the big sort keys on
(user, segment), so one user's events spread over many window groups.

Reference point: sessionization itself mirrors the events gates
(SURVEY §2 events suite); the segmented twin is the 100-TB hardening
(a bot user with 10^8 events would otherwise sort in ONE task).
"""

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.events import (
    sessionize_counts,
    sessionize_counts_segmented,
)

GAP = 1800 * 1_000_000_000  # 30 min in ns
HOUR = 3600 * 1_000_000_000
BASE = 1_700_000_000_000_000_000  # realistic epoch ns (> 2^53: pins DIV)


def _counts(df):
    return {
        r.user_id: (r.n_sessions, r.n_events)
        for r in df.orderBy("user_id").collect()
    }


@pytest.fixture(scope="module")
def skewed_events(spark):
    """3 normal users + one mega-user whose 5000 events span ~35 days
    in 10-min steps (never exceeding the gap: ONE true session crossing
    hundreds of 6h segments), plus a bursty user with exact-gap edges."""
    rows = []
    for u in (1, 2, 3):
        for i in range(40):
            # sessions of 4 events, 2h apart between sessions
            rows.append((u, BASE + (i // 4) * 2 * HOUR + (i % 4) * GAP // 3))
    for i in range(5000):
        rows.append((99, BASE + i * 600 * 1_000_000_000))
    # exact-gap boundary semantics: diff == gap stays the SAME session
    rows.append((7, BASE))
    rows.append((7, BASE + GAP))
    rows.append((7, BASE + GAP + GAP + 1))
    return spark.createDataFrame(rows, "user_id long, ns long").cache()


@pytest.mark.parametrize("segment_ns", [6 * HOUR, HOUR // 2, 1])
def test_segmented_equals_plain(spark, skewed_events, segment_ns):
    plain = _counts(sessionize_counts(skewed_events, GAP, skew_safe=False))
    seg = _counts(sessionize_counts_segmented(skewed_events, GAP, segment_ns))
    assert seg == plain
    # sanity on the fixture's designed answers
    assert plain[99] == (1, 5000)  # mega-user: one unbroken session
    assert plain[7] == (2, 3)      # diff == gap joins; gap+1 splits


def test_segmented_equals_plain_on_sf_events(spark, sf_dir):
    from ngff_zarr_spark.gate import (
        q_events_sessionize,
        q_events_sessionize_segmented,
    )

    plain = _counts(q_events_sessionize(spark, sf_dir))
    seg = _counts(q_events_sessionize_segmented(spark, sf_dir))
    assert seg == plain and len(plain) > 0


def test_random_streams_property(spark):
    """Random user/timestamp streams, random gap and segment widths:
    segmented == plain everywhere."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        gap=st.integers(1, 40),
        segment=st.integers(1, 60),
    )
    def check(seed, gap, segment):
        import numpy as np

        rng = np.random.default_rng(seed)
        rows = [
            (int(rng.integers(5)), BASE + int(rng.integers(0, 300)))
            for _ in range(120)
        ]
        df = spark.createDataFrame(rows, "user_id long, ns long")
        plain = _counts(sessionize_counts(df, gap, skew_safe=False))
        assert _counts(sessionize_counts_segmented(df, gap, segment)) == plain

    check()


def test_big_sort_partitions_by_user_and_segment(spark, skewed_events):
    """Structural pin: the events-sized window keys on BOTH user and
    segment (the skew fix), and only the tiny summary window keys on
    user alone."""
    plan = sessionize_counts_segmented(
        skewed_events, GAP, 6 * HOUR
    )._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(user_id#" in plan.replace(" ", "").lower() or \
        "user_id" in plan
    # the first (events-sized) Window in the plan must include _seg
    first_window = plan[plan.find("Window"):]
    assert "_seg" in first_window[: first_window.find("Scan") + 400]


def test_segment_ids_use_integer_division(spark):
    """Epoch-ns magnitudes exceed 2^53; a float path would misplace
    boundary events. Two events gap_ns apart straddling a segment edge
    must still merge at every realistic magnitude."""
    for base in (BASE, 2**60, 3):
        df = spark.createDataFrame(
            [(1, base), (1, base + GAP)], "user_id long, ns long"
        )
        got = _counts(sessionize_counts_segmented(df, GAP, GAP))
        assert got[1] == (1, 2), base
