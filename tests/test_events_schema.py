"""events.ts physical-type normalization (functions/events.py).

The driver's testdata has shipped ``ts`` as TIMESTAMP(NANOS)-read-as-long
and as timestamp[us]; every events operator assumes long nanoseconds.
These tests pin that the normalizer is exact (integer expressions, no
timezone dependence) for each reader outcome and that the streaming
source derives its schema from the files instead of hardcoding one.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ngff_zarr_spark.functions.events import (
    events_stream_source,
    normalize_events_ts,
)

US = [0, 1, 1_700_000_000_000_000, 1_700_000_123_456_789]


def _write_events(path, ts_array):
    table = pa.table(
        {
            "event_id": pa.array(range(len(US)), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * len(US), pa.int64()),
            "event_type": pa.array(["click"] * len(US)),
            "value": pa.array([1.5] * len(US)),
        }
    )
    pq.write_table(table, path)


def test_normalize_long_is_noop(spark):
    df = spark.createDataFrame([(u * 1000,) for u in US], "ts long")
    out = normalize_events_ts(df)
    assert out is df  # identical plan, not merely equal values
    assert [r.ts for r in out.orderBy("ts").collect()] == sorted(u * 1000 for u in US)


def test_normalize_timestamp_us_exact(spark, tmp_path):
    """timestamp[us] parquet → TIMESTAMP_NTZ → exact long nanoseconds,
    independent of the session timezone (wall-clock integer math)."""
    p = str(tmp_path / "events.parquet")
    _write_events(p, pa.array(US, pa.timestamp("us")))
    out = normalize_events_ts(spark.read.parquet(p))
    assert dict(out.dtypes)["ts"] == "bigint"
    got = sorted(r.ts for r in out.collect())
    assert got == sorted(u * 1000 for u in US)


def test_normalize_timestamp_us_timezone_independent(spark, tmp_path):
    """Same file, a non-UTC session timezone: identical longs (the
    conversion must never route through the session zone)."""
    p = str(tmp_path / "events.parquet")
    _write_events(p, pa.array(US, pa.timestamp("us")))
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        got = sorted(r.ts for r in normalize_events_ts(spark.read.parquet(p)).collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    assert got == sorted(u * 1000 for u in US)


def test_normalize_rejects_unexpected_type(spark):
    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unsupported"):
        normalize_events_ts(df)


def test_stream_source_derives_schema(spark, tmp_path):
    """readStream schema comes from the live footers: a timestamp[us]
    directory streams the same long-ns rows the batch path produces
    (the hardcoded-long schema silently misread these bytes)."""
    events_dir = str(tmp_path / "events_stream")
    import os

    os.makedirs(events_dir)
    _write_events(os.path.join(events_dir, "part-0.parquet"),
                  pa.array(US, pa.timestamp("us")))
    ev = events_stream_source(spark, events_dir)
    assert ev.isStreaming
    assert dict(ev.dtypes)["ts"] == "bigint"
    sink = "events_schema_sink"
    q = (
        ev.writeStream.outputMode("append").format("memory").queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(r.ts for r in spark.table(sink).collect())
    assert got == sorted(u * 1000 for u in US)


def test_asof_join_semantics(spark):
    """Backward as-of: latest right ts <= left ts per key; inclusive
    same-ts match; max-tiebreak among same-ts rights; NULL when no
    prior right; keys isolated."""
    from ngff_zarr_spark.functions.events import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10), (1, 205, 11), (2, 150, 20), (3, 99, 30)],
        "user_id long, ts long, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, 100, 1000),  # same-ts: matches left (1,100) inclusively
            (1, 100, 1001),  # same (key, ts): max event_id wins
            (1, 200, 1002),
            (2, 149, 2000),
            # user 3 has no right rows at all
        ],
        "user_id long, ts long, event_id long",
    )
    out = {
        (r.user_id, r.ts): (r.event_id, r.event_id_asof, r.ts_asof)
        for r in asof_join(left, right).collect()
    }
    assert out[(1, 100)] == (10, 1001, 100)   # inclusive + max tiebreak
    assert out[(1, 205)] == (11, 1002, 200)   # latest prior
    assert out[(2, 150)] == (20, 2000, 149)   # keys isolated
    assert out[(3, 99)] == (30, None, None)   # left-outer NULLs


def test_asof_join_null_value_from_matched_row(spark):
    """A NULL in the matched right row's value column must stay NULL —
    never be papered over by an older right row's non-null value (the
    struct-fill contract: all output columns come from ONE matched
    row, as a true as-of join / DuckDB ASOF returns)."""
    from ngff_zarr_spark.functions.events import asof_join

    left = spark.createDataFrame([(1, 300, 10)], "user_id long, ts long, event_id long")
    right = spark.createDataFrame(
        [(1, 100, 7.0), (1, 200, None)], "user_id long, ts long, value double"
    )
    r = asof_join(
        left, right, value_cols=("value",), skew_safe=False
    ).collect()[0]
    assert r.ts_asof == 200 and r.value_asof is None
    # segmented twin: same contract, including when the null-valued
    # match arrives via the carry scan (segment width 50 puts the
    # matched right row two segments before the left row)
    from ngff_zarr_spark.functions.events import asof_join_segmented

    rs = asof_join_segmented(
        left, right, value_cols=("value",), segment_ns=50
    ).collect()[0]
    assert rs.ts_asof == 200 and rs.value_asof is None


def test_asof_join_forward_nearest_tolerance(spark):
    """Forward: smallest right ts >= left ts, inclusive, max-tiebreak
    at same ts. Nearest: closer of the two, backward wins exact-distance
    ties. Tolerance: matches farther than the bound become NULL."""
    from ngff_zarr_spark.functions.events import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10), (1, 205, 11), (2, 150, 20), (3, 99, 30)],
        "user_id long, ts long, event_id long",
    )
    right = spark.createDataFrame(
        [(1, 100, 1000), (1, 100, 1001), (1, 200, 1002), (1, 300, 1003),
         (2, 149, 2000), (2, 152, 2001)],
        "user_id long, ts long, event_id long",
    )

    fwd = {
        (r.user_id, r.ts): (r.event_id_asof, r.ts_asof)
        for r in asof_join(left, right, direction="forward").collect()
    }
    assert fwd[(1, 100)] == (1001, 100)   # inclusive + max tiebreak
    assert fwd[(1, 205)] == (1003, 300)   # next at-or-after
    assert fwd[(2, 150)] == (2001, 152)
    assert fwd[(3, 99)] == (None, None)

    near = {
        (r.user_id, r.ts): (r.event_id_asof, r.ts_asof)
        for r in asof_join(left, right, direction="nearest").collect()
    }
    assert near[(1, 205)] == (1002, 200)  # 5 back < 95 forward
    assert near[(2, 150)] == (2000, 149)  # distance 1 vs 2
    assert near[(3, 99)] == (None, None)

    # exact-distance tie -> backward wins: right at 149 and 151, left 150
    tie = asof_join(
        spark.createDataFrame([(9, 150, 99)], "user_id long, ts long, event_id long"),
        spark.createDataFrame(
            [(9, 149, 1), (9, 151, 2)], "user_id long, ts long, event_id long"
        ),
        direction="nearest",
    ).collect()[0]
    assert (tie.event_id_asof, tie.ts_asof) == (1, 149)

    tol = {
        (r.user_id, r.ts): (r.event_id_asof, r.ts_asof)
        for r in asof_join(left, right, tolerance=5).collect()
    }
    assert tol[(1, 205)] == (1002, 200)   # distance 5 <= 5 kept
    assert tol[(1, 100)] == (1001, 100)   # distance 0 kept
    assert tol[(2, 150)] == (2000, 149)
    tol2 = {
        (r.user_id, r.ts): (r.event_id_asof, r.ts_asof)
        for r in asof_join(left, right, tolerance=4).collect()
    }
    assert tol2[(1, 205)] == (None, None)  # distance 5 > 4 dropped


def test_asof_join_plan_no_join_node(spark):
    """The as-of composition must plan as union + ONE exchange + window
    — no join operator of any kind (the scale property)."""
    import contextlib
    import io

    from ngff_zarr_spark.functions.events import asof_join

    left = spark.createDataFrame([(1, 100, 10)], "user_id long, ts long, event_id long")
    right = spark.createDataFrame([(1, 99, 1)], "user_id long, ts long, event_id long")
    df = asof_join(left, right, skew_safe=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan
    for join_node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_node not in plan, join_node


def test_asof_segmented_plan_structure(spark):
    """The skew-safe twin's scale properties, pinned in the physical
    plan: the events-sized windows key on (user_id, _seg) — never on
    user_id alone over event rows — and the carry join is an EQUI join
    on (user_id, _seg) (no nested-loop/cartesian fallback)."""
    import contextlib
    import io

    from ngff_zarr_spark.functions.events import asof_join_segmented

    left = spark.createDataFrame([(1, 100, 10)], "user_id long, ts long, event_id long")
    right = spark.createDataFrame([(1, 99, 1)], "user_id long, ts long, event_id long")
    df = asof_join_segmented(left, right, segment_ns=7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # every window over _r (the events-sized fill) includes _seg in its
    # partition spec; only the tiny carry/summary scans key on user alone
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "_r#" in line and "last(" in line.lower():
            assert "_seg" in line.split("windowspecdefinition", 1)[1][:120], line


def test_range_join_broadcasts_windows(spark):
    """range_join: interval side broadcast; events within [start, end)
    only."""
    import contextlib
    import io

    from ngff_zarr_spark.functions.events import range_join

    events = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "event_id long, ts long"
    )
    windows = spark.createDataFrame(
        [(0, 50), (100, 120)], "start_ts long, end_ts long"
    )
    out = range_join(events, windows).select("event_id", "start_ts").collect()
    got = sorted((r.event_id, r.start_ts) for r in out)
    assert got == [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (10, 100), (11, 100)]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(events, windows).explain("formatted")
    assert "BroadcastNestedLoopJoin" in buf.getvalue()


def test_range_join_bucketed_matches_broadcast(spark):
    """The large-large bucketed plan returns the same pairs as the
    broadcast plan (each pair meets in exactly one bucket — no dups),
    handles intervals spanning many buckets, empty intervals, and
    auto-derived width; the plan is an EQUI-join (never a broadcast
    nested-loop)."""
    import contextlib
    import io

    from ngff_zarr_spark.functions.events import range_join

    events = spark.createDataFrame(
        [(i, i * 7) for i in range(60)], "event_id long, ts long"
    )
    windows = spark.createDataFrame(
        [(0, 50, "a"), (45, 46, "b"), (40, 300, "c"), (100, 100, "empty"),
         (120, 90, "inverted"), (399, 400, "edge")],
        "start_ts long, end_ts long, tag string",
    )
    want = sorted(
        (r.event_id, r.tag)
        for r in range_join(events, windows).select("event_id", "tag").collect()
    )
    for width in (None, 1, 7, 64, 10_000):
        df = range_join(events, windows, strategy="bucketed", bucket_width=width)
        got = sorted((r.event_id, r.tag) for r in df.select("event_id", "tag").collect())
        assert got == want, f"width={width}"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(events, windows, strategy="bucketed", bucket_width=64).explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# r8: brute-force cross-check of asof_join — a THIRD independent
# implementation (pure Python, O(n^2)) against random inputs, all three
# directions, with and without tolerance. The DuckDB oracle checks the
# backward gate; this covers the full parameter space.

from hypothesis import given, settings
from hypothesis import strategies as st


def _brute_asof(left_rows, right_rows, direction, tolerance):
    out = []
    for u, lts, lid in left_rows:
        cands = []
        for ru, rts, rid in right_rows:
            if ru != u:
                continue
            if direction == "backward" and rts <= lts:
                cands.append((rts, rid))
            elif direction == "forward" and rts >= lts:
                cands.append((rts, rid))
            elif direction == "nearest":
                cands.append((rts, rid))
        best = None
        if cands:
            if direction == "backward":
                m = max(t for t, _ in cands)
            elif direction == "forward":
                m = min(t for t, _ in cands)
            else:
                dist = min(abs(t - lts) for t, _ in cands)
                back = [t for t, _ in cands if t <= lts and lts - t == dist]
                m = max(back) if back else min(
                    t for t, _ in cands if abs(t - lts) == dist
                )
            # among same-ts right rows the greatest value col wins
            rid = max(r for t, r in cands if t == m)
            if tolerance is None or abs(m - lts) <= tolerance:
                best = (m, rid)
        out.append((u, lts, lid, best))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.sampled_from([None, 5, 50]),
)
def test_asof_join_matches_brute_force(spark, seed, direction, tolerance):
    import numpy as np
    import pandas as pd

    from ngff_zarr_spark.functions.events import asof_join

    rng = np.random.default_rng(seed)
    n_users = 4
    left_rows = [
        (int(rng.integers(n_users)), int(rng.integers(0, 100)), i)
        for i in range(25)
    ]
    right_rows = [
        (int(rng.integers(n_users)), int(rng.integers(0, 100)), 1000 + i)
        for i in range(25)
    ]
    left = spark.createDataFrame(
        pd.DataFrame(left_rows, columns=["user_id", "ts", "lid"])
    )
    right = spark.createDataFrame(
        pd.DataFrame(right_rows, columns=["user_id", "ts", "event_id"])
    )
    def normalize(rows):
        return sorted(
            (
                r["user_id"], r["ts"], r["lid"],
                None if r["event_id_asof"] is None
                else (r["ts_asof"], r["event_id_asof"]),
            )
            for r in rows
        )

    got_n = normalize(asof_join(
        left, right, key="user_id", ts_col="ts", value_cols=("event_id",),
        direction=direction, tolerance=tolerance, skew_safe=False,
    ).collect())
    want = _brute_asof(left_rows, right_rows, direction, tolerance)
    assert got_n == want
    # skew-safe twin: identical for every direction/tolerance, at a
    # segment width that splits the ts range (17) and at 1 (every ts
    # its own segment — all matching rides on the carry scan)
    from ngff_zarr_spark.functions.events import asof_join_segmented

    for seg in (17, 1):
        got_seg = normalize(asof_join_segmented(
            left, right, key="user_id", ts_col="ts",
            value_cols=("event_id",), direction=direction,
            tolerance=tolerance, segment_ns=seg,
        ).collect())
        assert got_seg == want, seg
