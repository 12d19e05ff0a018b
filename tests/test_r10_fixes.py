"""Round-10 ADVICE regression pins.

1. streaming_asof_attribution: when micro-batches arrive OUT of time
   order, a purchase whose only candidate is a state-carried click
   NEWER than the purchase must emit NULL (backward as-of can never
   match forward in time) — previously the carry was used
   unconditionally.
2. exact_percentiles_bucketed: a group whose values are ALL NULL must
   survive with n=COUNT(*) and NULL quantiles, exactly like the plain
   `percentile` aggregate whose oracle the gate shares.
"""

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F


def _write_file(spark, path, rows):
    import shutil

    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path + ".tmp")
    part = [f for f in os.listdir(path + ".tmp") if f.endswith(".parquet")][0]
    os.replace(os.path.join(path + ".tmp", part), path)
    shutil.rmtree(path + ".tmp", ignore_errors=True)


def test_stream_asof_out_of_order_carry_is_masked(spark, tmp_path):
    """File 1 (drained first) holds a LATE click; file 2 holds EARLIER
    purchases. The carried click is physically in the purchase's
    future, so the match must be NULL — and a second purchase after
    the carried click must still use it."""
    from ngff_zarr_spark.streaming.pipeline import streaming_asof_attribution

    d = str(tmp_path / "events")
    os.makedirs(d, exist_ok=True)
    f1 = [
        # user 1: click at ts=5000 arrives in the FIRST batch
        (100, 5000, 1, "click", 0.0),
    ]
    f2 = [
        # user 1: purchase BEFORE the carried click -> NULL (the carry
        # at ts=5000 is in this purchase's future)
        (200, 1000, 1, "purchase", 0.0),
        # user 1: purchase AFTER the carried click -> matches it
        (201, 6000, 1, "purchase", 0.0),
    ]
    for i, rows in enumerate((f1, f2)):
        _write_file(spark, os.path.join(d, f"f{i}.parquet"), rows)
        time.sleep(0.05)  # distinct mtimes: f1 drains first

    table = f"asof_ooo_{uuid.uuid4().hex[:8]}"
    _, start = streaming_asof_attribution(
        spark, d, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q = start(table)
    assert q.awaitTermination(180)
    got = {
        r.event_id: (r.event_id_click, r.ts_click)
        for r in spark.sql(f"select * from {table}").collect()
    }
    assert got == {
        200: (None, None),  # carried click is newer than the purchase
        201: (100, 5000),   # same carry, valid for the later purchase
    }


def test_percentiles_bucketed_all_null_group_survives(spark):
    from ngff_zarr_spark.functions.events import exact_percentiles_bucketed

    ev = spark.createDataFrame(
        [
            ("a", 1.0),
            ("a", 2.0),
            ("a", 3.0),
            ("b", None),
            ("b", None),
        ],
        "event_type string, value double",
    )
    got = {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in exact_percentiles_bucketed(ev).collect()
    }
    # the plain aggregate's semantics: COUNT(*) incl. NULLs, quantiles
    # over non-NULLs only; an all-NULL group yields NULL quantiles
    assert got["a"] == (3, 2.0, 2.8, 2.98)
    assert got["b"] == (2, None, None, None)

    # cross-check group "b"'s survival against Spark's own aggregate
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
        )
        .collect()
    )
    want = {r.event_type: (r.n, r.p50) for r in plain}
    assert {k: (v[0], v[1]) for k, v in got.items()} == want


def test_skew_safe_defaults_dispatch(spark):
    """r10 default flip: the default-named APIs return the SKEW-SAFE
    plans; skew_safe=False is the explicit plain escape. Pinned by
    plan structure: the segmented as-of carries a join node (the carry
    hand-back) that the plain union-window form must not have."""
    import contextlib
    import io

    from ngff_zarr_spark.functions.events import (
        asof_join,
        exact_percentiles,
        exact_percentiles_bucketed,
        sessionize_counts,
    )

    left = spark.createDataFrame(
        [(1, 100, 10)], "user_id long, ts long, event_id long"
    )
    right = spark.createDataFrame(
        [(1, 99, 1)], "user_id long, ts long, event_id long"
    )

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    assert "Join" in plan_of(asof_join(left, right))  # carry hand-back
    assert "Join" not in plan_of(asof_join(left, right, skew_safe=False))
    # sessionize: the segmented plan partitions the big window by
    # (user, segment) — visible as the _seg expression
    ev = spark.createDataFrame([(1, 100)], "user_id long, ns long")
    assert "_seg" in plan_of(sessionize_counts(ev, 10))
    assert "_seg" not in plan_of(sessionize_counts(ev, 10, skew_safe=False))

    # percentile entry point: default == bucketed values, and the
    # plain escape agrees (tiny layout incl. interpolation)
    pev = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 11)] + [("b", 7.0)],
        "event_type string, value double",
    )
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(exact_percentiles(pev)) == rows(
        exact_percentiles_bucketed(pev)
    )
    assert rows(exact_percentiles(pev)) == rows(
        exact_percentiles(pev, skew_safe=False)
    )
