"""Sliding-window HLL distinct (functions/sketch.sliding_distinct_users):
the max-merged trailing-window sketch must EQUAL the sketch a single
pass over that window's raw events builds — merge introduces zero
error beyond HLL itself — plus window-boundary semantics."""

from pyspark.sql import functions as F

import ngff_zarr_spark.gate as gate
from ngff_zarr_spark.functions.sketch import hll_distinct, sliding_distinct_users

HOUR_NS = 3_600_000_000_000


def _ev(spark, rows):
    return spark.createDataFrame(rows, "ts long, user_id long")


def test_merge_equals_single_pass(spark, sf_dir):
    """For every output hour of the real corpus, the merged register
    checksum/estimate equals hll_distinct over exactly that window's
    raw events (registers are max-mergeable: no merge error)."""
    ev = gate._events(spark, sf_dir).select("ts", "user_id")
    got = {
        r["hour_epoch"]: (r["n_nonempty"], r["reg_checksum"], r["est"])
        for r in sliding_distinct_users(ev).collect()
    }
    # spot-check 5 hours across the range against the single-pass form
    hours = sorted(got)
    for he in [hours[0], hours[len(hours) // 4], hours[len(hours) // 2],
               hours[-2], hours[-1]]:
        lo_ns = (he // 3600 - 23) * HOUR_NS
        hi_ns = (he // 3600 + 1) * HOUR_NS
        window = ev.filter((F.col("ts") >= lo_ns) & (F.col("ts") < hi_ns))
        single = hll_distinct(window, "user_id").collect()[0]
        assert got[he] == (
            single["n_nonempty"], single["reg_checksum"], single["est"]
        ), he


def test_window_boundaries(spark):
    """Users 24h or more before an output hour must not count; users
    within the trailing 24 do."""
    rows = [
        (0 * HOUR_NS + 5, 1),
        (23 * HOUR_NS + 5, 2),   # within hour 23's trailing window
        (24 * HOUR_NS + 5, 3),   # hour 0's user has aged out by now
    ]
    got = {
        r["hour_epoch"] // 3600: r["n_nonempty"]
        for r in sliding_distinct_users(_ev(spark, rows)).collect()
    }
    # hour 0: user 1 only; hour 23: users 1+2 (hour 0 still inside);
    # hour 24: users 2+3 (hour 0 aged out)
    assert got[0] == 1
    assert got[23] == 2
    assert got[24] == 2


def test_only_hours_with_data_emit(spark):
    rows = [(0 * HOUR_NS, 1), (100 * HOUR_NS, 2)]
    hours = sorted(
        r["hour_epoch"] // 3600
        for r in sliding_distinct_users(_ev(spark, rows)).collect()
    )
    assert hours == [0, 100]
