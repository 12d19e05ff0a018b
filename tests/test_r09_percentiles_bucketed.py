"""Histogram-descent exact percentiles (functions/events.py
exact_percentiles_bucketed) == Spark's buffering `percentile`
aggregate, bit-for-bit at 6dp, across adversarial value layouts.

The plain aggregate collects every value of a group into one
aggregation buffer (OOM at 10^9-row groups); the bucketed form's
per-task state is one histogram row per (group, bucket) plus the rows
of the <= 2 needed buckets per percentile.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.events import exact_percentiles_bucketed

PS = (0.5, 0.9, 0.99)


def _plain(ev):
    return {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                F.round(F.expr(f"percentile(value, {p})"), 6)
                .alias(f"p{int(round(p * 100))}")
                for p in PS
            ],
        ).collect()
    }


def _bucketed(ev, n_buckets=1024):
    return {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in exact_percentiles_bucketed(ev, n_buckets=n_buckets).collect()
    }


@pytest.mark.parametrize(
    "name,values",
    [
        ("normal", lambda rng, n: rng.normal(size=n)),
        # 5 distinct values: most buckets empty, heavy ties inside one
        ("ties", lambda rng, n: rng.integers(0, 5, size=n).astype(float)),
        # all-identical: vmin == vmax branch
        ("constant", lambda rng, n: np.full(n, 3.25)),
        # extreme skew: 99% in a tiny range + far outliers, exercising
        # the last-bucket clamp
        ("outliers", lambda rng, n: np.where(
            rng.random(n) < 0.99, rng.random(n), 1e9 * rng.random(n)
        )),
    ],
)
def test_matches_buffering_aggregate(spark, name, values):
    rng = np.random.default_rng(11)
    rows = []
    for g, n in (("a", 3001), ("b", 500), ("solo", 1), ("two", 2)):
        for v in values(rng, n):
            rows.append((g, float(v)))
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["event_type", "value"]))
    assert _bucketed(ev) == _plain(ev), name


def test_matches_on_sf_events_and_oracle_gate(spark, sf_dir):
    from ngff_zarr_spark.gate import (
        q_events_percentiles,
        q_events_percentiles_bucketed,
    )

    plain = {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in q_events_percentiles(spark, sf_dir).collect()
    }
    got = {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in q_events_percentiles_bucketed(spark, sf_dir).collect()
    }
    assert got == plain and len(plain) > 0


def test_null_values_ignored_like_percentile(spark):
    """`percentile` ignores NULLs while n reports COUNT(*) — the
    bucketed twin must use the non-null count for rank positions."""
    rows = [("g", float(v)) for v in range(100)] + [("g", None)] * 37
    ev = spark.createDataFrame(rows, "event_type string, value double")
    assert _bucketed(ev) == _plain(ev)
    assert _plain(ev)["g"][0] == 137  # n still counts the null rows


def test_arbitrary_percentiles_property(spark):
    """Any p in [0, 1] (not just the gate's three), any value layout:
    the bucketed selection equals the buffering aggregate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        p=st.floats(0.0, 1.0, allow_nan=False),
        n=st.integers(1, 400),
        n_buckets=st.sampled_from([2, 7, 64]),
    )
    def check(seed, p, n, n_buckets):
        rng = np.random.default_rng(seed)
        vals = np.round(rng.normal(size=n) * rng.choice([1, 100, 1e6]), 3)
        ev = spark.createDataFrame(
            pd.DataFrame({"event_type": "g", "value": vals.astype(float)})
        )
        want = ev.agg(
            F.round(F.expr(f"percentile(value, {p!r})"), 6).alias("q")
        ).collect()[0].q
        got = exact_percentiles_bucketed(
            ev, ps=(p,), n_buckets=n_buckets
        ).collect()[0]
        assert got.n == n
        assert got[2] == pytest.approx(want, abs=2e-6), (p, n, n_buckets)

    check()


def test_few_buckets_still_exact(spark):
    """n_buckets is a cost knob, never a correctness knob: even 2
    buckets only grow the second pass, the selected ranks are exact."""
    rng = np.random.default_rng(7)
    ev = spark.createDataFrame(
        pd.DataFrame(
            [("g", float(v)) for v in rng.normal(size=999)],
            columns=["event_type", "value"],
        )
    )
    assert _bucketed(ev, n_buckets=2) == _plain(ev)
