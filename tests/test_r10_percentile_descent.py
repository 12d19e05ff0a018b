"""Value-skew descent for exact_percentiles_bucketed (VERDICT r9 ask
#4): uniform bucket boundaries concentrate a heavy-tailed group in one
bucket, so phase 4's per-bucket sort re-inherited the group-sized task
the twin exists to avoid. The r10 descent re-buckets any needed bucket
whose occupancy exceeds ``occupancy_bound`` by the bucket's OWN
min/max (up to ``descent_rounds`` times) and resolves constant-valued
buckets — the layout subdivision can never split — immediately.

Every test drives layouts where the located top-level bucket holds
>50 % of the group (asserted, not assumed) with a bound small enough
that descent MUST trigger, and pins bit-equality at 6dp against
Spark's buffering ``percentile`` aggregate. The knobs are cost knobs,
never correctness knobs.
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


def _bucketed(ev, **kw):
    return {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in exact_percentiles_bucketed(ev, **kw).collect()
    }


def _hot_bucket_frac(vals, n_buckets=1024):
    """Fraction of the group landing in its fullest top-level bucket —
    the premise check that the layout actually degenerates phase 4."""
    vmin, vmax = vals.min(), vals.max()
    if vmax == vmin:
        return 1.0
    b = np.minimum(
        n_buckets - 1, np.floor((vals - vmin) / (vmax - vmin) * n_buckets)
    )
    return np.bincount(b.astype(int)).max() / len(vals)


@pytest.mark.parametrize(
    "name,gen",
    [
        # lognormal sigma=4: vmax is ~e^16x the median, >99% of mass
        # in bucket 0
        ("lognormal", lambda rng, n: rng.lognormal(0.0, 4.0, size=n)),
        # pareto alpha=0.5: even heavier tail
        ("pareto", lambda rng, n: rng.pareto(0.5, size=n) + 1.0),
        # 99.9% exactly-identical values + a few spread: the constant
        # sub-bucket resolution path (uniform subdivision can't split
        # ties — descent alone would recurse forever)
        ("mass_ties", lambda rng, n: np.where(
            rng.random(n) < 0.999, 7.125, rng.random(n) * 1e6
        )),
        # two-sided: heavy cluster at 0 AND at 1e9, percentiles land
        # in both hot buckets
        ("bimodal_hot", lambda rng, n: np.where(
            rng.random(n) < 0.5, rng.normal(0, 1e-6, n), 1e9 + rng.normal(0, 1e-6, n)
        )),
    ],
)
def test_skewed_layouts_exact_with_forced_descent(spark, name, gen):
    rng = np.random.default_rng(23)
    rows, premise_checked = [], False
    for g, n in (("a", 4001), ("b", 700)):
        vals = gen(rng, n).astype(float)
        if n > 1000:
            frac = _hot_bucket_frac(vals)
            assert frac > 0.5, (name, frac)  # the layout really is hot
            premise_checked = True
        rows += [(g, float(v)) for v in vals]
    assert premise_checked
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["event_type", "value"]))
    want = _plain(ev)
    # bound=32 forces descent on the hot bucket; rounds=2 is the
    # production default
    got = _bucketed(ev, occupancy_bound=32, descent_rounds=2)
    assert got == want, name
    # rounds=0 must degrade to the pre-descent form exactly
    assert _bucketed(ev, occupancy_bound=32, descent_rounds=0) == want, name


def test_beyond_rounds_still_exact(spark):
    """A layout hot enough that 1 descent round cannot bound it stays
    EXACT (just degenerate-cost): the residual rows fall through to the
    final rank pass."""
    rng = np.random.default_rng(5)
    vals = rng.lognormal(0.0, 8.0, size=3001)
    ev = spark.createDataFrame(
        pd.DataFrame([("g", float(v)) for v in vals], columns=["event_type", "value"])
    )
    assert _bucketed(ev, occupancy_bound=8, descent_rounds=1) == _plain(ev)


def test_descent_with_nulls_and_singletons(spark):
    """NULL handling and 1-2 row groups are unchanged by descent."""
    rng = np.random.default_rng(9)
    rows = [("g", float(v)) for v in rng.lognormal(0, 4, 2001)]
    rows += [("g", None)] * 41 + [("solo", 3.5), ("nul", None)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    got = _bucketed(ev, occupancy_bound=16, descent_rounds=2)
    assert got == _plain(ev)
    assert got["nul"] == (1, None, None, None)


def test_property_any_bound_any_rounds(spark):
    """Hypothesis sweep: any p, any layout, any (bound, rounds,
    n_buckets) — selection equals the buffering aggregate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        p=st.floats(0.0, 1.0, allow_nan=False),
        n=st.integers(1, 300),
        n_buckets=st.sampled_from([2, 7, 64]),
        bound=st.sampled_from([1, 4, 33]),
        rounds=st.integers(0, 3),
    )
    def check(seed, p, n, n_buckets, bound, rounds):
        rng = np.random.default_rng(seed)
        vals = np.round(rng.lognormal(0, 3, size=n) * rng.choice([1, 1e6]), 3)
        ev = spark.createDataFrame(
            pd.DataFrame({"event_type": "g", "value": vals.astype(float)})
        )
        want = ev.agg(
            F.round(F.expr(f"percentile(value, {p!r})"), 6).alias("q")
        ).collect()[0].q
        got = exact_percentiles_bucketed(
            ev, ps=(p,), n_buckets=n_buckets,
            occupancy_bound=bound, descent_rounds=rounds,
        ).collect()[0]
        assert got.n == n
        assert got[2] == pytest.approx(want, abs=2e-6), (p, n, n_buckets, bound, rounds)

    check()
