"""Hypothesis property sweeps for the r10 operators: keep-one substring
dedup, temperature mixture, and seeded shuffle each pinned against
pure-python recomputations over randomized corpora/parameters (the same
strategy the r9 skew twins use). Deterministic profiles — no flaky
examples; failures shrink to a minimal corpus."""

import hashlib
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ngff_zarr_spark.functions.corpus import MIX_BUCKETS, temperature_mixture
from ngff_zarr_spark.functions.sampling import seeded_shuffle
from ngff_zarr_spark.functions.spans import substring_dedup_stats

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _h64(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --- substring dedup ------------------------------------------------------

WORDS = ["aa", "bb", "cc", "dd"]  # tiny vocab → repeats are certain

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1,
    max_size=10,
)


def _brute_cut(rows, n):
    occ = {}
    for doc_id, toks in rows:
        for pos in range(max(0, len(toks) - n + 1)):
            occ.setdefault(tuple(toks[pos : pos + n]), []).append((doc_id, pos))
    removal = {}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        wit = min(sites)
        for site in sites:
            if site != wit:
                removal.setdefault(site[0], set()).add(site[1])
    out = {}
    for doc_id, toks in rows:
        covered = set()
        for p in removal.get(doc_id, ()):
            covered.update(range(p, p + n))
        nt = len(toks)
        out[doc_id] = (
            nt,
            max(0, nt - n + 1),
            len(removal.get(doc_id, ())),
            len(covered),
        )
    return out


@SET
@given(docs=docs_strategy, n=st.integers(min_value=2, max_value=5))
def test_substring_cut_property(spark, docs, n):
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_windows"], r["n_rep"], r["cut_tokens"])
        for r in substring_dedup_stats(df, n).collect()
    }
    assert got == _brute_cut(rows, n)


# --- temperature mixture --------------------------------------------------

mix_strategy = st.lists(
    st.integers(min_value=1, max_value=12),  # group sizes
    min_size=1,
    max_size=4,
)


def _brute_mix(rows, alpha, budget):
    counts = Counter(g for _, g in rows)
    w = {
        g: math.floor(math.pow(float(c), alpha) * MIX_BUCKETS + 0.5)
        for g, c in counts.items()
    }
    s = sum(w.values())
    b = budget if budget is not None else len(rows)
    rate = {g: (MIX_BUCKETS * b * w[g]) // (s * counts[g]) for g in counts}
    out = []
    for doc_id, g in rows:
        bucket = _h64(f"temp:{doc_id}") % MIX_BUCKETS
        n_full, frac = divmod(rate[g], MIX_BUCKETS)
        out.extend((doc_id, g, e) for e in range(n_full + (bucket < frac)))
    return sorted(out)


@SET
@given(
    sizes=mix_strategy,
    alpha=st.sampled_from([0.25, 0.5, 0.75, 1.0]),
    budget=st.one_of(st.none(), st.integers(min_value=1, max_value=60)),
)
def test_temperature_mixture_property(spark, sizes, alpha, budget):
    rows = []
    i = 0
    for gi, sz in enumerate(sizes):
        for _ in range(sz):
            rows.append((i, f"g{gi}"))
            i += 1
    df = spark.createDataFrame(
        [(d, "txt", g) for d, g in rows], "doc_id long, text string, lang string"
    )
    got = sorted(
        (r["doc_id"], r["lang"], r["epoch"])
        for r in temperature_mixture(df, alpha=alpha, budget=budget).collect()
    )
    assert got == _brute_mix(rows, alpha, budget)


# --- seeded shuffle -------------------------------------------------------


@SET
@given(
    ids=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60),
    seed=st.sampled_from(["a", "ep1", "zz"]),
    n_shards=st.integers(min_value=1, max_value=5),
)
def test_seeded_shuffle_property(spark, ids, seed, n_shards):
    df = spark.createDataFrame([(i,) for i in sorted(ids)], "doc_id long")
    got = sorted(
        (r["doc_id"], r["rank"], r["shard"])
        for r in seeded_shuffle(df, seed=seed, n_shards=n_shards).collect()
    )
    order = sorted(ids, key=lambda i: (_h64(f"{seed}:{i}"), i))
    n = len(order)
    want = sorted(
        (doc, rk, (rk * n_shards) // n) for rk, doc in enumerate(order)
    )
    assert got == want
