"""Temperature mixture resampling (functions/corpus.temperature_mixture)
pinned against a pure-python integer-arithmetic recomputation, plus the
alpha=1 identity (natural proportions realize exactly once per doc),
contiguous epoch numbering, and report/realization consistency."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.corpus import (
    MIX_BUCKETS,
    temperature_mixture,
    temperature_mixture_report,
)


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute(rows, alpha, budget=None, salt="temp"):
    counts = {}
    for _doc_id, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    w = {
        g: math.floor(math.pow(float(n), alpha) * MIX_BUCKETS + 0.5)
        for g, n in counts.items()
    }
    s = sum(w.values())
    b = budget if budget is not None else len(rows)
    rate = {g: (MIX_BUCKETS * b * w[g]) // (s * counts[g]) for g in counts}
    out = []
    for doc_id, lang in rows:
        bucket = _h64(f"{salt}:{doc_id}") % MIX_BUCKETS
        n_full, frac = divmod(rate[lang], MIX_BUCKETS)
        m = n_full + (1 if bucket < frac else 0)
        out.extend((doc_id, lang, e) for e in range(m))
    return sorted(out)


CORPUS = [(i, "big") for i in range(40)] + [(40 + i, "small") for i in range(5)] + [
    (45 + i, "mid") for i in range(15)
]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(d, f"text {d}", g) for d, g in rows], "doc_id long, text string, lang string"
    )


@pytest.mark.parametrize(
    "alpha,budget", [(0.5, None), (0.3, None), (0.7, 120), (0.5, 30)]
)
def test_mixture_matches_brute_force(spark, alpha, budget):
    got = sorted(
        (r["doc_id"], r["lang"], r["epoch"])
        for r in temperature_mixture(
            _docs(spark, CORPUS), alpha=alpha, budget=budget
        ).collect()
    )
    assert got == _brute(CORPUS, alpha, budget)


def test_alpha_one_is_identity(spark):
    """alpha=1 with the default budget keeps natural proportions: the
    integer rate is exactly 10^6 for every group, so every document is
    emitted exactly once at epoch 0."""
    mix = temperature_mixture(_docs(spark, CORPUS), alpha=1.0).collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in mix) == [
        (d, 0) for d, _ in CORPUS
    ]


def test_epochs_are_contiguous_from_zero(spark):
    mix = temperature_mixture(_docs(spark, CORPUS), alpha=0.3).collect()
    per_doc = {}
    for r in mix:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert per_doc, "alpha=0.3 must upsample something"
    for eps in per_doc.values():
        assert sorted(eps) == list(range(len(eps)))


def test_low_resource_upsampled_high_resource_downsampled(spark):
    rep = {
        r["lang"]: r
        for r in temperature_mixture_report(
            _docs(spark, CORPUS), alpha=0.5
        ).collect()
    }
    assert rep["small"]["rate_micro"] > MIX_BUCKETS  # upsampled
    assert rep["big"]["rate_micro"] < MIX_BUCKETS  # downsampled
    assert rep["small"]["n_emitted"] >= rep["small"]["n_total"]


def test_report_consistent_with_realization(spark):
    docs = _docs(spark, CORPUS)
    rep = temperature_mixture_report(docs, alpha=0.5)
    mix_counts = (
        temperature_mixture(docs, alpha=0.5)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    joined = rep.join(mix_counts, "lang", "left").select(
        "lang", "n_emitted", F.coalesce(F.col("m"), F.lit(0)).alias("m")
    )
    for r in joined.collect():
        assert r["n_emitted"] == r["m"]
