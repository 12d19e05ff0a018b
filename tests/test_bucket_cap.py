"""Bucket-occupancy cap for LSH band joins (_capped_band_pairs).

The cap is THE skew guard that keeps minhash/simhash/embedding
candidate joins linear when a boilerplate cluster (near-identical docs
that survive exact dedup via trivial perturbations) lands in one band
bucket. Below the cap the result is bit-identical to the uncapped
pairwise join; above it, star edges (bucket-min hub <-> member) preserve
connected components — so duplicate_clusters / dedup_keep decisions are
unchanged — while dropping the bucket from O(occ^2) to O(occ) edges.
"""

import time

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.dedup import (
    DEFAULT_MAX_BUCKET,
    _capped_band_pairs,
    duplicate_clusters,
    minhash_candidates,
    simhash_candidates,
)


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    # 40 docs in 8 groups of 5 near-identical variants: the shared stem
    # dominates every minhash band, so each group buckets together
    rows = []
    for g in range(8):
        stem = f"group {g} boilerplate header repeated terms alpha beta gamma delta epsilon"
        for v in range(5):
            rows.append((g * 5 + v, f"{stem} variant token {v}", "en", "s", 60))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_capped_pairs_identical_below_cap(near_dup_corpus):
    """Any cap above the largest bucket == the historical uncapped join."""
    uncapped = minhash_candidates(near_dup_corpus, max_bucket=None)
    capped = minhash_candidates(near_dup_corpus, max_bucket=DEFAULT_MAX_BUCKET)
    assert sorted(map(tuple, uncapped.collect())) == sorted(map(tuple, capped.collect()))


def test_star_edges_preserve_clusters(near_dup_corpus):
    """A cap SMALLER than the buckets flips them all to star edges; the
    pair list shrinks but connected components must be identical."""
    pairs_full = minhash_candidates(near_dup_corpus, max_bucket=None)
    pairs_star = minhash_candidates(near_dup_corpus, max_bucket=2)
    n_full, n_star = pairs_full.count(), pairs_star.count()
    assert n_star < n_full  # the cap really did degrade to stars
    cl_full = {tuple(r) for r in duplicate_clusters(pairs_full, reliable=False).collect()}
    cl_star = {tuple(r) for r in duplicate_clusters(pairs_star, reliable=False).collect()}
    assert cl_full == cl_star


def test_simhash_star_edges_preserve_clusters(spark):
    """For simhash the cluster guarantee is scoped to buckets of
    near-identical signatures (the docstring's contract — the Hamming
    verification may drop a star edge between genuinely-distant bucket
    members). Exact-duplicate groups (hamming 0) must cluster
    identically under stars."""
    rows = []
    for g in range(6):
        text = f"group {g} boilerplate header repeated terms alpha beta gamma delta"
        for v in range(5):
            rows.append((g * 5 + v, text, "en", "s", 60))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pairs_full = simhash_candidates(docs, max_bucket=None)
    pairs_star = simhash_candidates(docs, max_bucket=2)
    sel = lambda df: df.select("doc_a", "doc_b")
    assert pairs_star.count() < pairs_full.count()
    cl_full = {tuple(r) for r in duplicate_clusters(sel(pairs_full), reliable=False).collect()}
    cl_star = {tuple(r) for r in duplicate_clusters(sel(pairs_star), reliable=False).collect()}
    assert cl_full == cl_star


def test_adversarial_single_bucket_bounded(spark):
    """10^4 identical docs -> ONE bucket per band. Uncapped this is
    ~10^8 join pairs (the 100 TB never-finishes shape, scaled down);
    with the cap it must emit exactly n-1 star edges and finish fast."""
    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text every single time").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(43).alias("n_chars"),
    )
    t0 = time.monotonic()
    pairs = minhash_candidates(docs).collect()
    elapsed = time.monotonic() - t0
    # all 4 bands produce the SAME (hub=0, member) star edge set
    assert len(pairs) == n - 1
    assert {p["doc_a"] for p in pairs} == {0}
    assert all(p["est_jaccard"] == 1.0 for p in pairs)
    assert elapsed < 120, f"star-edge path took {elapsed:.0f}s — cap not effective?"


def test_capped_band_pairs_payload_hub(spark):
    """Star edges carry the HUB's payload on the _a side (min-by-struct),
    the member's on the _b side."""
    rows = [(i, 0, 7, 100 + i) for i in range(4)]  # one bucket of 4
    bands = spark.createDataFrame(rows, "doc_id long, band int, band_key long, sig long")
    out = _capped_band_pairs(bands, 2, payload=("sig",)).collect()
    assert sorted((r["doc_a"], r["doc_b"], r["sig_a"], r["sig_b"]) for r in out) == [
        (0, 1, 100, 101),
        (0, 2, 100, 102),
        (0, 3, 100, 103),
    ]
