"""Incremental (new-crawl vs existing-corpus) dedup — semantics and
the ref-side witness cap pinned on hand-checkable corpora."""

import pyspark.sql.functions as F  # noqa: F401

from ngff_zarr_spark.functions.dedup import (
    incremental_dedup,
    minhash_candidates_incremental,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
OTHER = "completely different content about spark distributed engines and zarr chunk stores"


def test_verbatim_recrawl_dropped_fresh_kept(spark):
    ref = _df(spark, [(1, BASE), (2, OTHER)])
    new = _df(spark, [
        (101, BASE),                      # verbatim re-crawl of ref 1
        (102, "entirely novel text about benchmark decontamination and token budgets for corpora"),
    ])
    out = {r.doc_id: r for r in incremental_dedup(new, ref).collect()}
    assert out[101].keep == 0 and out[101].best_est_jaccard == 1.0
    assert out[101].n_ref_matches >= 1
    assert out[102].keep == 1 and out[102].n_ref_matches == 0


def test_ref_never_self_paired(spark):
    """Two identical REF docs must not appear as a candidate pair —
    pairing is strictly new × ref."""
    ref = _df(spark, [(1, BASE), (2, BASE)])
    new = _df(spark, [(101, OTHER)])
    cand = minhash_candidates_incremental(new, ref).collect()
    assert cand == []


def test_witness_cap_still_flags(spark):
    """A ref-side bucket larger than the cap keeps only cap witnesses —
    but every colliding new doc is still flagged (one witness is
    enough), with n_ref_matches bounded by the cap."""
    ref = _df(spark, [(i, BASE) for i in range(10)])
    new = _df(spark, [(101, BASE)])
    out = incremental_dedup(new, ref, max_bucket=3).collect()[0]
    assert out.keep == 0
    assert 1 <= out.n_ref_matches <= 3
    # witnesses are the smallest ref ids
    cand = minhash_candidates_incremental(new, ref, max_bucket=3)
    refs = sorted(r.ref_doc for r in cand.collect())
    assert refs == [0, 1, 2]


def test_sub_threshold_overlap_kept(spark):
    """Sharing a few shingles (est below 0.5) is not a duplicate."""
    ref = _df(spark, [(1, BASE)])
    new = _df(spark, [(101, BASE.split(" ", 8)[-1] + " " + OTHER)])
    out = incremental_dedup(new, ref).collect()[0]
    assert out.keep == 1


def test_prebuilt_index_equals_direct_path(spark):
    """incremental_dedup over build_ref_index's precomputed corpus
    index must equal the direct (ref_docs) path row-for-row."""
    from ngff_zarr_spark.functions.dedup import build_ref_index

    ref = _df(spark, [(i, BASE if i % 2 == 0 else OTHER + f" v{i}") for i in range(8)])
    new = _df(spark, [(101, BASE), (102, "fresh and unrelated writing about parquet row groups")])
    direct = sorted(tuple(r) for r in incremental_dedup(new, ref).collect())
    wide, bands = build_ref_index(ref)
    indexed = sorted(
        tuple(r)
        for r in incremental_dedup(new, None, ref_wide=wide, ref_bands=bands).collect()
    )
    assert direct == indexed
