"""Text / dedup / similarity operators: semantic sanity checks on a tiny
in-memory corpus (engine-vs-oracle equivalence is covered by the gate)."""

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions import (
    cosine_topk,
    exact_dedup,
    lang_id,
    minhash_candidates,
    ngram_jaccard_pairs,
    quality_score,
    simhash,
    simhash_candidates,
    token_count,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 43),  # exact dup
        (2, "the quick brown fox leaps over the lazy dog", "en", "s", 43),  # near dup
        (3, "completely different words appear here today folks", "en", "s", 50),
        (4, "el la de que y en un por con los gatos", "es", "s", 38),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_dedup_groups(corpus):
    out = {r["representative"]: r["n_docs"] for r in exact_dedup(corpus).collect()}
    assert out[0] == 2  # docs 0 and 1 collapse
    assert sum(out.values()) == 5


def test_minhash_finds_near_dup(corpus):
    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in minhash_candidates(corpus).collect()}
    assert pairs[(0, 1)] == 1.0           # identical docs agree on every perm
    # (jaccard-0.4 pairs hit a 4-row band only ~10% of the time — by design)
    assert (0, 3) not in pairs and (0, 4) not in pairs  # unrelated docs never collide


def test_ngram_jaccard_exact_value(corpus):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(corpus).collect()}
    assert pairs[(0, 1)] == 1.0
    # 7 shingles each, 4 shared ("fox jumps over" vs "fox leaps over" differ in 3)
    assert pairs[(0, 2)] == pytest.approx(4 / 10, abs=1e-6)


def test_simhash_near_dup_distance(corpus):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
    assert sigs[0] == sigs[1]
    ham = bin(sigs[0] ^ sigs[2]).count("1")
    far = bin(sigs[0] ^ sigs[3]).count("1")
    assert ham < far


def test_lang_id_votes(corpus):
    out = {r["doc_id"]: r["pred_lang"] for r in lang_id(corpus).collect()}
    assert out[0] == "en"
    assert out[4] == "es"


def test_token_and_quality(corpus):
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(corpus).collect()}
    assert tc[0] == 9
    q = {r["doc_id"]: r["stopword_ratio"] for r in quality_score(corpus).collect()}
    assert q[0] == pytest.approx(2 / 9, abs=1e-6)  # 'the' appears twice in 9 tokens


def test_cosine_topk_self_similar(spark):
    import math

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = cosine_topk(emb, [0], k=2, dim=4).collect()
    assert [r["neighbor_id"] for r in out] == [1, 2]
    assert out[0]["cosine"] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-4)


def test_gopher_quality_signals(spark):
    """Gopher rules: a normal-length doc with stopwords passes; a short
    doc and a doc dominated by one repeated bigram fail; signal values
    are exact."""
    from ngff_zarr_spark.functions.text import gopher_quality

    good = "the quick brown fox jumps over a lazy dog " * 6  # 54 words
    repeaty = "spam ham " * 30  # 60 words, one bigram dominates
    rows = [
        (0, good.strip(), "en", "s", 0),
        (1, "too short", "en", "s", 0),
        (2, repeaty.strip(), "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(docs).collect()}
    assert out[0]["passes"] is True
    assert out[0]["n_words"] == 54
    assert out[1]["passes"] is False  # n_words < 50
    assert out[1]["n_words"] == 2
    assert out[2]["passes"] is False  # top bigram fraction >> 0.18
    assert out[2]["top_bigram_frac"] > 0.4
    # dup_word_frac: "spam ham"x30 has 2 distinct of 60 words
    assert abs(out[2]["dup_word_frac"] - (1 - 2 / 60)) < 1e-6  # rounded to 6dp


def test_dup_shingle_frac(spark):
    """Docs sharing 3-gram shingles get a positive duplicated fraction;
    a unique doc gets 0."""
    from ngff_zarr_spark.functions.dedup import dup_shingle_frac

    rows = [
        (0, "alpha beta gamma delta epsilon", "en", "s", 0),
        (1, "alpha beta gamma zeta eta", "en", "s", 0),  # shares 'alpha beta gamma'
        (2, "totally different words here now", "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r.asDict() for r in dup_shingle_frac(docs).collect()}
    assert out[0]["n_shingles"] == 3 and out[0]["n_dup_shingles"] == 1
    assert abs(out[0]["dup_frac"] - 1 / 3) < 1e-5
    assert out[1]["n_dup_shingles"] == 1
    assert out[2]["n_dup_shingles"] == 0 and out[2]["dup_frac"] == 0.0


def test_hash_split_deterministic_and_monotone(spark):
    """hash_split: same doc -> same split every run; growing val_frac
    only MOVES docs train->val (monotone growth: eval sets stay stable
    as they are enlarged); fractions roughly honored."""
    from ngff_zarr_spark.functions.sampling import hash_split

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text"),
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.lit(1).alias("n_chars"),
    )
    a = {r.doc_id: r.split for r in hash_split(docs, val_frac=0.1).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, val_frac=0.1).collect()}
    assert a == b  # deterministic
    wide = {r.doc_id: r.split for r in hash_split(docs, val_frac=0.2).collect()}
    for d, s in a.items():
        if s == "val":
            assert wide[d] == "val"  # monotone growth
    n_val = sum(1 for s in a.values() if s == "val")
    assert 120 < n_val < 280  # ~10% of 2000, hash-binomial spread
    # different salt re-rolls
    c = {r.doc_id: r.split for r in hash_split(docs, val_frac=0.1, salt="other").collect()}
    assert c != a


def test_stratified_sample_per_stratum(spark):
    from ngff_zarr_spark.functions.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "t", "en", f"src{i % 3}", 1) for i in range(60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = stratified_sample(docs, strata_col="source", k=4).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert set(by_src) == {"src0", "src1", "src2"}
    assert all(len(v) == 4 for v in by_src.values())
    # deterministic across calls
    again = stratified_sample(docs, strata_col="source", k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
