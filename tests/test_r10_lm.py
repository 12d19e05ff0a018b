"""Hashed-bigram LM scoring (functions/lm): perplexity and DSIR
importance pinned against pure-python recomputations, plus the
direction/monotonicity properties the curation decisions rely on."""

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.lm import (
    LM_BUCKETS,
    MICRO,
    dsir_importance,
    lm_perplexity,
)


def _h64(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(t):
    return [x for x in " ".join(t.lower().split()).split(" ") if x]


def _bigrams(t, b=LM_BUCKETS):
    tk = _toks(t)
    return [
        (_h64(tk[i] + " " + tk[i + 1]) % b, _h64(tk[i]) % b)
        for i in range(len(tk) - 1)
    ]


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


CORPUS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the cat sat on the mat", "en"),  # exact repeat: most probable
    (2, "the dog sat on the mat", "en"),
    (3, "xylophone quark jabberwocky umbrage festoon", "en"),  # all-rare
    (4, "le chat est sur le tapis", "fr"),
    (5, "le chien est sur le tapis", "fr"),
    (6, "one", "en"),  # single token: no bigrams
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _brute_ppl(rows):
    c2, c1 = Counter(), Counter()
    for _, t, _l in rows:
        for g2, g1 in _bigrams(t):
            c2[g2] += 1
            c1[g1] += 1
    v = len(c2)
    out = {}
    for d, t, _l in rows:
        bs = _bigrams(t)
        if not bs:
            out[d] = (0, None, None)
            continue
        s = sum(
            math.floor(math.log2((c2[g2] + 1) / (c1[g1] + v)) * MICRO + 0.5)
            for g2, g1 in bs
        )
        out[d] = (len(bs), s, _tdiv(s, len(bs)))
    return out


def test_perplexity_matches_brute_force(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_micro"], r["avg_micro"])
        for r in lm_perplexity(_docs(spark)).collect()
    }
    assert got == _brute_ppl(CORPUS)


def test_perplexity_orders_common_above_rare(spark):
    got = {
        r["doc_id"]: r["avg_micro"] for r in lm_perplexity(_docs(spark)).collect()
    }
    # the thrice-seen sentence scores higher (less negative) than the
    # all-rare-tokens doc, and the no-bigram doc scores NULL
    assert got[0] > got[3]
    assert got[0] == got[1]  # identical docs, identical score
    assert got[6] is None


def test_external_reference_scoring(spark):
    """Scoring against a DISJOINT reference: grams unseen in ref get the
    add-one floor probability 1/V, so a doc of unseen text scores
    exactly n * floor(log2(1/V)*1e6+0.5)."""
    ref = _docs(spark, [(100, "aa bb cc dd ee ff gg hh", "en")])
    tgt = _docs(spark, [(0, "zz yy xx ww", "en")])
    v = len(set(g for g, _ in _bigrams("aa bb cc dd ee ff gg hh")))
    per_term = math.floor(math.log2(1.0 / v) * MICRO + 0.5)
    r = lm_perplexity(tgt, ref=ref).collect()[0]
    assert r["n_bigrams"] == 3
    assert r["logprob_micro"] == 3 * per_term


def _brute_dsir(rows, tgt_rows):
    ct, cr = Counter(), Counter()
    for _, t, _l in tgt_rows:
        for g2, _g1 in _bigrams(t):
            ct[g2] += 1
    for _, t, _l in rows:
        for g2, _g1 in _bigrams(t):
            cr[g2] += 1
    n_t, n_r = sum(ct.values()), sum(cr.values())
    out = {}
    for d, t, _l in rows:
        bs = _bigrams(t)
        if not bs:
            out[d] = (0, None, None)
            continue
        s = sum(
            math.floor(math.log2((ct[g2] + 1) / (n_t + LM_BUCKETS)) * MICRO + 0.5)
            - math.floor(math.log2((cr[g2] + 1) / (n_r + LM_BUCKETS)) * MICRO + 0.5)
            for g2, _g1 in bs
        )
        out[d] = (len(bs), s, _tdiv(s, len(bs)))
    return out


def test_dsir_matches_brute_force(spark):
    docs = _docs(spark)
    tgt = docs.filter(F.col("lang") == "fr")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["weight_micro"], r["weight_avg_micro"])
        for r in dsir_importance(docs, tgt).collect()
    }
    want = _brute_dsir(CORPUS, [r for r in CORPUS if r[2] == "fr"])
    assert got == want


def test_dsir_direction(spark):
    """Target-domain docs must outweigh out-of-domain docs under the
    target distribution."""
    docs = _docs(spark)
    tgt = docs.filter(F.col("lang") == "fr")
    got = {
        r["doc_id"]: r["weight_avg_micro"]
        for r in dsir_importance(docs, tgt).collect()
    }
    fr = [got[4], got[5]]
    en = [got[0], got[2], got[3]]
    assert min(fr) > max(en)
