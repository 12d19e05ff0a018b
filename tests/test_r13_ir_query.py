"""r13 IR serving path: free-text BM25 queries + shared-tf reuse
(VERDICT r12 ask #3)."""

from __future__ import annotations

import contextlib
import io
import math

from ngff_zarr_spark.functions.ir import (
    BM25_B,
    BM25_K1,
    TFIDF_SHINGLE_K,
    _shingle_tf,
    bm25_query_topk,
    bm25_topk,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "pack my box with five dozen liquor jugs again and again"),
    (4, "sphinx of black quartz judge my vow"),
    (5, "the quick brown fox naps beside the lazy dog"),
    (6, "completely unrelated text about spark physical plans"),
    (7, "the quick brown fox jumps over the lazy dog"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _brute_bm25(queries, max_df, k):
    """Brute-force free-text BM25 over DOCS."""
    n_total = len(DOCS)
    tf, df, dl = {}, {}, {}
    for d, text in DOCS:
        toks = text.lower().split()
        for i in range(max(0, len(toks) - TFIDF_SHINGLE_K + 1)):
            t = " ".join(toks[i : i + TFIDF_SHINGLE_K])
            tf[(d, t)] = tf.get((d, t), 0) + 1
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    for (d, _), c in tf.items():
        dl[d] = dl.get(d, 0) + c
    avgdl = sum(dl.values()) / len(dl)
    want = {}
    for qid, qtext in queries:
        toks = qtext.lower().split()
        qterms = {
            " ".join(toks[i : i + TFIDF_SHINGLE_K])
            for i in range(max(0, len(toks) - TFIDF_SHINGLE_K + 1))
        }
        qterms = {t for t in qterms if df.get(t, 10**9) <= max_df}
        scores = {}
        for d in dl:
            s = 0.0
            for t in qterms:
                c = tf.get((d, t), 0)
                if c:
                    idf = math.log(1.0 + (n_total - df[t] + 0.5) / (df[t] + 0.5))
                    s += idf * c * (BM25_K1 + 1.0) / (
                        c + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[d] / avgdl)
                    )
            if s > 0:
                scores[d] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        want[qid] = [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]
    return {q: v for q, v in want.items() if v}


def test_bm25_query_matches_reference(spark):
    queries = [
        (100, "the quick brown fox"),
        (101, "pack my box with five"),
        (102, "no matching words here whatsoever"),
    ]
    got = {}
    for r in bm25_query_topk(_docs_df(spark), queries, k=4, max_df=8).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for q in got:
        got[q].sort()
    assert got == _brute_bm25(queries, max_df=8, k=4)
    assert 102 not in got  # zero-hit query retrieves nothing, no crash


def test_bm25_query_equals_doc_as_query_on_same_text(spark):
    """A free-text query that IS a document's text ranks identically to
    the doc-as-query form for that document (same term space, same
    distinct-terms contract)."""
    doc_run = {
        (r.rank, r.doc_id, r.score)
        for r in bm25_topk(_docs_df(spark), [4], k=4, max_df=8).collect()
    }
    text_run = {
        (r.rank, r.doc_id, r.score)
        for r in bm25_query_topk(
            _docs_df(spark), [(4, DOCS[4][1])], k=4, max_df=8
        ).collect()
    }
    assert doc_run == text_run


def test_bm25_query_short_query_yields_no_terms(spark):
    """A query shorter than the shingle width retrieves nothing."""
    out = bm25_query_topk(_docs_df(spark), [(0, "too short")], k=3).collect()
    assert out == []


def test_bm25_query_plan_broadcasts_query_terms(spark):
    """The serving plan broadcasts the request-sized query term list
    onto the corpus tf join — the tf table never shuffles for a
    lookup — and contains no cartesian product."""
    from ngff_zarr_spark.functions import _scope

    # r19: bm25_query_topk returns a checkpoint leaf (call-scoped tf
    # cache); flip the inspection escape to receive the lazy plan
    old = _scope.PLAN_INSPECTION
    _scope.PLAN_INSPECTION = True
    try:
        plan = _plan(bm25_query_topk(_docs_df(spark), [(0, "the quick brown fox")]))
    finally:
        _scope.PLAN_INSPECTION = old
        spark.catalog.clearCache()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_shared_tf_feeds_all_subtrees_from_cache(spark):
    """bm25_topk(tf=persisted) serves every tf reference (df, dl,
    qterms, scoring join) from the cached table — the plan shows
    InMemoryRelation scans and no second tokenize→count subtree."""
    docs = _docs_df(spark)
    tf = _shingle_tf(docs).persist()
    try:
        plan = _plan(bm25_topk(docs, [0], k=3, tf=tf))
        assert "InMemoryTableScan" in plan
        # the shingle transform runs only inside the cached subtree's
        # build plan; the consuming plan never re-tokenizes
        consuming = plan.split("InMemoryRelation", 1)[0]
        assert "transform" not in consuming
    finally:
        tf.unpersist()
