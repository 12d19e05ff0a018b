"""r12 IR operators: TF-IDF shingle weights + sparse top-k similarity
cross-checked against a brute-force numpy/python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.ir import (
    TFIDF_SHINGLE_K,
    tfidf_topk,
    tfidf_weights,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "pack my box with five dozen liquor jugs again and again"),
    (4, "sphinx of black quartz judge my vow"),
    (5, "the quick brown fox naps beside the lazy dog"),
    (6, "completely unrelated text about spark physical plans"),
    (7, "the quick brown fox jumps over the lazy dog"),  # dup of 0
]


def _ref_weights(docs, max_df):
    """Brute-force shingle TF-IDF (pure python)."""
    n_total = len(docs)
    per_doc = {}
    for doc_id, text in docs:
        toks = text.lower().split()
        sh = [
            " ".join(toks[i : i + TFIDF_SHINGLE_K])
            for i in range(max(0, len(toks) - TFIDF_SHINGLE_K + 1))
        ] if len(toks) >= TFIDF_SHINGLE_K else []
        tf = {}
        for s in sh:
            tf[s] = tf.get(s, 0) + 1
        per_doc[doc_id] = tf
    df = {}
    for tf in per_doc.values():
        for t in tf:
            df[t] = df.get(t, 0) + 1
    out = {}
    for doc_id, tf in per_doc.items():
        out[doc_id] = {
            t: c * (math.log((1.0 + n_total) / (1.0 + df[t])) + 1.0)
            for t, c in tf.items()
            if df[t] <= max_df
        }
    return out


def _ref_topk(docs, k, max_df):
    w = _ref_weights(docs, max_df)
    norms = {d: math.sqrt(sum(x * x for x in ws.values())) for d, ws in w.items()}
    out = {}
    for a, wa in w.items():
        scored = []
        for b, wb in w.items():
            if a == b:
                continue
            dot = sum(wa[t] * wb[t] for t in wa.keys() & wb.keys())
            if dot > 0:
                scored.append((round(dot / (norms[a] * norms[b]), 6), b))
        scored.sort(key=lambda sb: (-sb[0], sb[1]))
        out[a] = [(r + 1, b, c) for r, (c, b) in enumerate(scored[:k])]
    return out


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tfidf_weights_match_reference(spark):
    got = {
        (r.doc_id, r.term): r.w
        for r in tfidf_weights(_docs_df(spark), max_df=8).collect()
    }
    want = {
        (d, t): w for d, ws in _ref_weights(DOCS, 8).items() for t, w in ws.items()
    }
    assert set(got) == set(want)
    for key, w in want.items():
        assert got[key] == pytest.approx(w, abs=1e-9), key


def test_tfidf_topk_matches_reference(spark):
    got = {}
    for r in tfidf_topk(_docs_df(spark), k=3, max_df=8).collect():
        got.setdefault(r.doc_a, []).append((r.rank, r.doc_b, r.cos))
    for a in got:
        got[a].sort()
    want = _ref_topk(DOCS, 3, 8)
    want = {a: v for a, v in want.items() if v}
    assert got == want


def test_tfidf_exact_duplicates_are_rank1_with_cos1(spark):
    top = tfidf_topk(_docs_df(spark), k=3, max_df=8)
    r1 = {r.doc_a: (r.doc_b, r.cos) for r in top.filter("rank = 1").collect()}
    assert r1[0] == (7, 1.0)
    assert r1[7] == (0, 1.0)


def test_tfidf_max_df_cap_drops_stop_shingles(spark):
    """With max_df=1 every shared shingle is dropped, so no pairs
    survive — the cap bounds pairing work by construction."""
    assert tfidf_topk(_docs_df(spark), k=3, max_df=1).count() == 0


def test_tfidf_topk_plan_has_no_cartesian(spark):
    import contextlib
    import io

    from ngff_zarr_spark.functions import _scope

    # r19: tfidf_topk returns a checkpoint leaf (call-scoped weight
    # cache); flip the inspection escape to receive the lazy plan
    old = _scope.PLAN_INSPECTION
    _scope.PLAN_INSPECTION = True
    try:
        df = tfidf_topk(_docs_df(spark), k=3)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
    finally:
        _scope.PLAN_INSPECTION = old
        spark.catalog.clearCache()
    plan = buf.getvalue()
    # 1-row N broadcast is the only nested-loop-ish join allowed
    assert plan.count("CartesianProduct") == 0
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


# ------------------------------------------------- quality classifier


def _h64_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_score(text: str, n_feat: int = 1024) -> tuple[int, int]:
    toks = text.lower().split()
    sc = sum(
        _h64_py(f"qcw:{_h64_py('qc:' + t) % n_feat}") % 2001 - 1000 for t in toks
    )
    return len(toks), sc


def test_quality_classifier_scores_match_reference(spark):
    from ngff_zarr_spark.functions.text import hashed_quality_classifier

    texts = [
        "the quick brown fox", "lorem ipsum dolor", "a b c d e f",
        "   spaced    out   tokens ", "singleton", "",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.score) for r in
           hashed_quality_classifier(docs).collect()}
    for i, t in enumerate(texts):
        n, sc = _ref_score(t)
        if n == 0:
            assert i not in got  # empty docs are excluded
        else:
            assert got[i] == (n, sc), (i, t)


def test_quality_classifier_keep_rate(spark):
    """Calibration property: with distinct per-token scores, keep rate
    lands within one document of the configured keep_frac."""
    from ngff_zarr_spark.functions.text import hashed_quality_classifier

    docs = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{17 * i % 101}") for i in range(100)],
        "doc_id long, text string",
    )
    out = hashed_quality_classifier(docs, keep_frac=0.7)
    kept = out.filter("keep").count()
    assert abs(kept - 70) <= 2
    # scoring is deterministic across invocations
    kept2 = hashed_quality_classifier(docs, keep_frac=0.7).filter("keep").count()
    assert kept == kept2


# --------------------------------------------------------------- BPE


def _ref_bpe(docs, n_merges):
    """Textbook word-count BPE (pure python, greedy left-to-right
    application, (count desc, left, right) tie-break)."""
    wc = {}
    for _, text in docs:
        for w in text.lower().split():
            wc[w] = wc.get(w, 0) + 1
    vocab = {w: list(w) for w in wc}
    merges = []
    for step in range(1, n_merges + 1):
        pc = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + wc[w]
        if not pc:
            break
        (la, rb), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, la, rb, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == rb:
                    out.append(la + rb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab, wc


BPE_DOCS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "low new wider widest"),
    (3, "xyz xyz xyzq"),
]


def test_bpe_merges_match_reference(spark):
    from ngff_zarr_spark.functions.bpe import bpe_learn

    docs = spark.createDataFrame(BPE_DOCS, "doc_id long, text string")
    got = [(r.step, r.left, r.right, r.pair_count)
           for r in bpe_learn(docs, 10).orderBy("step").collect()]
    want, _, _ = _ref_bpe(BPE_DOCS, 10)
    assert got == want


def test_bpe_subword_stats_match_reference(spark):
    from ngff_zarr_spark.functions.bpe import bpe_subword_stats

    docs = spark.createDataFrame(BPE_DOCS, "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_subwords)
           for r in bpe_subword_stats(docs, 6).collect()}
    merges, vocab, _ = _ref_bpe(BPE_DOCS, 6)
    want = {}
    for doc_id, text in BPE_DOCS:
        ws = text.lower().split()
        want[doc_id] = (len(ws), sum(len(vocab[w]) for w in ws))
    assert got == want


def test_bpe_exhaustion_stops_cleanly(spark):
    """Single 2-char word: exactly one merge is learnable; asking for
    10 returns 1 row and segmentation collapses to one symbol."""
    from ngff_zarr_spark.functions.bpe import bpe_learn, bpe_subword_stats

    docs = spark.createDataFrame([(0, "ab ab"), (1, "ab")], "doc_id long, text string")
    merges = bpe_learn(docs, 10).collect()
    assert [(r.step, r.left, r.right, r.pair_count) for r in merges] == [
        (1, "a", "b", 3)
    ]
    stats = {r.doc_id: r.n_subwords for r in bpe_subword_stats(docs, 10).collect()}
    assert stats == {0: 2, 1: 1}


def test_bpe_overlapping_runs_merge_greedily(spark):
    """'aaaa' under merge (a,a): greedy left-to-right gives [aa, aa];
    'aaa' gives [aa, a] — the literal-replace application must match
    the sequential fold exactly."""
    from ngff_zarr_spark.functions.bpe import bpe_learn, bpe_subword_stats

    docs = spark.createDataFrame([(0, "aaaa aaa")], "doc_id long, text string")
    m = bpe_learn(docs, 1).collect()
    assert (m[0].left, m[0].right) == ("a", "a")
    stats = bpe_subword_stats(docs, 1).first()
    assert stats.n_subwords == 4  # [aa, aa] + [aa, a]


# ------------------------------------------- edit-distance re-rank


def test_edit_distance_candidates_match_bruteforce(spark):
    from ngff_zarr_spark.functions.dedup import edit_distance_candidates

    base = ("the quick brown fox jumps over the lazy dog and then "
            "proceeds to describe spark physical plans in detail") * 2
    texts = {
        0: base,
        1: base.replace("quick", "quack"),            # 2 edits
        2: base.replace("lazy dog", "lazy cat"),       # 3 edits
        3: base + " extra trailing tokens appended here",  # insertion
        4: "completely different content with no overlap at all",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.dist
           for r in edit_distance_candidates(docs, max_dist=24).collect()}

    def lev(a, b):
        import numpy as np
        pa = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            cur = np.empty(len(b) + 1, dtype=np.int64)
            cur[0] = i
            for j, cb in enumerate(b, 1):
                cur[j] = min(pa[j] + 1, cur[j - 1] + 1, pa[j - 1] + (ca != cb))
            pa = cur
        return int(pa[-1])

    # every reported pair carries the TRUE distance
    for (a, b), d in got.items():
        assert d == lev(texts[a], texts[b]), (a, b)
        assert d <= 24
    # the duplicated-shingle near-dup is found (16-perm MinHash recall
    # is probabilistic for weaker overlaps, so only the strongest pair
    # is asserted — the distance-exactness loop above is the contract)
    assert (0, 1) in got and got[(0, 1)] == 2
    # the unrelated doc pairs with nothing
    assert not any(4 in pair for pair in got)


# -------------------------------------------------------------- BM25


def test_bm25_matches_reference(spark):
    from ngff_zarr_spark.functions.ir import BM25_B, BM25_K1, bm25_topk

    got = {}
    for r in bm25_topk(_docs_df(spark), [0, 2], k=4, max_df=8).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for a in got:
        got[a].sort()

    # brute-force reference
    n_total = len(DOCS)
    tf = {}
    for d, text in DOCS:
        toks = text.lower().split()
        for i in range(max(0, len(toks) - TFIDF_SHINGLE_K + 1)):
            t = " ".join(toks[i : i + TFIDF_SHINGLE_K])
            tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    dl = {}
    for (d, _), c in tf.items():
        dl[d] = dl.get(d, 0) + c
    avgdl = sum(dl.values()) / len(dl)
    want = {}
    for qid in (0, 2):
        qterms = [t for (d, t) in tf if d == qid and df[t] <= 8]
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
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        want[qid] = [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]
    assert got == want


def test_bm25_self_retrieval_rank1(spark):
    from ngff_zarr_spark.functions.ir import bm25_topk

    top = bm25_topk(_docs_df(spark), [1, 4], k=3, max_df=8)
    r1 = {r.query_id: r.doc_id for r in top.filter("rank = 1").collect()}
    assert r1 == {1: 1, 4: 4}


# ---------------------------------------------------------- PageRank


def test_pagerank_matches_integer_reference(spark):
    from ngff_zarr_spark.functions.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_SCALE,
        pagerank,
    )

    # path + triangle + isolate: 0-1-2, 3-4-5-3, 6
    edge_list = [(0, 1), (1, 2), (3, 4), (4, 5), (3, 5)]
    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    edges = spark.createDataFrame(edge_list, "doc_a long, doc_b long")
    got = {r.doc_id: r.rank_micro for r in pagerank(docs, edges, n_iters=5).collect()}

    # pure-python integer reference
    und = edge_list + [(b, a) for a, b in edge_list]
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    n = 7
    r0 = PR_SCALE // n
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * r0 // PR_DAMP_DEN
    r = {i: r0 for i in range(n)}
    for _ in range(5):
        s = {i: 0 for i in range(n)}
        for a, b in und:
            s[b] += r[a] // deg[a]
        r = {i: base + PR_DAMP_NUM * s[i] // PR_DAMP_DEN for i in range(n)}
    assert got == r
    # triangle nodes conserve mass symmetrically; the isolate decays
    assert got[3] == got[4] == got[5]
    assert got[6] == base
    assert got[1] > got[0] == got[2]  # path center outranks endpoints


def test_quality_stream_equals_batch(spark, tmp_path):
    """Streaming scorer with the batch-calibrated cutoff drains to the
    batch classifier's exact output, across MULTIPLE micro-batch
    files."""
    import pyspark.sql.functions as F

    from ngff_zarr_spark.functions.text import (
        QC_KEEP_FRAC,
        hashed_quality_classifier,
        quality_score_projection,
    )
    from ngff_zarr_spark.streaming.pipeline import streaming_quality_filter

    docs = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{17 * i % 101}") for i in range(60)],
        "doc_id long, text string",
    )
    d = str(tmp_path / "docs")
    # three separate files -> three micro-batch inputs
    docs.filter("doc_id < 20").write.parquet(d)
    docs.filter("doc_id >= 20 and doc_id < 40").write.mode("append").parquet(d)
    docs.filter("doc_id >= 40").write.mode("append").parquet(d)
    cutoff = float(
        quality_score_projection(docs)
        .agg(F.round(F.expr(f"percentile(score_per_tok, {1.0 - QC_KEEP_FRAC})"), 6))
        .first()[0]
    )
    _, start = streaming_quality_filter(
        spark, d, str(tmp_path / "ckpt"), cutoff
    )
    q = start("qc_stream_sink")
    assert q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_tokens, r.score, r.score_per_tok, r.keep)
        for r in spark.sql("select * from qc_stream_sink").collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.score, r.score_per_tok, r.keep)
        for r in hashed_quality_classifier(docs).collect()
    }
    assert got == want


def test_bpe_encode_matches_reference(spark):
    from ngff_zarr_spark.functions.bpe import bpe_encode

    docs = spark.createDataFrame(BPE_DOCS, "doc_id long, text string")
    got = {}
    for r in bpe_encode(docs, 6).collect():
        got[(r.doc_id, r.word_idx, r.sym_idx)] = (r.token, r.token_id)
    _, vocab, _ = _ref_bpe(BPE_DOCS, 6)
    all_syms = sorted({s for syms in vocab.values() for s in syms})
    ids = {t: i + 1 for i, t in enumerate(all_syms)}
    want = {}
    for doc_id, text in BPE_DOCS:
        for wi, w in enumerate(text.lower().split()):
            for si, sym in enumerate(vocab[w]):
                want[(doc_id, wi, si)] = (sym, ids[sym])
    assert got == want


# ------------------------------------------------------------ Z-order


def test_zorder_interleave_matches_reference(spark):
    from ngff_zarr_spark.functions.layout import zorder_keys

    rows = [(i, x, float(y)) for i, (x, y) in enumerate(
        [(0, 0.0), (0, 100.0), (100, 0.0), (100, 100.0),
         (50, 50.0), (25, 75.0), (99, 1.0), (1, 99.0)]
    )]
    df = spark.createDataFrame(rows, "rid long, x long, y double")
    got = {r.rid: (r.b1, r.b2, r.zkey) for r in
           zorder_keys(df, "x", "y", "rid", bits=4).collect()}

    def bucket(v, lo, hi, k=15):
        import math
        return max(0, min(k, int(math.floor((float(v) - lo) * 15.0 / (hi - lo)))))

    def inter(b1, b2):
        z = 0
        for i in range(4):
            z |= ((b1 >> i) & 1) << (2 * i + 1)
            z |= ((b2 >> i) & 1) << (2 * i)
        return z

    for rid, x, y in rows:
        b1, b2 = bucket(x, 0, 100), bucket(y, 0.0, 100.0)
        assert got[rid] == (b1, b2, inter(b1, b2)), rid


def test_zorder_locality_bounds_both_dimensions(spark):
    """The layout property the key exists for: any contiguous zkey
    range touches a bounded box in BOTH dimensions — sort by zkey,
    split into 16 equal runs, and every run's per-dimension bucket
    extent must be far below the full 16-bit extent (a single-column
    sort leaves the other dimension's extent at ~full range)."""
    import random

    from ngff_zarr_spark.functions.layout import zorder_keys

    rng = random.Random(7)
    rows = [(i, rng.randrange(10**6), float(rng.randrange(10**6))) for i in range(4096)]
    df = spark.createDataFrame(rows, "rid long, x long, y double")
    z = [(r.b1, r.b2, r.zkey) for r in zorder_keys(df, "x", "y", "rid").collect()]
    # quadrant-aligned key cells (top 2 interleaved bits per dim fixed):
    # inside each cell BOTH extents are < 2^14 BY CONSTRUCTION — the
    # deterministic form of "a key range bounds both dimensions"
    # (rank-based runs straddling the top-bit flip can span full range,
    # which is why the pin uses aligned cells, like row groups laid
    # down by a range partitioner on the key would be)
    cells = {}
    for b1, b2, zk in z:
        cells.setdefault(zk >> 28, []).append((b1, b2))
    assert len(cells) == 16  # uniform data touches all 16 top cells
    for cell, pts in cells.items():
        ext1 = max(p[0] for p in pts) - min(p[0] for p in pts)
        ext2 = max(p[1] for p in pts) - min(p[1] for p in pts)
        assert ext1 < (1 << 14) and ext2 < (1 << 14), (cell, ext1, ext2)


def test_zorder_constant_dimension_buckets_to_zero(spark):
    from ngff_zarr_spark.functions.layout import zorder_keys

    df = spark.createDataFrame(
        [(0, 7, 1.0), (1, 7, 2.0), (2, 7, 3.0)], "rid long, x long, y double"
    )
    rows = {r.rid: (r.b1, r.b2, r.zkey) for r in
            zorder_keys(df, "x", "y", "rid", bits=4).collect()}
    assert all(v[0] == 0 for v in rows.values())  # constant dim -> 0
    assert rows[0][2] is not None and rows[2][1] == 15


def test_property_bpe_random_corpora(spark):
    """Hypothesis sweep: random small-alphabet corpora (heavy pair
    collisions, tie-breaks exercised constantly) — the distributed
    learner, subword stats, and encoder all equal the textbook
    reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ngff_zarr_spark.functions.bpe import (
        bpe_encode,
        bpe_learn,
        bpe_subword_stats,
    )

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(
        texts=st.lists(doc, min_size=1, max_size=6),
        k=st.integers(1, 6),
    )
    def check(texts, k):
        rows = list(enumerate(texts))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        want_merges, vocab, _ = _ref_bpe(rows, k)
        got_merges = [(r.step, r.left, r.right, r.pair_count)
                      for r in bpe_learn(docs, k).orderBy("step").collect()]
        assert got_merges == want_merges, texts
        got_stats = {r.doc_id: (r.n_words, r.n_subwords)
                     for r in bpe_subword_stats(docs, k).collect()}
        want_stats = {
            d: (len(t.split()), sum(len(vocab[w]) for w in t.split()))
            for d, t in rows
        }
        assert got_stats == want_stats, texts
        got_enc = {(r.doc_id, r.word_idx, r.sym_idx): r.token
                   for r in bpe_encode(docs, k).collect()}
        want_enc = {
            (d, wi, si): sym
            for d, t in rows
            for wi, w in enumerate(t.split())
            for si, sym in enumerate(vocab[w])
        }
        assert got_enc == want_enc, texts

    check()


def test_property_tfidf_random_corpora(spark):
    """Hypothesis sweep: random corpora — distributed shingle TF-IDF
    weights and top-k cosine equal the brute-force reference under
    every df-cap."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["ant", "bee", "cat", "dog", "elk", "fox"])
    doc = st.lists(word, min_size=3, max_size=10).map(" ".join)

    @settings(max_examples=5, deadline=None)
    @given(
        texts=st.lists(doc, min_size=2, max_size=6),
        max_df=st.integers(1, 6),
    )
    def check(texts, max_df):
        rows = list(enumerate(texts))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got_w = {(r.doc_id, r.term): r.w
                 for r in tfidf_weights(docs, max_df=max_df).collect()}
        want_w = {(d, t): w for d, ws in _ref_weights(rows, max_df).items()
                  for t, w in ws.items()}
        assert set(got_w) == set(want_w), texts
        for key, w in want_w.items():
            assert got_w[key] == pytest.approx(w, abs=1e-9)
        got_k = {}
        for r in tfidf_topk(docs, k=3, max_df=max_df).collect():
            got_k.setdefault(r.doc_a, []).append((r.rank, r.doc_b, r.cos))
        for a in got_k:
            got_k[a].sort()
        want_k = {a: v for a, v in _ref_topk(rows, 3, max_df).items() if v}
        assert got_k == want_k, texts

    check()


def test_rrf_fusion_matches_reference(spark):
    from ngff_zarr_spark.functions.ir import RRF_K, RRF_UNIT, rrf_fusion

    run1 = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12), (1, 1, 20)],
        "query_id long, rank long, doc_id long",
    )
    run2 = spark.createDataFrame(
        [(0, 1, 11), (0, 2, 13), (1, 1, 21), (1, 2, 20)],
        "query_id long, rank long, doc_id long",
    )
    got = {}
    for r in rrf_fusion([run1, run2], k=3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.rrf_micro))
    for q in got:
        got[q].sort()

    def c(rank):
        return RRF_UNIT // (RRF_K + rank)

    scores = {
        0: {10: c(1), 11: c(2) + c(1), 12: c(3), 13: c(2)},
        1: {20: c(1) + c(2), 21: c(1)},
    }
    want = {}
    for q, sc in scores.items():
        ranked = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want[q] = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
    assert got == want
    # doc 11 (rank-2 lexical + rank-1 embedding) outranks every
    # single-run rank-1: the hybrid behavior RRF exists for
    assert want[0][0][1] == 11


def test_rrf_fusion_empty_runs_raises(spark):
    """r18 review: [] previously fell through the fold with
    contrib=None and died on an off-topic AttributeError."""
    import pytest

    from ngff_zarr_spark.functions.ir import rrf_fusion

    with pytest.raises(ValueError, match="at least one retrieval run"):
        rrf_fusion([])
