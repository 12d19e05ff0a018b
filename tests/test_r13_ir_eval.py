"""r13 retrieval-evaluation + ANN serving path: ranking_metrics
(recall@k / MRR / nDCG@k per query) against hand-computed values, and
cosine_query_topk (free query VECTORS, the ANN twin of the free-text
BM25 serving path) against a numpy brute force."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ngff_zarr_spark.functions.ir import ranking_metrics
from ngff_zarr_spark.functions.similarity import (
    ANN_EVAL_QUERIES,
    cosine_query_topk,
)


def _run_df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, rank long, doc_id long")


def _qrels_df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long")


def test_metrics_hand_computed(spark):
    # q0: rels {10, 11, 12}; retrieved [10, 99, 11] at k=3
    #   recall 2/3, mrr 1, dcg = 1/log2(2) + 1/log2(4) = 1.5,
    #   idcg = 1 + 1/log2(3) + 1/log2(4) = 2.13092975..., ndcg = dcg/idcg
    # q1: rels {20}; retrieved [99, 98, 20] -> recall 1, mrr 1/3,
    #   dcg = 1/log2(4) = .5, idcg = 1, ndcg = .5
    # q2: rels {30}; retrieved [99, 98, 97] -> all zeros
    run = _run_df(
        spark,
        [
            (0, 1, 10), (0, 2, 99), (0, 3, 11),
            (1, 1, 99), (1, 2, 98), (1, 3, 20),
            (2, 1, 99), (2, 2, 98), (2, 3, 97),
        ],
    )
    qrels = _qrels_df(
        spark,
        [(0, 10), (0, 11), (0, 12), (1, 20), (2, 30)],
    )
    got = {r.query_id: r for r in ranking_metrics(run, qrels, k=3).collect()}
    assert set(got) == {0, 1, 2}

    idcg3 = 1.0 + 1.0 / math.log2(3) + 1.0 / math.log2(4)
    assert got[0].n_rel == 3 and got[0].n_hits == 2
    assert got[0].recall == round(2 / 3, 6)
    assert got[0].mrr == 1.0
    assert got[0].ndcg == round(1.5 / idcg3, 6)

    assert got[1].n_rel == 1 and got[1].n_hits == 1
    assert got[1].recall == 1.0
    assert got[1].mrr == round(1 / 3, 6)
    assert got[1].ndcg == 0.5

    assert got[2].n_rel == 1 and got[2].n_hits == 0
    assert (got[2].recall, got[2].mrr, got[2].ndcg) == (0.0, 0.0, 0.0)


def test_metrics_k_caps_run(spark):
    # rows past rank k are ignored even if present in the run
    run = _run_df(spark, [(0, 1, 5), (0, 2, 6), (0, 3, 7)])
    qrels = _qrels_df(spark, [(0, 7)])
    got = ranking_metrics(run, qrels, k=2).collect()[0]
    assert got.n_hits == 0 and got.recall == 0.0


def test_metrics_idcg_caps_at_k(spark):
    # 10 relevant docs but k=2: perfect retrieval of 2 -> ndcg == 1
    run = _run_df(spark, [(0, 1, 1), (0, 2, 2)])
    qrels = _qrels_df(spark, [(0, d) for d in range(1, 11)])
    got = ranking_metrics(run, qrels, k=2).collect()[0]
    assert got.ndcg == 1.0 and got.recall == 0.2


def _embs(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_cosine_query_topk_matches_numpy(spark, sf_dir):
    emb = _embs(spark, sf_dir)
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))

    got = cosine_query_topk(emb, ANN_EVAL_QUERIES, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))

    for qid, qvec in ANN_EVAL_QUERIES:
        q = np.array(qvec, dtype=np.float64)
        cos = np.round(mat @ q / (norms * np.sqrt(q @ q)), 6)
        order = sorted(zip(cos, ids), key=lambda t: (-t[0], t[1]))[:5]
        want = [(i + 1, int(nid), float(c)) for i, (c, nid) in enumerate(order)]
        assert sorted(by_q[qid]) == want, f"query {qid}"


def test_eval_query_vectors_are_exact_binary():
    # eighths: exact in float64 AND in decimal SQL literals, so the
    # DuckDB twin parses bit-identical vectors
    for _qid, vec in ANN_EVAL_QUERIES:
        for v in vec:
            assert v * 8 == int(v * 8)
