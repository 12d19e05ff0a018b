"""r13 MMR diversity re-rank over the SQ8 scorer (functions/similarity.
mmr_rerank_sq8): all-integer greedy selection vs a pure-Python
reference, the diversity property itself, and the gate-vs-oracle
cross-check."""

from __future__ import annotations

import numpy as np

from ngff_zarr_spark.functions.similarity import (
    SQ8_LEVELS,
    mmr_rerank_sq8,
    sq8_topk,
)


def _sq8(v):
    v = np.asarray(v, np.float32).astype(np.float64)
    m = np.abs(v).max()
    if m == 0:
        return np.zeros(len(v), np.int64)
    x = (SQ8_LEVELS * v) / m
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _est_u(Q, qn, i, j):
    if qn[i] == 0 or qn[j] == 0:
        return 0
    return int(round(round(int(Q[i] @ Q[j]) / np.sqrt(float(qn[i] * qn[j])), 6) * 1e6))


def _py_mmr(vecs, qids, k, pool, ln=1, ld=2):
    Q = np.array([_sq8(v) for v in vecs])
    qn = (Q * Q).sum(1)
    out = []
    for qid in qids:
        order = sorted(
            (n for n in range(len(vecs)) if n != qid),
            key=lambda n: (-_est_u(Q, qn, qid, n), n),
        )[:pool]
        rel = {n: _est_u(Q, qn, qid, n) for n in order}
        picked, remaining = [], set(rel)
        for rank in range(1, k + 1):
            if not remaining:
                break
            best = None
            for d in sorted(remaining):
                ms = max((_est_u(Q, qn, d, s) for s in picked), default=0)
                sc = ln * rel[d] - (ld - ln) * ms
                if best is None or sc > best[0]:
                    best = (sc, d)
            picked.append(best[1])
            remaining.discard(best[1])
            out.append((qid, rank, best[1], best[0]))
    return sorted(out)


def _mk_emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_matches_python_reference(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    got = sorted(
        (r.query_id, r.pick_rank, r.neighbor_id, r.mmr_u)
        for r in mmr_rerank_sq8(
            _mk_emb(spark, vecs), [0, 1], k=4, pool=8, dim=16
        ).collect()
    )
    assert got == _py_mmr(vecs, [0, 1], k=4, pool=8)


def test_diversity_beats_plain_topk(spark):
    # three near-identical copies of the best match plus two distinct
    # directions: plain top-3 returns the clones; MMR must spread out
    rng = np.random.default_rng(11)
    base = rng.standard_normal(32).astype(np.float32)
    other = rng.standard_normal(32).astype(np.float32)
    third = rng.standard_normal(32).astype(np.float32)
    vecs = [
        base,  # 0: the query
        base + rng.standard_normal(32).astype(np.float32) * 0.01,   # clones
        base + rng.standard_normal(32).astype(np.float32) * 0.01,
        base + rng.standard_normal(32).astype(np.float32) * 0.01,
        base * 0.5 + other * 0.5,
        base * 0.5 + third * 0.5,
    ]
    emb = _mk_emb(spark, vecs)
    plain = {
        r.neighbor_id
        for r in sq8_topk(emb, [0], k=3, dim=32).collect()
    }
    assert plain == {1, 2, 3}
    mmr = [
        r.neighbor_id
        for r in sorted(
            mmr_rerank_sq8(emb, [0], k=3, pool=5, dim=32).collect(),
            key=lambda r: r.pick_rank,
        )
    ]
    # first pick = most relevant clone; later picks must escape the
    # clone cluster
    assert mmr[0] in {1, 2, 3}
    assert set(mmr[1:]) & {4, 5}


def test_pool_smaller_than_corpus_and_k(spark):
    # corpus of 4, pool 10, k 10: every non-query doc picked once
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((4, 8)).astype(np.float32)
    got = mmr_rerank_sq8(_mk_emb(spark, vecs), [0], k=10, pool=10, dim=8).collect()
    assert sorted(r.neighbor_id for r in got) == [1, 2, 3]
    assert sorted(r.pick_rank for r in got) == [1, 2, 3]


def test_query_literals_match_duckdb_oracle_sf0001(spark):
    import duckdb

    from ngff_zarr_spark.gate import q_ann_mmr_query
    from ngff_zarr_spark.oracle import oracles

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.query_id, r.pick_rank, r.neighbor_id, r.mmr_u)
        for r in q_ann_mmr_query(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    want = sorted(
        tuple(t) for t in con.execute(oracles()["ann_mmr_query"]).fetchall()
    )
    assert got == want
    # no self-exclusion in the free-vector path: any corpus row may be
    # picked, and every query yields a full k picks
    assert len(got) == 4 * 5


def test_matches_duckdb_oracle_sf0001(spark):
    import duckdb

    from ngff_zarr_spark.gate import q_ann_mmr_rerank
    from ngff_zarr_spark.oracle import oracles

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.query_id, r.pick_rank, r.neighbor_id, r.mmr_u)
        for r in q_ann_mmr_rerank(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    want = sorted(
        tuple(t) for t in con.execute(oracles()["ann_mmr_rerank"]).fetchall()
    )
    assert got == want
