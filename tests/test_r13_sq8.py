"""r13 int8 scalar quantization (functions/similarity.sq8_quantize /
sq8_topk): code-level parity vs a numpy reference, estimate quality vs
full-precision cosine, and the gate-vs-oracle cross-check."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.similarity import (
    SQ8_LEVELS,
    cosine_topk,
    sq8_quantize,
    sq8_topk,
)


def _mk_emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _np_sq8(v):
    v = np.asarray(v, dtype=np.float32).astype(np.float64)
    m = np.abs(v).max()
    if m == 0:
        return np.zeros(len(v), dtype=np.int64)
    # same expression tree: multiply, divide, round-half-away-from-zero
    x = (SQ8_LEVELS * v) / m
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def test_codes_match_numpy(spark):
    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    got = {
        r.vec_id: (list(r.qvec), r.qnorm)
        for r in sq8_quantize(_mk_emb(spark, vecs)).collect()
    }
    for i, v in enumerate(vecs):
        q = _np_sq8(v)
        assert got[i] == (list(q), int((q * q).sum())), i
        assert max(abs(x) for x in got[i][0]) <= SQ8_LEVELS


def test_zero_vector_quantizes_to_zeros(spark):
    got = sq8_quantize(_mk_emb(spark, [[0.0] * 8, [1.0] * 8])).collect()
    by_id = {r.vec_id: r for r in got}
    assert list(by_id[0].qvec) == [0] * 8 and by_id[0].qnorm == 0
    assert list(by_id[1].qvec) == [SQ8_LEVELS] * 8


def test_estimate_tracks_exact_cosine(spark):
    # SQ8 cosine vs float cosine on random unit-ish vectors: every
    # top-k estimate within 0.02 of the exact value (8-bit codes keep
    # ~2 decimal digits), and the top-1 neighbor agrees for a clear
    # margin case
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 64)).astype(np.float32)
    vecs[7] = vecs[3] * 0.9 + rng.standard_normal(64).astype(np.float32) * 0.01
    emb = _mk_emb(spark, vecs)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(emb, [3], k=5, dim=64).collect()
    }
    est = {
        (r.query_id, r.neighbor_id): r.est_cos
        for r in sq8_topk(emb, [3], k=5, dim=64).collect()
    }
    for key, cos_q in est.items():
        if key in exact:
            assert abs(cos_q - exact[key]) < 0.02, key
    top_exact = max(exact, key=lambda kk: exact[kk])
    top_est = max(est, key=lambda kk: est[kk])
    assert top_exact == top_est == (3, 7)


def test_matches_duckdb_oracle_sf0001(spark):
    import duckdb

    from ngff_zarr_spark.gate import q_ann_sq8_topk
    from ngff_zarr_spark.oracle import oracles

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.est_cos)
        for r in q_ann_sq8_topk(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    want = sorted(
        tuple(t) for t in con.execute(oracles()["ann_sq8_topk"]).fetchall()
    )
    assert got == want
