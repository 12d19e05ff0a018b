"""r13 label-centroid cosine in SQ8 code space (functions/similarity.
label_centroid_similarity): numpy parity, the separation property, and
the gate-vs-oracle cross-check."""

from __future__ import annotations

import numpy as np

from ngff_zarr_spark.functions.similarity import (
    SQ8_LEVELS,
    label_centroid_similarity,
)


def _sq8(v):
    v = np.asarray(v, np.float32).astype(np.float64)
    m = np.abs(v).max()
    if m == 0:
        return np.zeros(len(v), np.int64)
    x = (SQ8_LEVELS * v) / m
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _mk(spark, vecs, labels):
    return spark.createDataFrame(
        [
            (i, [float(x) for x in v], int(lb))
            for i, (v, lb) in enumerate(zip(vecs, labels))
        ],
        "vec_id long, embedding array<float>, label int",
    )


def test_matches_numpy(spark):
    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((30, 12)).astype(np.float32)
    labels = [i % 3 for i in range(30)]
    got = {
        (r.label_a, r.label_b): (r.n_a, r.n_b, r.cos_centroid)
        for r in label_centroid_similarity(_mk(spark, vecs, labels)).collect()
    }
    sums = {}
    for v, lb in zip(vecs, labels):
        sums[lb] = sums.get(lb, np.zeros(12, np.int64)) + _sq8(v)
    for a in range(3):
        for b in range(a + 1, 3):
            dot = int(sums[a] @ sums[b])
            na, nb = int(sums[a] @ sums[a]), int(sums[b] @ sums[b])
            want = round(dot / (np.sqrt(float(na)) * np.sqrt(float(nb))), 6)
            assert got[(a, b)] == (10, 10, want), (a, b)


def test_separation_property(spark):
    # two tight clusters around orthogonal directions + one around the
    # first direction again: the same-direction label pair must score
    # near 1, cross-direction pairs near 0
    rng = np.random.default_rng(23)
    d1 = np.zeros(16, np.float32)
    d1[0] = 1.0
    d2 = np.zeros(16, np.float32)
    d2[1] = 1.0
    vecs, labels = [], []
    for i in range(12):
        vecs.append(d1 + rng.standard_normal(16).astype(np.float32) * 0.02)
        labels.append(0)
        vecs.append(d2 + rng.standard_normal(16).astype(np.float32) * 0.02)
        labels.append(1)
        vecs.append(d1 + rng.standard_normal(16).astype(np.float32) * 0.02)
        labels.append(2)
    got = {
        (r.label_a, r.label_b): r.cos_centroid
        for r in label_centroid_similarity(_mk(spark, vecs, labels)).collect()
    }
    assert got[(0, 2)] > 0.99
    assert abs(got[(0, 1)]) < 0.1 and abs(got[(1, 2)]) < 0.1


def test_matches_duckdb_oracle_sf0001(spark):
    import duckdb

    from ngff_zarr_spark.gate import q_emb_label_centroids
    from ngff_zarr_spark.oracle import oracles

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.label_a, r.label_b, r.n_a, r.n_b, r.cos_centroid)
        for r in q_emb_label_centroids(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(oracles()["emb_label_centroids"]).fetchall()
    )
    assert got == want
    assert len(got) == 45  # 10 labels -> C(10,2) pairs
