"""Distributed k-means for the IVF coarse quantizer (VERDICT r4 ask
#5): learned centroids replace the lowest-id stand-in.

Three pins:
1. determinism — integer-quantized re-centering makes the learned
   centroids bit-identical regardless of data partitioning (the
   property that lets the DuckDB oracle unroll the same iterations);
2. recall — on a clustered corpus with a pathological seed (all seed
   ids inside 3 of 12 clusters), k-means recovers the cluster
   structure and beats the stand-in;
3. degenerate args — n_iters=0 degrades to the seed centroids exactly.

On the driver's ISOTROPIC sf embeddings (no cluster structure to
learn) recall is statistically equal between the two quantizers —
that is expected k-means behavior, not a defect; the gate's value
there is that the learned pipeline stays oracle-exact end to end
(gate ann_ivf_topk)."""

import numpy as np
import pytest

from ngff_zarr_spark.functions.similarity import (
    _centroids,
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
)

DIM, NCLUST, N = 16, 12, 1500


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(NCLUST, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cl = rng.integers(0, NCLUST, size=N)
    # the seed (lowest n_cells ids) all land in clusters 0-2: a
    # worst-case init that pure seed-centroids cannot recover from
    cl[:16] = rng.integers(0, 3, size=16)
    X = centers[cl] * 4.0 + rng.normal(scale=0.6, size=(N, DIM))
    return spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    )


def test_kmeans_deterministic_across_partitioning(clustered):
    C1, Cn1 = kmeans_centroids(clustered, DIM, 12, n_iters=3)
    C2, Cn2 = kmeans_centroids(clustered.repartition(13), DIM, 12, n_iters=3)
    assert np.array_equal(C1, C2), "centroids must be partitioning-independent"
    assert np.array_equal(Cn1, Cn2)


def test_kmeans_zero_iters_is_seed(clustered):
    C0, Cn0 = _centroids(clustered, 12)
    C, Cn = kmeans_centroids(clustered, DIM, 12, n_iters=0)
    assert np.array_equal(C, C0) and np.array_equal(Cn, Cn0)


def test_kmeans_moves_centroids(clustered):
    C0, _ = _centroids(clustered, 12)
    C3, _ = kmeans_centroids(clustered, DIM, 12, n_iters=3)
    assert not np.array_equal(C0, C3)


def _recall(emb, qs, k, kmeans_iters):
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, qs, k=k, dim=DIM).collect()}
    t = ivf_topk(emb, qs, k=k, dim=DIM, n_cells=NCLUST, n_probe=2, kmeans_iters=kmeans_iters)
    got = {(r.query_id, r.neighbor_id) for r in t.collect()}
    return len(got & exact) / len(exact)


def test_kmeans_beats_standin_on_clustered_corpus(clustered):
    qs = list(range(16, 46))
    standin = _recall(clustered, qs, 5, 0)
    learned = _recall(clustered, qs, 5, 3)
    # measured: stand-in 0.793, learned 1.0 (seed rng fixed above)
    assert learned > standin + 0.1, (standin, learned)
    assert learned >= 0.95
