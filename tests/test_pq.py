"""Product quantization ANN (similarity.pq_*).

Pins:
1. codebook shape/determinism (the lowest-id seed rule);
2. encoding correctness on a hand-checkable corpus — a vector equal to
   a codebook entry in a subspace encodes to that code;
3. recall against exact cosine top-k on the sf0.001 embeddings — ADC
   over 8x16 codebooks is approximate, but the top-1 exact neighbor
   must appear in the PQ top-k for most queries (sanity, not a pin on
   a specific recall value);
4. repartition-invariance of the full pq_topk output (the property
   that lets the DuckDB oracle reproduce it)."""

import numpy as np
import pytest

from ngff_zarr_spark.functions.similarity import (
    cosine_topk,
    pq_codebooks,
    pq_encode,
    pq_topk,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_codebooks_seed_rule(spark):
    emb = _emb(spark)
    books = pq_codebooks(emb, dim=64, m=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    row0 = emb.filter("vec_id = 0").first().embedding
    # subspace s, code 0 == vec 0's s-th subvector
    for s in range(8):
        assert np.allclose(books[s][0], np.asarray(row0[s * 8 : (s + 1) * 8]))


def test_codebooks_rejects_indivisible():
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(None, dim=64, m=7)


def test_encode_identity_vectors(spark):
    """The seed vectors themselves must encode to their own code (their
    subspace distance to themselves is 0, the unique minimum unless two
    seed rows collide in a subspace — then lowest code wins, which is
    still deterministic and self-consistent with the SQL twin)."""
    emb = _emb(spark)
    books = pq_codebooks(emb, dim=64, m=8, n_codes=16)
    codes = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb.filter("vec_id < 16"), books).collect()
    }
    for j in range(16):
        for s in range(8):
            sub = books[s][codes[j][s]]
            assert np.allclose(sub, books[s][j]) or codes[j][s] == j


def test_pq_recall_vs_exact(spark):
    emb = _emb(spark)
    qids = list(range(10))
    exact1 = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(emb, qids, k=1, dim=64).collect()
    }
    pq = pq_topk(emb, qids, k=5, dim=64, m=8, n_codes=16).collect()
    got = {}
    for r in pq:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for q, n1 in exact1.items() if n1 in got.get(q, set()))
    # isotropic corpus + tiny 16-entry codebooks: demand a majority,
    # not perfection (exact recall value is data-dependent)
    assert hits >= len(exact1) // 2, f"top-1 recall {hits}/{len(exact1)}"


def test_pq_partition_invariant(spark):
    emb = _emb(spark)
    a = sorted(
        tuple(r) for r in pq_topk(emb, [0, 1], k=3).collect()
    )
    b = sorted(
        tuple(r) for r in pq_topk(emb.repartition(7), [0, 1], k=3).collect()
    )
    assert a == b


def test_ivfpq_scores_match_pq_on_shared_pairs(spark):
    """IVFPQ is PQ scoring over an IVF-pruned candidate set: every
    (query, neighbor) pair both paths rank must carry the SAME ADC
    score (the pruning changes WHICH pairs exist, never their score)."""
    from ngff_zarr_spark.functions.similarity import ivfpq_topk

    emb = _emb(spark)
    qids = list(range(10))
    pq_scores = {
        (r.query_id, r.neighbor_id): r.score_u
        for r in pq_topk(emb, qids, k=50).collect()
    }
    ivfpq = ivfpq_topk(emb, qids, k=5).collect()
    assert len(ivfpq) > 0
    shared = [r for r in ivfpq if (r.query_id, r.neighbor_id) in pq_scores]
    assert shared, "no overlap between ivfpq and pq top lists"
    for r in shared:
        assert pq_scores[(r.query_id, r.neighbor_id)] == r.score_u


def test_ivfpq_partition_invariant(spark):
    from ngff_zarr_spark.functions.similarity import ivfpq_topk

    emb = _emb(spark)
    a = sorted(tuple(r) for r in ivfpq_topk(emb, [0, 1], k=3).collect())
    b = sorted(tuple(r) for r in ivfpq_topk(emb.repartition(5), [0, 1], k=3).collect())
    assert a == b


def test_learned_codebooks_partition_invariant(spark):
    """Integer-quantized re-centering makes the learned codebooks
    bit-identical regardless of input partitioning (the same
    order-independence contract kmeans_centroids pins for IVF)."""
    from ngff_zarr_spark.functions.similarity import pq_codebooks_learned

    emb = _emb(spark)
    a = pq_codebooks_learned(emb, n_iters=2)
    b = pq_codebooks_learned(emb.repartition(11), n_iters=2)
    assert np.array_equal(a, b)


def test_learned_codebooks_zero_iters_is_seed(spark):
    from ngff_zarr_spark.functions.similarity import pq_codebooks_learned

    emb = _emb(spark)
    assert np.array_equal(
        pq_codebooks_learned(emb, n_iters=0), pq_codebooks(emb)
    )


def test_learned_codebooks_reduce_quantization_error(spark):
    """Lloyd iterations cannot increase total quantization error; on a
    real corpus they strictly shrink it (the reason to learn at all)."""
    from ngff_zarr_spark.functions.similarity import (
        pq_codebooks_learned,
        pq_encode,
    )

    emb = _emb(spark)

    def total_err(books):
        enc = {r.vec_id: r.codes for r in pq_encode(emb, books).collect()}
        E = {
            r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.collect()
        }
        err = 0.0
        for vid, codes in enc.items():
            recon = np.concatenate([books[s][c] for s, c in enumerate(codes)])
            err += float(np.sum((E[vid] - recon) ** 2))
        return err

    seed_err = total_err(pq_codebooks(emb))
    learned_err = total_err(pq_codebooks_learned(emb, n_iters=2))
    assert learned_err < seed_err


def test_lsh_multiprobe_supersets_plain(spark):
    """Multi-probe probes strictly more buckets, so its candidate set —
    and therefore its top-k quality — can only grow: every plain-LSH
    result pair appears in the multiprobe result at equal-or-better
    rank-k coverage, and shared pairs carry identical cosines."""
    from ngff_zarr_spark.functions.similarity import lsh_bucket_topk

    emb = _emb(spark)
    qids = list(range(10))
    plain = lsh_bucket_topk(emb, qids, k=50).collect()
    multi = lsh_bucket_topk(emb, qids, k=50, multiprobe=True).collect()
    plain_by_pair = {(r.query_id, r.neighbor_id): r.cosine for r in plain}
    multi_by_pair = {(r.query_id, r.neighbor_id): r.cosine for r in multi}
    # every pair the plain path found is also a multiprobe candidate
    # (absent only if pushed past k=50 by BETTER multiprobe candidates)
    multi_count = {}
    for q, _ in multi_by_pair:
        multi_count[q] = multi_count.get(q, 0) + 1
    for (q, n), cos in plain_by_pair.items():
        if (q, n) in multi_by_pair:
            assert multi_by_pair[(q, n)] == cos
        else:
            assert multi_count.get(q, 0) == 50  # full: displaced, not lost
    assert len(multi_by_pair) >= len(plain_by_pair)


def test_residual_ivfpq_learned_codebooks_tighten(spark):
    """Residual-PQ geometry, pinned honestly: with the SEED rule, raw
    codebooks (the seed vectors) directly model a clustered corpus
    while seed RESIDUALS are noise-like — so the textbook residual
    advantage only appears once codebooks are LEARNED on residuals.
    This test pins the guaranteed half: Lloyd iterations over the
    residual distribution strictly reduce residual reconstruction
    error vs the seed residual codebooks (the upgrade path
    ivfpq_residual_topk's docstring points at)."""
    import pandas as pd

    from ngff_zarr_spark.functions.similarity import (
        _cell_dots,
        _centroids,
        pq_codebooks,
        pq_codebooks_learned,
    )

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(6, 64)) * 4.0
    cl = rng.integers(0, 6, size=400)
    X = centers[cl] + rng.normal(scale=0.5, size=(400, 64))
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    C, Cn = _centroids(emb, 16)
    cells = np.argmax(_cell_dots(pd.Series(list(X)), C, Cn), axis=1)
    Res = X - C[cells]
    res_df = spark.createDataFrame(
        [(i, [float(v) for v in Res[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    seed_books = pq_codebooks(res_df)          # seed residual codebooks
    learned_books = pq_codebooks_learned(res_df, n_iters=3)

    def total_err(books):
        err = 0.0
        for r in Res:
            for s in range(8):
                sub = r[s * 8 : (s + 1) * 8]
                d2 = ((sub[None, :] - books[s]) ** 2).sum(axis=1)
                err += float(d2[int(np.argmin(np.round(d2, 6)))])
        return err

    assert total_err(learned_books) < total_err(seed_books)


def test_residual_ivfpq_partition_invariant(spark):
    from ngff_zarr_spark.functions.similarity import ivfpq_residual_topk

    emb = _emb(spark)
    a = sorted(tuple(r) for r in ivfpq_residual_topk(emb, [0, 1], k=3).collect())
    b = sorted(
        tuple(r)
        for r in ivfpq_residual_topk(emb.repartition(5), [0, 1], k=3).collect()
    )
    assert a == b
