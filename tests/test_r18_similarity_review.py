"""r18 adversarial self-review of functions/similarity.py (VERDICT r17
ask #3): edge cases the green gates never exercise.

Findings fixed and pinned here:

1. The seed-quantizer rule (`vec_id < n_cells` / `< n_codes`) silently
   assumed ids 0..n-1 are present: a corpus with sparse or offset ids
   produced a cryptic numpy AxisError (zero seed rows) or an undersized
   quantizer that later IndexErrors in write_ivf_partitioned's centroid
   table. Now a ValueError states the contract at the source.
2. ivfpq_residual_topk's residual-codebook seed had the same hole.
3. mmr_rerank_sq8 with NEITHER query_ids NOR queries compiled
   `vec_id IN (NULL)` — silently empty output instead of a caller-bug
   signal.

Also reviewed, no defect found (documented in PLANS.md): empty Arrow
batches never reach the numpy UDFs (empty partitions skip the UDF —
probed at repartition(32) over 3 rows), _capped_band_pairs cache
scoping, star-loop convergence detection, hash-min own-row convergence,
ngram df-cap size consistency, simhash tie handling.
"""

from __future__ import annotations

import numpy as np
import pytest

from ngff_zarr_spark.functions.similarity import (
    _centroids,
    ivf_topk,
    ivfpq_residual_topk,
    mmr_rerank_sq8,
    pq_codebooks,
)

DIM = 8


def _emb(spark, ids):
    return spark.createDataFrame(
        [(int(i), [float((i * 7 + j) % 5 + 1) for j in range(DIM)]) for i in ids],
        "vec_id long, embedding array<double>",
    )


def test_sparse_ids_raise_contract_error(spark):
    """ids 100..119: zero rows match vec_id < n_cells — previously a
    numpy AxisError three calls deep."""
    emb = _emb(spark, range(100, 120))
    with pytest.raises(ValueError, match="vec_ids 0..15"):
        _centroids(emb, 16)
    with pytest.raises(ValueError, match="seed quantizer"):
        ivf_topk(emb, [100], k=3, dim=DIM, n_cells=16)


def test_partial_seed_coverage_raises(spark):
    """ids 0..9 with n_cells=16: an UNDERSIZED quantizer previously
    escaped here and IndexErrored in write_ivf_partitioned."""
    emb = _emb(spark, range(10))
    with pytest.raises(ValueError, match="found 10 of 16"):
        _centroids(emb, 16)
    with pytest.raises(ValueError, match="seed quantizer"):
        pq_codebooks(emb, dim=DIM, m=2, n_codes=16)


def test_residual_seed_guard(spark):
    emb = _emb(spark, range(8))  # 8 < n_codes=16
    with pytest.raises(ValueError, match="residual codebook seed"):
        ivfpq_residual_topk(
            emb, [0], k=2, dim=DIM, n_cells=4, n_probe=2, m=2, n_codes=16
        )


def test_full_coverage_still_green(spark):
    """The guard must not fire on the contract-satisfying corpus."""
    emb = _emb(spark, range(24))
    C, Cn = _centroids(emb, 16)
    assert C.shape == (16, DIM) and np.all(Cn > 0)
    out = ivf_topk(emb, [0], k=3, dim=DIM, n_cells=4, n_probe=2).collect()
    assert len(out) == 3


def test_mmr_requires_query_spec(spark):
    emb = _emb(spark, range(6))
    with pytest.raises(ValueError, match="query_ids or queries"):
        mmr_rerank_sq8(emb, None, k=2, dim=DIM)
