"""SemDeDup-style semantic dedup + measured ANN recall harness (r10).

semantic_dedup: candidate pairs come only from the capacity-bounded
(cell, subcell) lists, so per-task pair work is ≤ cap² while SemDeDup's
own within-cluster pairing is quadratic in cluster size. The drop rule
(lower-id list-mate at cosine ≥ tau, lowest witness recorded) is pinned
against an O(n²) numpy recomputation of the same rule.

ann_recall_eval: recall@k of the IVF probe vs exact brute force —
pinned to exactly 1.0 when every cell is probed (candidate set ==
corpus), and within [0, 1] with n_hit consistency otherwise.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.similarity import (
    ann_recall_eval,
    ivf_cells_balanced,
    semantic_dedup,
)

DIM = 16
N_CELLS = 4


def _corpus(spark, n=300, n_dup_groups=5, seed=11):
    """Random vectors plus n_dup_groups groups of EXACT duplicates
    (12 copies each) scattered through the id space."""
    rng = np.random.default_rng(seed)
    vecs = [rng.normal(size=DIM) for _ in range(n)]
    for g in range(n_dup_groups):
        proto = vecs[10 + g * 7]
        for j in range(12):
            vecs[(37 * (g + 1) + j * 13) % n] = proto.copy()
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [[float(x) for x in v] for v in vecs],
            }
        )
    )
    return emb, np.array(vecs)


def _numpy_rule(vecs, cells, subcells, tau):
    """O(n²) recomputation of the drop rule within each list."""
    n = len(vecs)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    out = {}
    for v in range(n):
        dup_of = -1
        for u in range(v):
            if cells[u] == cells[v] and subcells[u] == subcells[v]:
                cos = round(vecs[u] @ vecs[v] / (norms[u] * norms[v]), 6)
                if cos >= tau:
                    dup_of = u
                    break  # lowest u wins
        out[v] = (dup_of == -1, dup_of)
    return out


def test_semantic_dedup_matches_quadratic_rule(spark):
    emb, vecs = _corpus(spark)
    cap, tau = 16, 0.999
    bal = {
        r.vec_id: (r.cell, r.subcell)
        for r in ivf_cells_balanced(
            emb, dim=DIM, n_cells=N_CELLS, cap=cap
        ).collect()
    }
    cells = np.array([bal[i][0] for i in range(len(vecs))])
    subcells = np.array([bal[i][1] for i in range(len(vecs))])
    want = _numpy_rule(vecs, cells, subcells, tau)
    got = {
        r.vec_id: (r.keep, r.dup_of)
        for r in semantic_dedup(
            emb, dim=DIM, n_cells=N_CELLS, cap=cap, tau=tau
        ).collect()
    }
    assert got == want
    # the duplicate groups actually produced drops
    assert sum(1 for k, _ in got.values() if not k) >= 20


def test_semantic_dedup_one_representative_per_list(spark):
    """An identical-direction mega-group keeps exactly ONE vector per
    (cell, subcell) it spans — the documented bucketed-candidate
    bound."""
    rng = np.random.default_rng(2)
    proto = rng.normal(size=DIM)
    n = 200
    vecs = [proto.copy() for _ in range(n)]
    for i in range(N_CELLS):  # diverse seed centroids
        vecs[i] = rng.normal(size=DIM)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [[float(x) for x in v] for v in vecs],
            }
        )
    )
    cap = 32
    rows = semantic_dedup(emb, dim=DIM, n_cells=N_CELLS, cap=cap, tau=0.999).collect()
    kept = sorted(r.vec_id for r in rows if r.keep)
    bal = {
        r.vec_id: (r.cell, r.subcell)
        for r in ivf_cells_balanced(emb, dim=DIM, n_cells=N_CELLS, cap=cap).collect()
    }
    dup_ids = [i for i in range(N_CELLS, n)]
    lists = {}
    for i in dup_ids:
        lists.setdefault(bal[i], []).append(i)
    # exactly the per-list minimum id survives from the mega-group
    want_kept_dups = sorted(min(v) for v in lists.values())
    assert [k for k in kept if k >= N_CELLS] == want_kept_dups
    # every dropped row's witness is its list's minimum id below it
    for r in rows:
        if not r.keep:
            assert r.dup_of == min(
                i for i in lists[bal[r.vec_id]] if i < r.vec_id
            )


def test_recall_eval_full_probe_is_exact(spark):
    emb, _ = _corpus(spark, n=150, n_dup_groups=0)
    out = ann_recall_eval(
        emb, [0, 3, 9], k=4, dim=DIM, n_cells=N_CELLS, n_probe=N_CELLS
    ).collect()
    assert len(out) == 3
    assert all(r.recall == 1.0 and r.n_hit == 4 for r in out)


def test_recall_eval_partial_probe_bounds(spark):
    emb, _ = _corpus(spark, n=150, n_dup_groups=0)
    out = ann_recall_eval(
        emb, list(range(8)), k=4, dim=DIM, n_cells=N_CELLS, n_probe=1
    ).collect()
    assert len(out) == 8
    for r in out:
        assert 0 <= r.n_hit <= 4
        assert r.recall == round(r.n_hit / 4, 6)
