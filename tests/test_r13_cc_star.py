"""r13 diameter-robust connected components (VERDICT r12 ask #4):
alternating large-star/small-star contraction vs brute union-find and
vs the hash-min propagation twin, including the chain-shaped graphs
that make hash-min abort (rounds = diameter > max_iters)."""

from __future__ import annotations

import random

import pytest

from ngff_zarr_spark.functions.dedup import (
    duplicate_clusters,
    duplicate_clusters_star,
)


def _brute(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> smallest reachable node."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_star(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {
        r.doc_id: r.cluster_id
        for r in duplicate_clusters_star(df, reliable=False, **kw).collect()
    }


def test_hand_graph(spark):
    pairs = [(1, 5), (5, 3), (10, 11), (20, 20)]
    got = _run_star(spark, pairs)
    assert got == {1: 1, 5: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_matches_brute_on_random_graphs(spark):
    rng = random.Random(13)
    for trial in range(4):
        n = rng.randrange(20, 80)
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 120))
        ]
        assert _run_star(spark, pairs) == _brute(pairs), f"trial {trial}"


def test_matches_hashmin_on_low_diameter_graph(spark):
    rng = random.Random(99)
    # near-clique clusters: the regime hash-min is designed for
    pairs = []
    for base in (0, 100, 200):
        members = [base + i for i in range(8)]
        pairs += [(rng.choice(members), rng.choice(members)) for _ in range(20)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    hm = {r.doc_id: r.cluster_id for r in duplicate_clusters(df, reliable=False).collect()}
    assert _run_star(spark, pairs) == hm


def test_chain_beyond_hashmin_budget(spark):
    # a 300-node path: diameter 299 — hash-min at its default budget
    # RAISES (by contract), the star contraction converges in O(log n)
    pairs = [(i, i + 1) for i in range(299)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(df, max_iters=20, reliable=False)
    got = _run_star(spark, pairs)
    assert got == {i: 0 for i in range(300)}


def test_star_round_budget_is_logarithmic(spark):
    # the contraction must land a 512-node path well inside its default
    # budget — rounds ~ O(log n), nowhere near the diameter
    pairs = [(i, i + 1) for i in range(511)]
    got = _run_star(spark, pairs, max_iters=30)
    assert got == {i: 0 for i in range(512)}


def test_two_node_and_self_loop_edges(spark):
    got = _run_star(spark, [(7, 3), (9, 9)])
    assert got == {3: 3, 7: 3, 9: 9}
