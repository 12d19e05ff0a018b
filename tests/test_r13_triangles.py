"""r13 degree-ordered triangle counting + local clustering coefficient
(functions/graph.triangle_stats) vs a brute-force neighbor-pair count,
plus the gate-vs-oracle cross-check at sf0.001."""

from __future__ import annotations

import itertools
import random

from ngff_zarr_spark.functions.graph import triangle_stats


def _brute(n, pairs):
    adj = {i: set() for i in range(n)}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = {}
    for i in range(n):
        d = len(adj[i])
        t = sum(
            1
            for v, w in itertools.combinations(sorted(adj[i]), 2)
            if w in adj[v]
        )
        cc = round(2 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        out[i] = (d, t, cc)
    return out


def _run(spark, n, pairs):
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    ed = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {
        r.doc_id: (r.deg, r.n_tri, r.clustering)
        for r in triangle_stats(docs, ed).collect()
    }


def test_hand_graph(spark):
    # K3 on {0,1,2} plus pendant 3 and isolated 4
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    got = _run(spark, 5, pairs)
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_duplicate_and_reversed_edges_collapse(spark):
    # the same triangle reported via duplicated and reversed pairs
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (1, 1)]
    got = _run(spark, 3, pairs)
    assert got == {0: (2, 1, 1.0), 1: (2, 1, 1.0), 2: (2, 1, 1.0)}


def test_matches_brute_on_random_graphs(spark):
    rng = random.Random(131)
    for trial in range(4):
        n = rng.randrange(10, 50)
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(8, 150))
        ]
        assert _run(spark, n, pairs) == _brute(n, pairs), f"trial {trial}"


def test_star_hub_has_no_triangles(spark):
    # a hub of degree 20 with no closing edges: clustering exactly 0,
    # and the oriented wedge join must not emit anything
    pairs = [(0, i) for i in range(1, 21)]
    got = _run(spark, 21, pairs)
    assert got[0] == (20, 0, 0.0)
    assert all(got[i] == (1, 0, 0.0) for i in range(1, 21))


def test_matches_duckdb_oracle_sf0001(spark):
    import duckdb

    from ngff_zarr_spark.gate import q_graph_triangles
    from ngff_zarr_spark.oracle import sql_graph_triangles

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.doc_id, r.deg, r.n_tri, r.clustering)
        for r in q_graph_triangles(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(tuple(t) for t in con.execute(sql_graph_triangles()).fetchall())
    assert got == want
    # the fixture corpus carries real duplicate clusters -> some
    # triangles must exist or the gate is vacuous
    assert any(r[2] > 0 for r in got)
