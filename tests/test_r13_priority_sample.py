"""r13 weighted sampling without replacement (functions/sampling.
priority_sample — Duffield-Lund-Thorup priority sampling): DLT
semantics on hand fixtures, the Horvitz-Thompson estimator property,
and the gate-vs-oracle cross-check."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.sampling import priority_sample


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _prio(doc_id: int, w: float, salt: str = "prio") -> float:
    return float(w) / (float(_h64(f"{salt}:{doc_id}") + 1) / float(2**60))


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )


def test_matches_reference_formula(spark):
    rows = [(i, "s", 10 + 7 * i) for i in range(30)]
    got = priority_sample(_mk(spark, rows), k=5).collect()
    want_order = sorted(
        rows, key=lambda r: (-_prio(r[0], r[2]), r[0])
    )[:5]
    assert [(r.doc_id, r.sample_rank) for r in sorted(got, key=lambda r: r.sample_rank)] == [
        (w[0], i + 1) for i, w in enumerate(want_order)
    ]
    # tau = the 6th priority; every est_w = max(w, tau) rounded
    tau = sorted((_prio(r[0], r[2]) for r in rows), reverse=True)[5]
    for r in got:
        assert r.est_w == round(max(float(r.weight), tau), 6)


def test_small_stratum_taken_whole(spark):
    rows = [(1, "tiny", 100), (2, "tiny", 3)]
    got = {r.doc_id: r for r in priority_sample(_mk(spark, rows), k=5).collect()}
    assert set(got) == {1, 2}
    # tau = 0 when the stratum has <= k items: est_w is the exact weight
    assert got[1].est_w == 100.0 and got[2].est_w == 3.0


def test_weight_bias(spark):
    # one heavy doc among 49 light ones: across 20 salts the heavy doc
    # must be sampled far more often than any individual light doc
    rows = [(0, "s", 10_000)] + [(i, "s", 10) for i in range(1, 50)]
    df = _mk(spark, rows)
    heavy = sum(
        1
        for t in range(20)
        if any(
            r.doc_id == 0
            for r in priority_sample(df, k=3, salt=f"t{t}").collect()
        )
    )
    assert heavy >= 18  # P(miss) ~ (10/10010)^... essentially 0


def test_estimator_tracks_total_weight(spark):
    # HT property: mean over salts of sum(est_w) approximates the true
    # total weight (deterministic given the salts — no flakiness)
    rows = [(i, "s", (i * 37) % 100 + 1) for i in range(200)]
    df = _mk(spark, rows)
    true_total = sum(r[2] for r in rows)
    ests = []
    for t in range(15):
        got = priority_sample(df, k=8, salt=f"e{t}").collect()
        ests.append(sum(r.est_w for r in got))
    mean = sum(ests) / len(ests)
    assert abs(mean - true_total) / true_total < 0.35


def test_two_phase_equals_single_window(spark):
    # the pre-bucketed two-phase top-k must equal the naive single
    # window: recompute naively from the same priorities
    rows = [(i, f"s{i % 3}", 5 + i) for i in range(120)]
    got = sorted(
        (r.stratum, r.sample_rank, r.doc_id)
        for r in priority_sample(_mk(spark, rows), k=4).collect()
    )
    by_stratum = {}
    for i, s, w in rows:
        by_stratum.setdefault(s, []).append((i, w))
    want = []
    for s, members in by_stratum.items():
        order = sorted(members, key=lambda m: (-_prio(m[0], m[1]), m[0]))[:4]
        want += [(s, rk + 1, d) for rk, (d, _) in enumerate(order)]
    assert got == sorted(want)


def test_matches_duckdb_oracle_sf0001(spark):
    import duckdb

    from ngff_zarr_spark.gate import q_corpus_priority_sample
    from ngff_zarr_spark.oracle import oracles

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.doc_id, r.stratum, r.weight, r.sample_rank, r.est_w)
        for r in q_corpus_priority_sample(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        tuple(t) for t in con.execute(oracles()["corpus_priority_sample"]).fetchall()
    )
    assert got == want
