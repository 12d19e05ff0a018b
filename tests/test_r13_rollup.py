"""r13 native ROLLUP report (gate.q_events_rollup): level semantics,
grouping-id parity with DuckDB's GROUPING(), and consistency between
rollup levels."""

from __future__ import annotations

from ngff_zarr_spark.gate import q_events_rollup


def test_levels_are_consistent(spark, sf_dir):
    rows = q_events_rollup(spark, sf_dir).collect()
    detail = [r for r in rows if r.gid == 0]
    per_type = {r.event_type: r for r in rows if r.gid == 1}
    total = [r for r in rows if r.gid == 3]
    assert len(total) == 1
    # counts roll up exactly level by level
    assert sum(r.n for r in detail) == total[0].n
    assert sum(r.n for r in per_type.values()) == total[0].n
    for t, r in per_type.items():
        assert sum(d.n for d in detail if d.event_type == t) == r.n
        assert r.day_epoch == -1  # sentinel for the rolled-up key
    assert total[0].event_type == "<all>"
    # exact-decimal money path: per-type sums add to the grand total
    # with no float drift beyond the final double cast
    assert abs(sum(r.sum_value for r in per_type.values()) - total[0].sum_value) < 1e-6


def test_matches_duckdb_rollup(spark, sf_dir):
    import duckdb

    from ngff_zarr_spark.oracle import oracles

    got = sorted(
        (r.event_type, r.day_epoch, r.gid, r.n, r.sum_value)
        for r in q_events_rollup(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(
        tuple(t) for t in con.execute(oracles()["events_rollup"]).fetchall()
    )
    assert got == want
    assert any(r[2] == 3 for r in got)  # grand-total row present
