"""Round-4 fixes: reliable checkpointing for duplicate_clusters
(VERDICT r4 ask #2), non-convergence now raises (ADVICE), the
session_window exact-gap boundary pinned against Spark's observed
merge semantics (ADVICE), ivf_topk_partitioned empty-query guard
(ADVICE), and CLI --dims validation (ADVICE)."""

import datetime
import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.dedup import duplicate_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


CHAIN = [(i, i + 1) for i in range(0, 9)]  # 0-1-2-...-9: diameter 9
EXPECT_CHAIN = {(i, 0) for i in range(10)}


def test_clusters_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches the loop to reliable checkpoint();
    labels identical to the localCheckpoint path, and RDD checkpoint
    files actually land in the directory (the FT contract: executor
    loss mid-loop recomputes from the last round, not from scratch)."""
    ckpt = str(tmp_path / "ckpt")
    local = duplicate_clusters(_pairs(spark, CHAIN), reliable=False)
    rel = duplicate_clusters(_pairs(spark, CHAIN), checkpoint_dir=ckpt)
    assert {tuple(r) for r in rel.collect()} == EXPECT_CHAIN
    assert {tuple(r) for r in local.collect()} == EXPECT_CHAIN
    written = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert written, "reliable mode must write checkpoint files"
    # r5 (ADVICE): the library must restore the session's prior
    # checkpoint dir (here: unset) rather than leak its own — later
    # calls with reliable=None must keep using localCheckpoint
    assert spark.sparkContext.getCheckpointDir() is None


def test_clusters_default_follows_session_checkpoint_dir(spark, tmp_path):
    """reliable=None → on iff the SparkContext has a checkpoint dir."""
    assert spark.sparkContext.getCheckpointDir() is None
    out = duplicate_clusters(_pairs(spark, [(1, 2)]))
    assert {tuple(r) for r in out.collect()} == {(1, 1), (2, 1)}


def test_clusters_nonconvergence_raises(spark):
    """A chain longer than max_iters propagation rounds must raise,
    not silently return partial labels (the oracle computes exact
    transitive closure — silent divergence means wrong dedup drops)."""
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(_pairs(spark, CHAIN), max_iters=2)
    # and enough rounds converges: hash-min needs ~diameter rounds
    ok = duplicate_clusters(_pairs(spark, CHAIN), max_iters=12)
    assert {tuple(r) for r in ok.collect()} == EXPECT_CHAIN


# ---------------------------------------------------------------------------
# session_window exact-gap boundary (ADVICE #1): observed Spark
# semantics — an event at exactly prev_end MERGES into the session
# (end moves to event+gap); one microsecond past splits. The oracle's
# strict `us - lag(us) > gap_us` break encodes exactly this; this test
# pins both sides on the boundary fixture so a future Spark behavior
# change (or oracle edit) fails loudly.

GAP_S = 1800
T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _boundary_events(spark):
    rows = [
        (1, T0), (1, T0 + datetime.timedelta(seconds=GAP_S)),           # == gap
        (2, T0), (2, T0 + datetime.timedelta(seconds=GAP_S, microseconds=1)),  # gap+1µs
    ]
    return spark.createDataFrame(rows, "user_id long, event_time timestamp")


def _spark_sessions(spark):
    df = _boundary_events(spark)
    return {
        tuple(r)
        for r in (
            df.groupBy("user_id", F.session_window("event_time", f"{GAP_S} seconds"))
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.unix_micros("session_window.start").alias("start_us"),
                F.unix_micros("session_window.end").alias("end_us"),
                "n_events",
            )
            .collect()
        )
    }


def test_session_window_exact_gap_boundary(spark):
    t0_us = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
    gap_us = GAP_S * 1_000_000
    got = _spark_sessions(spark)
    assert got == {
        # user 1: exact-gap pair merges into ONE session ending at
        # second event + gap
        (1, t0_us, t0_us + 2 * gap_us, 2),
        # user 2: one µs past the gap splits
        (2, t0_us, t0_us + gap_us, 1),
        (2, t0_us + gap_us + 1, t0_us + 2 * gap_us + 1, 1),
    }


def test_session_window_oracle_matches_on_boundary(spark):
    """The DuckDB oracle expression (strict > break) reproduces the
    Spark result on the boundary fixture."""
    got = _spark_sessions(spark)
    t0_us = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
    gap_us = GAP_S * 1_000_000
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (user_id BIGINT, us BIGINT)"
    )
    for uid, us in [
        (1, t0_us), (1, t0_us + gap_us),
        (2, t0_us), (2, t0_us + gap_us + 1),
    ]:
        con.execute("INSERT INTO e VALUES (?, ?)", [uid, us])
    oracle = con.execute(
        f"""WITH g AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {gap_us} THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
), s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT user_id, MIN(us), MAX(us) + {gap_us}, COUNT(*)
FROM s GROUP BY user_id, sid"""
    ).fetchall()
    assert {tuple(int(v) for v in r) for r in oracle} == got


# ---------------------------------------------------------------------------
# IVF empty-query guard (ADVICE #3)


def test_ivf_partitioned_empty_queries(spark, tmp_path):
    from ngff_zarr_spark.functions.similarity import (
        ivf_topk_partitioned,
        write_ivf_partitioned,
    )

    rng = np.random.default_rng(7)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in rng.normal(size=8)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    write_ivf_partitioned(emb, path, dim=8, n_cells=4)
    out = ivf_topk_partitioned(spark, path, query_ids=[99999], k=3)
    assert out.columns == ["query_id", "rank", "neighbor_id", "cosine"]
    assert out.count() == 0
    # non-empty still works on the same layout
    some = ivf_topk_partitioned(spark, path, query_ids=[0, 1], k=3)
    assert some.count() == 6


# ---------------------------------------------------------------------------
# CLI --dims validation (ADVICE #4)


@pytest.fixture()
def tiff_file(tmp_path):
    from ngff_zarr_spark.ingest.tiff import tiff_encode

    arr = (np.arange(24 * 20, dtype=np.uint16) % 251).reshape(24, 20)
    p = tmp_path / "img.tif"
    p.write_bytes(tiff_encode(arr))
    return p


def _run_cli(spark, tiff_file, tmp_path, dims):
    from ngff_zarr_spark.__main__ import main

    out = tmp_path / "out.ome.zarr"
    return main(
        ["-i", str(tiff_file), "-o", str(out), "--min-length", "16", "-q",
         "--dims", *dims],
        spark=spark,
    )


def test_cli_dims_rejects_unknown(spark, tiff_file, tmp_path):
    with pytest.raises(SystemExit, match="unsupported name"):
        _run_cli(spark, tiff_file, tmp_path, ["y", "q"])


def test_cli_dims_rejects_duplicates(spark, tiff_file, tmp_path):
    with pytest.raises(SystemExit, match="distinct"):
        _run_cli(spark, tiff_file, tmp_path, ["y", "y"])


def test_cli_dims_rejects_wrong_arity(spark, tiff_file, tmp_path):
    with pytest.raises(SystemExit, match="expected 2 names"):
        _run_cli(spark, tiff_file, tmp_path, ["z", "y", "x"])


def test_cli_dims_valid_rename(spark, tiff_file, tmp_path):
    import json

    assert _run_cli(spark, tiff_file, tmp_path, ["z", "x"]) == 0
    attrs = json.loads((tmp_path / "out.ome.zarr" / ".zattrs").read_text())
    axes = [a["name"] for a in attrs["multiscales"][0]["axes"]]
    assert axes == ["z", "x"]
