"""Round-5 fixes from ADVICE r4: duplicate_clusters no longer mutates
session-global checkpoint state (prior dir restored exactly), guards
max_iters<=0 and reliable-without-dir explicitly."""

import pytest

from ngff_zarr_spark.functions.dedup import duplicate_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_clusters_max_iters_zero_raises(spark):
    """max_iters<=0 is a usage error, not a 'did not converge' — even
    the empty graph needs one round to detect convergence."""
    with pytest.raises(ValueError, match="max_iters"):
        duplicate_clusters(_pairs(spark, [(1, 2)]), max_iters=0)
    with pytest.raises(ValueError, match="max_iters"):
        duplicate_clusters(_pairs(spark, [(1, 2)]), max_iters=-3)


def test_clusters_reliable_without_dir_raises(spark):
    """reliable=True with no checkpoint dir anywhere must fail fast
    with a clear message, not die mid-loop inside Spark."""
    assert spark.sparkContext.getCheckpointDir() is None
    with pytest.raises(ValueError, match="checkpoint"):
        duplicate_clusters(_pairs(spark, [(1, 2)]), reliable=True)


def test_clusters_checkpoint_dir_restored_exactly(spark, tmp_path):
    """Passing checkpoint_dir= must not leak into the session: the
    EXACT prior dir (including Spark's UUID subdir) is restored, and
    when there was none, the session ends up unset again."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    a = str(tmp_path / "a")
    sc.setCheckpointDir(a)
    prior = sc.getCheckpointDir()
    assert prior is not None
    try:
        out = duplicate_clusters(
            _pairs(spark, [(1, 2)]), checkpoint_dir=str(tmp_path / "b")
        )
        assert {tuple(r) for r in out.collect()} == {(1, 1), (2, 1)}
        # exact restore — not a fresh UUID subdir under `a`
        assert sc.getCheckpointDir() == prior
    finally:
        jopt = sc._jvm.scala.Option.empty()
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(jopt)
    assert sc.getCheckpointDir() is None
