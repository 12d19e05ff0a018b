"""Adversarial-skew dedup (VERDICT r8 ask #5): the bucket-occupancy
cap at the scale it exists for. A k-member byte-identical boilerplate
cluster must produce O(k) candidate pairs (star edges), one connected
component, and one surviving representative — and the candidate count
must grow LINEARLY in k (the uncapped band join would be ~k^2/2)."""

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark import gate
from ngff_zarr_spark.functions import dedup as D


@pytest.fixture(scope="module")
def base_cand_count(spark, sf_dir):
    return D.minhash_candidates(
        gate._docs(spark, sf_dir).select("doc_id", "text")
    ).count()


@pytest.mark.parametrize("n", [2_000, 8_000])
def test_skew_candidates_linear(spark, sf_dir, base_cand_count, n):
    """cand(base ∪ k-boilerplate) == cand(base) + (k-1): each over-cap
    bucket contributes exactly the hub star (identical in all 16 bands,
    deduplicated), and no cross pairs arise. Exact equality at two k
    values IS the linearity proof — a quadratic (or even superlinear)
    pair set cannot satisfy both."""
    cand = D.minhash_candidates(gate._skew_docs(spark, sf_dir, n=n))
    assert cand.count() == base_cand_count + (n - 1)


def test_skew_cluster_and_keep(spark, sf_dir):
    n = 5_000
    docs = gate._skew_docs(spark, sf_dir, n=n)
    cand = D.minhash_candidates(docs).cache()
    clusters = D.duplicate_clusters(cand)
    boiler = clusters.filter(F.col("doc_id") >= gate.SKEW_BASE_ID)
    stats = boiler.agg(
        F.count("*").alias("rows"),
        F.countDistinct("cluster_id").alias("nclusters"),
        F.min("cluster_id").alias("label"),
    ).collect()[0]
    assert stats["rows"] == n
    assert stats["nclusters"] == 1
    assert stats["label"] == gate.SKEW_BASE_ID
    kept = D.dedup_keep_representatives(docs, cand).filter(
        F.col("doc_id") >= gate.SKEW_BASE_ID
    )
    assert kept.count() == 1
    cand.unpersist()


def test_skew_no_quadratic_stage_in_plan(spark, sf_dir):
    """The physical plan of the skew candidate join must contain no
    cartesian/nested-loop stage; the cap turns the oversized bucket
    into a filter+projection arm."""
    plan = D.minhash_candidates(
        gate._skew_docs(spark, sf_dir, n=4_000)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cap_per_source_two_phase_equals_naive(spark, sf_dir):
    """The skew-resistant two-phase top-k must equal the naive single
    window exactly (same k smallest hashes per source), at several
    pre-bucket counts including 1 (degenerate = naive)."""
    from pyspark.sql import Window

    from ngff_zarr_spark.functions.sampling import cap_per_source
    from ngff_zarr_spark.functions.text import h64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hv = h64(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(hv, "doc_id")
    naive = (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .selectExpr("doc_id", "source", "CAST(rk AS LONG) AS rk")
    )
    want = sorted(tuple(r) for r in naive.collect())
    for nb in (1, 8, 64):
        got = sorted(
            tuple(r) for r in cap_per_source(docs, k=3, n_prebuckets=nb).collect()
        )
        assert got == want, nb


def test_cap_per_source_invariants(spark, sf_dir):
    from ngff_zarr_spark.functions.sampling import cap_per_source

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = cap_per_source(docs, k=2)
    per = out.groupBy("source").count().collect()
    assert per and all(r["count"] <= 2 for r in per)
    # ranks are exactly 1..count(source)
    rks = out.groupBy("source").agg(
        F.min("rk").alias("lo"), F.max("rk").alias("hi"), F.count("*").alias("n")
    ).collect()
    assert all(r["lo"] == 1 and r["hi"] == r["n"] for r in rks)
    # determinism: same output on a rerun
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in cap_per_source(docs, k=2).collect())
    assert a == b


def test_decontaminate_self_contamination(spark, sf_dir):
    """Every benchmark doc with >= n tokens must flag itself; docs
    sharing no 8-gram with the benchmark must not be flagged."""
    from ngff_zarr_spark.functions.corpus import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 3)
    out = decontaminate(docs, bench, n=8).cache()
    try:
        bench_rows = out.join(bench.select("doc_id"), "doc_id")
        bad = bench_rows.filter(
            (F.col("n_grams") > 0) & (~F.col("contaminated"))
        ).count()
        assert bad == 0
        # contaminated implies hits, and hits <= grams
        assert out.filter(F.col("n_hits") > F.col("n_grams")).count() == 0
        assert out.filter(
            F.col("contaminated") != (F.col("n_hits") > 0)
        ).count() == 0
        # output covers every doc exactly once
        assert out.count() == docs.count()
    finally:
        out.unpersist()
