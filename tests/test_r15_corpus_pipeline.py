"""Composed corpus-pipeline gate (r15, VERDICT r14 ask #1).

The gate itself is value-checked against the composed DuckDB twin by
the driver (and tools/check_correctness.py); these tests pin the
composition CONTRACTS the digest rows can't show on their own:
stage-to-stage survivor flow, consistency of stage 1 with the
standalone operator, and the funnel's monotonicity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark import gate


@pytest.fixture(scope="module")
def pipeline_rows(spark, sf_dir):
    rows = gate.q_corpus_pipeline_battery(spark, sf_dir).collect()
    return {r["gate"]: r for r in rows}


def test_stage_rows_form_a_funnel(spark, sf_dir, pipeline_rows):
    d = pipeline_rows
    assert set(d) == {
        "pipe_filter", "pipe_lines", "pipe_dedup",
        "pipe_contam", "pipe_mix", "pipe_pack",
    }
    n_docs = gate._docs(spark, sf_dir).count()
    assert d["pipe_filter"]["n_rows"] == n_docs  # a verdict per doc
    # line_dedup emits one row per filter survivor; later stages only
    # shrink the doc set (mix/pack may grow via repetition epochs)
    assert d["pipe_lines"]["n_rows"] <= n_docs
    assert d["pipe_dedup"]["n_rows"] <= d["pipe_lines"]["n_rows"]
    assert d["pipe_contam"]["n_rows"] == d["pipe_dedup"]["n_rows"]
    assert d["pipe_pack"]["n_rows"] == d["pipe_mix"]["n_rows"]
    for r in d.values():
        assert r["n_rows"] > 0, r


def test_stage1_digest_matches_standalone_operator(spark, sf_dir, pipeline_rows):
    """pipe_filter is the standalone filter_pipeline's digest verbatim
    — the composition does not perturb stage semantics."""
    solo = gate._digest_gate(
        gate.q_corpus_filter_pipeline(spark, sf_dir), "pipe_filter"
    ).collect()[0]
    got = pipeline_rows["pipe_filter"]
    assert (got["n_rows"], got["d1"], got["d2"]) == (
        solo["n_rows"], solo["d1"], solo["d2"],
    )


def test_survivor_flow_matches_stage_tables(spark, sf_dir, pipeline_rows):
    """Recompute the survivor chain with the public operators and pin
    the digest row counts to the actual stage cardinalities."""
    from ngff_zarr_spark.functions.corpus import filter_pipeline
    from ngff_zarr_spark.functions.spans import line_dedup

    docs = gate._docs(spark, sf_dir)
    kept = filter_pipeline(docs).filter("keep").select("doc_id")
    s1 = docs.join(kept, "doc_id").select("doc_id", "text")
    assert pipeline_rows["pipe_lines"]["n_rows"] == s1.count()
    ld = line_dedup(s1)
    nonempty = ld.filter(F.col("clean_text") != "").count()
    assert pipeline_rows["pipe_dedup"]["n_rows"] <= nonempty


def test_mix_ids_are_collision_free(spark, sf_dir):
    """mix_id = doc_id * PIPE_MIX_MUL + epoch requires epoch <
    PIPE_MIX_MUL for injectivity — pin the realized epochs and the
    resulting distinctness on the live corpus."""
    from ngff_zarr_spark.functions.corpus import filter_pipeline, temperature_mixture

    docs = gate._docs(spark, sf_dir)
    kept = filter_pipeline(docs).filter("keep").select("doc_id")
    s = docs.join(kept, "doc_id").select("doc_id", "source")
    mix = temperature_mixture(s, group_col="source")
    stats = mix.agg(
        F.max("epoch").alias("max_epoch"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(
            F.col("doc_id") * gate.PIPE_MIX_MUL + F.col("epoch")
        ).alias("n_distinct"),
    ).collect()[0]
    assert stats["max_epoch"] < gate.PIPE_MIX_MUL
    assert stats["n"] == stats["n_distinct"]
