"""Composed crawl-pipeline gate (r16, fifth composed family member).

Pins the composition contracts beyond the driver's digest check:
stage-to-stage funnel geometry, live-DuckDB twin equality, and the
budget cap actually binding.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark import gate, oracle


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    return {r["gate"]: r for r in gate.q_web_pipeline_battery(spark, sf_dir).collect()}


def test_funnel_geometry(spark, sf_dir, rows):
    d = rows
    assert set(d) == {"wpipe_clusters", "wpipe_hosts", "wpipe_budget", "wpipe_quality"}
    docs = gate._docs(spark, sf_dir)
    n_docs = docs.count()
    n_hosts = docs.select("source").distinct().count()
    # clusters: fewer canonical pages than documents (spelling collapse)
    assert 0 < d["wpipe_clusters"]["n_rows"] < n_docs
    assert d["wpipe_hosts"]["n_rows"] == n_hosts
    # budget: ≤ cap per host, and the cap binds (page slots ≫ cap)
    assert d["wpipe_budget"]["n_rows"] == n_hosts * gate.WPIPE_CAP
    # quality: one verdict per surviving representative
    assert d["wpipe_quality"]["n_rows"] == d["wpipe_budget"]["n_rows"]


def test_matches_duckdb_twin(sf_dir, rows):
    got = {r["gate"]: (r["n_rows"], r["d1"], r["d2"]) for r in rows.values()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(oracle.sql_web_pipeline_battery()).fetchall()
    }
    assert got == want


def test_plan_contracts(spark, sf_dir):
    """The chain's scale posture: the budget survivor set broadcasts
    into the doc join (never a shuffled join on the full corpus), and
    no stage plans a cartesian or nested-loop join."""
    from ngff_zarr_spark.functions.sampling import cap_per_source
    from ngff_zarr_spark.functions.text import gopher_quality
    from ngff_zarr_spark.functions.web import url_dedup

    docs = gate._docs(spark, sf_dir)
    urls = gate._doc_urls(docs)
    clusters = url_dedup(urls)
    pages = clusters.select(
        F.col("rep_id").alias("doc_id"),
        F.regexp_extract("canonical_url", r"^https?://([^/:]+)", 1).alias("source"),
    )
    budget = cap_per_source(pages, k=gate.WPIPE_CAP, salt="wpipe")
    s4 = docs.join(F.broadcast(budget.select("doc_id")), "doc_id")
    plan = gopher_quality(s4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
