"""Systemic guard for the cross-engine numeric-canonicalization bug
class (VERDICT r13 ask #1; previously the r12 identifier-quoting fix).

DuckDB widens SUM(BIGINT/INTEGER) to HUGEINT (int128) and SUM over
exact fractional literals to DECIMAL; the driver's value hasher
canonicalizes those differently from Spark's BIGINT/DOUBLE even when
every value is numerically identical — a silent hash_match=false that
has now cost two rounds (r12 quoting, r13 dedup_lines).

This test executes EVERY registered oracle against DuckDB at sf0.001
and asserts no result column comes back HUGEINT / UHUGEINT / DECIMAL:
each oracle must CAST its sums to BIGINT (or DOUBLE) explicitly, like
sql_graph_triangles does. See memory: cross-engine-float-determinism.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _oracle_items():
    from ngff_zarr_spark import oracle

    return sorted(oracle.oracles().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in TABLES:
        c.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield c
    c.close()


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=lambda p: p if isinstance(p, str) and "\n" not in p else "")
def test_oracle_no_widened_types(con, name, sql):
    rel = con.sql(sql)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(f in str(t).upper() for f in FORBIDDEN)
    ]
    assert not bad, (
        f"oracle {name!r} returns driver-hash-unsafe column types {bad}; "
        "CAST the offending aggregate to BIGINT/DOUBLE in oracle.py"
    )
