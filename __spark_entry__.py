"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-style pricing summary)
at sf0.001; ``queries()`` exposes one callable per implemented operator
from SURVEY.md §2 (plus the LLM-pipeline operators); ``oracle_sql()``
gives each one's independent DuckDB oracle. See ngff_zarr_spark/gate.py
and ngff_zarr_spark/oracle.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ngff_zarr_spark import gate, oracle  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gate.q_tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate.queries()


def oracle_sql() -> dict[str, str]:
    return oracle.oracles()
