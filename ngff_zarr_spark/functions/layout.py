"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the physical LAYOUT is a first-class query accelerator:
parquet row-group min/max statistics and partition pruning only skip
data when rows that are close in the FILTER space are close on disk.
Sorting by a single column clusters one dimension and scatters the
rest; interleaving the bits of two bucketed dimensions (the classic
Z-order curve Delta/Iceberg expose as OPTIMIZE ZORDER BY) bounds the
bucket range of BOTH dimensions inside any key range, so a scan
filtered on either column — or both — skips most row groups.

Everything is exact integer arithmetic after one explicit double
rounding step: per-column min/max arrive from a 1-row broadcast
aggregate, values scale to ``bits``-bit buckets via
floor((v−min)·(2^bits−1)/(max−min)) — the double expression is written
with ONE operand order so both engines produce the identical IEEE
result before the floor — and the interleave is pure shift/mask, so
the DuckDB oracle reproduces every key bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension bucket resolution


def _bucket(col: str, lo: str, hi: str, bits: int) -> str:
    """SQL text of the bits-bit bucket of ``col`` given per-column
    min/max columns ``lo``/``hi`` (same text runs in DuckDB). A
    CONSTANT dimension (hi == lo) buckets to 0 — without the guard the
    scale divides by zero and every key goes NULL."""
    k = (1 << bits) - 1
    return (
        f"CASE WHEN CAST({hi} AS DOUBLE) = CAST({lo} AS DOUBLE) THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(LEAST(CAST({k} AS BIGINT), GREATEST(CAST(0 AS BIGINT), "
        f"CAST(floor((CAST({col} AS DOUBLE) - CAST({lo} AS DOUBLE)) * {k}.0 "
        f"/ (CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE))) AS BIGINT))) AS BIGINT) END"
    )


def _interleave(b1: str, b2: str, bits: int) -> str:
    """SQL text interleaving two bits-bit buckets (b1 takes the odd =
    higher bit of each pair), shift/mask only."""
    terms = []
    for i in range(bits):
        terms.append(f"((({b1} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b2} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def zorder_keys(
    df: DataFrame,
    c1: str,
    c2: str,
    id_col: str,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """(id_col, b1, b2, zkey): each row's per-dimension buckets and
    Morton key over numeric columns ``c1``/``c2``. min/max come from
    ONE tiny aggregate broadcast back — no sort, no shuffle beyond the
    1-row broadcast; the follow-up ``df.repartitionByRange(zkey)`` (or
    a writer's sortBy) is what physically clusters the data."""
    stats = df.agg(
        F.min(c1).alias("lo1"), F.max(c1).alias("hi1"),
        F.min(c2).alias("lo2"), F.max(c2).alias("hi2"),
    )
    b1 = _bucket(c1, "lo1", "hi1", bits)
    b2 = _bucket(c2, "lo2", "hi2", bits)
    return (
        df.select(id_col, c1, c2)
        .crossJoin(F.broadcast(stats))
        .selectExpr(
            id_col,
            f"{b1} AS b1",
            f"{b2} AS b2",
        )
        .selectExpr(
            id_col,
            "b1",
            "b2",
            f"CAST({_interleave('b1', 'b2', bits)} AS BIGINT) AS zkey",
        )
    )
