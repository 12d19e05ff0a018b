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


def _interleave_nd(buckets: list[str], bits: int) -> str:
    """SQL text interleaving N bits-bit buckets: bit i of dimension j
    lands at position i*n + (n-1-j) — dimension 0 takes the HIGHEST
    bit of each n-bit group (for n=2 this is exactly the classic
    b1-odd/b2-even Morton layout). Shift/mask only."""
    n = len(buckets)
    terms = []
    for i in range(bits):
        for j, b in enumerate(buckets):
            terms.append(f"((({b} >> {i}) & 1) << {i * n + (n - 1 - j)})")
    return "(" + " | ".join(terms) + ")"


def zorder_keys(
    df: DataFrame,
    c1: str,
    c2: str,
    id_col: str,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """(id_col, b1, b2, zkey): the classic two-column Morton key —
    the N-dimensional form specialized to [c1, c2]."""
    return zorder_keys_nd(df, [c1, c2], id_col, bits=bits)


def zorder_keys_nd(
    df: DataFrame,
    cols: list[str],
    id_col: str,
    bits: int | None = None,
) -> DataFrame:
    """(id_col, b1..bN, zkey): each row's per-dimension buckets and the
    N-dimensional Morton key over numeric columns ``cols``. min/max for
    every dimension come from ONE tiny aggregate broadcast back — no
    sort, no shuffle beyond the 1-row broadcast; the follow-up
    ``df.repartitionByRange(zkey)`` (or a writer's sortBy) is what
    physically clusters the data so parquet row-group min/max stats
    prune on ANY filtered subset of the dimensions
    (tests/test_r13_zorder.py pins the row-group skip payoff).

    ``bits`` defaults to as much per-dimension resolution as fits a
    non-negative BIGINT (≤ ``ZORDER_BITS``); N·bits must stay ≤ 62."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns (one column: just sort)")
    if bits is None:
        bits = min(ZORDER_BITS, 62 // n)
    if bits < 1 or n * bits > 62:
        raise ValueError(
            f"bits={bits} with {n} dims needs {n * bits} key bits; "
            "must be 1 <= n*bits <= 62 to fit a non-negative BIGINT"
        )
    stats = df.agg(
        *[
            a
            for j, c in enumerate(cols)
            for a in (
                F.min(c).alias(f"lo{j + 1}"),
                F.max(c).alias(f"hi{j + 1}"),
            )
        ]
    )
    bexprs = [
        f"{_bucket(c, f'lo{j + 1}', f'hi{j + 1}', bits)} AS b{j + 1}"
        for j, c in enumerate(cols)
    ]
    bnames = [f"b{j + 1}" for j in range(n)]
    return (
        df.select(id_col, *cols)
        .crossJoin(F.broadcast(stats))
        .selectExpr(id_col, *bexprs)
        .selectExpr(
            id_col,
            *bnames,
            f"CAST({_interleave_nd(bnames, bits)} AS BIGINT) AS zkey",
        )
    )


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> DataFrame:
    """All of ``df``'s columns plus the N-dim Morton ``zkey`` — the
    join-free form a writer uses (zorder_keys_nd projects only
    id+dims, which would force a join to recover the payload; at
    100 TB that join IS the cost, so the key is computed inline from
    the same 1-row broadcast stats)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns (one column: just sort)")
    if bits is None:
        bits = min(ZORDER_BITS, 62 // n)
    if bits < 1 or n * bits > 62:
        raise ValueError(
            f"bits={bits} with {n} dims needs {n * bits} key bits; "
            "must be 1 <= n*bits <= 62 to fit a non-negative BIGINT"
        )
    stats = df.agg(
        *[
            a
            for j, c in enumerate(cols)
            for a in (
                F.min(c).alias(f"_zlo{j + 1}"),
                F.max(c).alias(f"_zhi{j + 1}"),
            )
        ]
    )
    # two-step projection: materialize the bucket columns first, then
    # interleave — inlining the bucket CASE text into every interleave
    # term would repeat it bits·n times (codegen bloat)
    bexprs = [
        f"{_bucket(c, f'_zlo{j + 1}', f'_zhi{j + 1}', bits)} AS _zb{j + 1}"
        for j, c in enumerate(cols)
    ]
    bnames = [f"_zb{j + 1}" for j in range(n)]
    base = df.columns
    return (
        df.crossJoin(F.broadcast(stats))
        .selectExpr(*base, *bexprs)
        .selectExpr(
            *base,
            f"CAST({_interleave_nd(bnames, bits)} AS BIGINT) AS zkey",
        )
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int | None = None,
) -> DataFrame:
    """Physically cluster ``df`` on the Z-order curve over ``cols``:
    range-partition by zkey (contiguous curve segments per output
    file) and sort within partitions, then drop the key. Write the
    result as parquet and row-group min/max stats prune scans filtered
    on ANY subset of ``cols`` (tests/test_r13_zorder.py pins the
    payoff). This is the OPTIMIZE ZORDER BY verb as a plain
    DataFrame-to-DataFrame transform."""
    return (
        with_zorder_key(df, cols, bits=bits)
        .repartitionByRange(n_partitions, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str] | None = None,
    files_per_partition: int = 1,
    bits: int | None = None,
) -> None:
    """Hive-style partitioned parquet write, optionally Z-order
    clustered WITHIN each partition — the two layout levers composed
    the way a 100 TB table actually uses them: coarse categorical
    pruning via directory partitions (the scan's PartitionFilters
    never open non-matching files at all) and fine numeric pruning via
    row-group min/max on the clustered columns inside each partition.

    The pre-write shuffle is ONE repartition keyed by (partition cols
    [, zkey range]) so each output partition directory is written by
    tasks that hold only its rows — without it, every task appends a
    file into every directory and a 10k-partition table gets
    tasks*10k tiny files (the classic small-files failure).
    tests/test_r13_partition_pruning.py pins both pruning layers."""
    if cluster_cols:
        keyed = with_zorder_key(df, cluster_cols, bits=bits)
        shaped = (
            keyed.repartitionByRange(
                max(files_per_partition, 1) * 8,
                *(list(partition_cols) + ["zkey"]),
            )
            .sortWithinPartitions(*(list(partition_cols) + ["zkey"]))
            .drop("zkey")
        )
    else:
        shaped = df.repartition(
            max(files_per_partition, 1) * 8, *partition_cols
        )
    shaped.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
