"""Deterministic sketches for 100 TB profiling: KMV distinct-count and
count-min frequency estimation.

Why not Spark's built-ins: ``approx_count_distinct`` (HyperLogLog++)
and ``percentile_approx`` are engine-specific — their estimates can't
be cross-checked against another engine. These sketches hash with the
portable md5-based ``h64`` (same function the dedup/LSH operators use),
so DuckDB computes the IDENTICAL sketch — estimates and all — making
approximate operators exactly oracle-checkable, the same determinism
discipline as the rest of the gate registry.

Scale posture:
- KMV: one distinct-hash pass then a global top-k of SMALLEST hashes —
  Spark's sort+limit physical plan is per-partition top-k + a k-row
  merge on one reducer (k ~ 256 rows move, never the data).
- Count-min: ``depth`` h64 expressions per row, one groupBy on
  (row, bucket) — a bounded-cardinality aggregate (depth × width
  cells) with map-side combine; the sketch table is broadcast-sized
  by construction, and estimation is a broadcast join against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import h64

H64_MAX = 1 << 60  # h64 = 15 hex chars of md5 → uniform on [0, 2^60)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count estimate (Bar-Yossef et al.):
    keep the k smallest distinct hash values; if the k-th smallest is
    h_k, the estimate is (k-1) * H_MAX / h_k. Returns one row
    (k_used, kth_hash, est) — ``est`` rounded to 6 decimals.

    When the column has fewer than k distinct values the exact count
    is returned (standard KMV small-cardinality fallback)."""
    hashes = (
        df.select(h64(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = hashes.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth_hash"),
    )
    return agg.select(
        "k_used",
        "kth_hash",
        F.round(
            F.when(
                F.col("k_used") < k, F.col("k_used").cast("double")
            ).otherwise((F.col("k_used") - 1) * F.lit(float(H64_MAX)) / F.col("kth_hash")),
            6,
        ).alias("est"),
    )


def count_min_sketch(df: DataFrame, col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Count-min sketch table: (row, bucket, cnt) — ``depth``
    independent hash rows, bucket = h64('<row>:' || value) % width.
    Bounded cardinality (depth × width cells): the aggregate combines
    map-side and the result broadcasts."""
    rows = [
        df.select(
            F.lit(r).alias("row"),
            (h64(F.concat(F.lit(f"{r}:"), F.col(col).cast("string"))) % width).alias("bucket"),
        )
        for r in range(depth)
    ]
    union = rows[0]
    for other in rows[1:]:
        union = union.unionByName(other)
    return union.groupBy("row", "bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def count_min_estimate(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Frequency estimate per distinct value of ``col``: the classic
    min-over-rows count-min upper bound, joined with the exact count so
    the (always ≥) bound is visible. Returns (value, exact_n, cm_est)."""
    sketch = count_min_sketch(df, col, depth, width)
    values = df.groupBy(F.col(col).cast("string").alias("value")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    probes = values.select(
        "value",
        "exact_n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    (h64(F.concat(F.lit(f"{r}:"), F.col("value"))) % width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("p"),
    ).select("value", "exact_n", F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("value", "exact_n")
        .agg(F.min("cnt").alias("cm_est"))
    )
