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


HLL_M = 64            # 2^6 registers
HLL_ALPHA = 0.709     # standard bias constant for m = 64
_HLL_REM_BITS = 54    # h64 is 60 bits; 6 go to the bucket index


def hll_distinct(df: DataFrame, col: str, m: int = HLL_M) -> DataFrame:
    """HyperLogLog distinct-count with the portable h64 (Flajolet et
    al. 2007): bucket = h mod m, rank = leading-zero count of the
    remaining 54 bits + 1, register = max rank per bucket, estimate =
    alpha * m^2 / sum(2^-register) with the standard small-range
    linear-counting correction. Returns one row
    (m, n_nonempty, reg_checksum, est).

    Determinism discipline: every register — and therefore the
    ESTIMATE — is identical in the DuckDB oracle. The harmonic terms
    are powers of two (exact in IEEE doubles); ``ln`` only runs in the
    small-range branch, which gate-scale cardinalities never hit.

    Scale posture: one hash projection, one bounded m-row aggregate
    with map-side combine — the register table is O(m) regardless of
    input size, the textbook 100 TB distinct-count plan."""
    hashed = df.select(h64(F.col(col).cast("string")).alias("h")).select(
        (F.col("h") % m).alias("b"),
        F.expr(f"h div {m}").alias("rem"),
    )
    rank = F.when(F.col("rem") == 0, F.lit(_HLL_REM_BITS + 1)).otherwise(
        F.lit(_HLL_REM_BITS) - F.length(F.bin(F.col("rem"))) + 1
    )
    regs = hashed.select("b", rank.alias("r")).groupBy("b").agg(
        F.max("r").alias("reg")
    )
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_ne"),
        F.sum((F.col("b") + 1) * F.col("reg")).cast("long").alias("reg_checksum"),
    )
    v_empty = F.lit(m) - F.col("n_nonempty")
    s = F.col("s_ne") + v_empty.cast("double")  # empty registers add 2^0
    raw = F.lit(HLL_ALPHA * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        "n_nonempty",
        "reg_checksum",
        F.round(est, 6).alias("est"),
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


def sliding_distinct_users(
    ev: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_hours: int = 24,
    m: int = HLL_M,
) -> DataFrame:
    """Trailing-window distinct-user estimates per hour — the sliding
    dashboard metric done the 100 TB way: instead of re-scanning the
    raw events for every window (24× re-read) or running a giant
    distinct per window, the stream reduces ONCE to hourly HLL
    registers (≤ m rows/hour), each register row fans out to the
    ``window_hours`` output hours it contributes to (bounded explode —
    hours × m × W tiny rows), and a max-merge per output hour
    reconstitutes the window sketch. HLL registers are max-mergeable,
    so the merged estimate is EXACTLY the estimate a single pass over
    the window's raw events would produce — pinned in pytest and
    mirrored in the oracle.

    Expects ``ts_col`` as long nanoseconds (gate._events contract).
    Returns (hour_epoch, n_nonempty, reg_checksum, est) per hour that
    has data, where the window is the trailing ``window_hours`` hours
    ending at (and including) that hour. est/n_nonempty/reg_checksum
    follow :func:`hll_distinct`'s determinism discipline."""
    hours_ns = 3_600_000_000_000
    hashed = ev.select(
        F.expr(f"{ts_col} div {hours_ns}").alias("hr"),
        h64(F.col(user_col).cast("string")).alias("h"),
    ).select(
        "hr",
        (F.col("h") % m).alias("b"),
        F.expr(f"h div {m}").alias("rem"),
    )
    rank = F.when(F.col("rem") == 0, F.lit(_HLL_REM_BITS + 1)).otherwise(
        F.lit(_HLL_REM_BITS) - F.length(F.bin(F.col("rem"))) + 1
    )
    regs = hashed.select("hr", "b", rank.alias("r")).groupBy("hr", "b").agg(
        F.max("r").alias("reg")
    )
    hours = regs.select("hr").distinct()
    fanned = regs.select(
        F.explode(
            F.sequence(F.col("hr"), F.col("hr") + (int(window_hours) - 1))
        ).alias("out_hr"),
        "b",
        "reg",
    ).join(F.broadcast(hours.select(F.col("hr").alias("out_hr"))), "out_hr", "left_semi")
    merged = fanned.groupBy("out_hr", "b").agg(F.max("reg").alias("reg"))
    agg = merged.groupBy("out_hr").agg(
        F.count(F.lit(1)).cast("long").alias("n_nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_ne"),
        F.sum((F.col("b") + 1) * F.col("reg")).cast("long").alias("reg_checksum"),
    )
    v_empty = F.lit(m) - F.col("n_nonempty")
    s = F.col("s_ne") + v_empty.cast("double")
    raw = F.lit(HLL_ALPHA * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty.cast("double")),
    ).otherwise(raw)
    return agg.select(
        (F.col("out_hr") * 3600).cast("long").alias("hour_epoch"),
        "n_nonempty",
        "reg_checksum",
        F.round(est, 6).alias("est"),
    )


def heavy_hitters(
    df: DataFrame,
    key_cols: tuple[str, ...],
    phi_num: int = 1,
    phi_den: int = 100,
    k: int = 100,
) -> DataFrame:
    """EXACT phi-fraction heavy hitters in two passes — the frequent-
    items primitive (top n-grams, hot users, mirror hosts) a corpus
    profiler runs where a plain groupBy's shuffle would move one row
    per DISTINCT key (at 100 TB of n-grams: trillions).

    Pass 1 — candidates: per-partition Misra–Gries summaries with ``k``
    counters via ``mapInPandas`` (state bounded at k entries per task,
    output ≤ k rows per partition — shuffle is k×partitions rows, not
    distinct-keys rows). The classic guarantee composes across
    partitions: if a key survives in NO partition summary, its count in
    every partition p is ≤ N_p/(k+1), so its global count is
    ≤ N/(k+1) — contrapositive: every key with count > N/(k+1) reaches
    the candidate set. With phi > 1/(k+1) the candidates are a strict
    superset of the true heavy hitters.

    Pass 2 — exact recount: broadcast the (≤ k × partitions)-row
    candidate set back over the stream as a semi-join, exact groupBy
    count of candidates only, filter ``n * phi_den >= phi_num * N``
    (pure integer arithmetic — no float threshold). The recount
    discards false candidates, so the output EQUALS the plain
    ``GROUP BY … HAVING count >= ceil(phi·N)`` — the DuckDB oracle —
    while never shuffling the distinct-key space.

    Returns (key_cols…, n, frac) with frac = round(n/N, 6).

    Raises ValueError unless (k+1)·phi_num > phi_den (the regime where
    the superset guarantee holds — below it, exactness would be lost
    silently)."""
    _check_hh_bound(phi_num, phi_den, k)
    cand = mg_candidates(df, key_cols, k)
    return hh_recount(df, cand, key_cols, phi_num, phi_den)


def _check_hh_bound(phi_num: int, phi_den: int, k: int) -> None:
    if (k + 1) * phi_num <= phi_den:
        raise ValueError(
            f"k={k} too small for phi={phi_num}/{phi_den}: the Misra-Gries "
            f"superset guarantee needs (k+1)*phi > 1 (k >= {phi_den // phi_num})"
        )


def _hh_keyed(df: DataFrame, key_cols: tuple[str, ...]) -> DataFrame:
    return df.select(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols]).alias(
            "_hhk"
        ),
        *key_cols,
    )


def mg_candidates(df: DataFrame, key_cols: tuple[str, ...], k: int) -> DataFrame:
    """Pass 1 of :func:`heavy_hitters`, exposed for the streaming twin:
    distinct per-partition Misra-Gries survivors as (key_cols…) rows —
    ≤ k per input partition. The guarantee composes across any
    concatenation of streams/partitions: a key absent from EVERY
    summary has count ≤ N_p/(k+1) in each part p, hence ≤ N/(k+1)
    globally — so unioning candidate sets over micro-batches keeps the
    superset property for the whole stream."""
    import pandas as pd

    keyed = _hh_keyed(df, key_cols)

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for key in pdf["_hhk"]:
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k:
                    counters[key] = 1
                else:
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame({"_hhk": list(counters.keys())})

    return (
        keyed.select("_hhk").mapInPandas(mg, "_hhk string").distinct()
    )


def hh_recount(
    df: DataFrame,
    cand: DataFrame,
    key_cols: tuple[str, ...],
    phi_num: int,
    phi_den: int,
) -> DataFrame:
    """Pass 2 of :func:`heavy_hitters`: broadcast the candidate keys
    (a ``_hhk`` column) over the full stream, exact-count candidates
    only, keep ``n·phi_den ≥ phi_num·N`` (integer threshold). Exact by
    construction given a candidate SUPERSET."""
    keyed = _hh_keyed(df, key_cols)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    counts = (
        keyed.join(F.broadcast(cand.select("_hhk").distinct()), "_hhk")
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n") * phi_den >= phi_num * F.col("_n"))
        .select(
            *key_cols,
            "n",
            F.round(F.col("n").cast("double") / F.col("_n"), 6).alias("frac"),
        )
    )
