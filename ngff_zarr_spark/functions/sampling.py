"""Deterministic sampling / splitting operators for training-data
pipelines: hash-based train/val splits and stratified top-k sampling.

Randomness is the enemy of reproducible corpus builds, so both
operators derive their "randomness" from the portable ``h64`` content
hash (md5-based, identical in Spark and DuckDB): the same document gets
the same split/sample decision on every run, on every engine, at any
parallelism — and the DuckDB oracle is exact, not statistical.

100 TB posture: per-row hash expressions inside codegen (no shuffle for
the split; one window per stratum for the sample), and the split column
makes a fine partition key for downstream writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import h64

SPLIT_BUCKETS = 1_000_000


def hash_split(
    docs: DataFrame,
    val_frac: float = 0.1,
    test_frac: float = 0.0,
    salt: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val(/test) assignment: bucket =
    h64(salt:doc_id) mod 10^6; the first ``val_frac`` of bucket space is
    'val', the next ``test_frac`` is 'test', the rest 'train'. Changing
    ``salt`` re-rolls the split; changing the fractions GROWS a split
    monotonically (a doc in val at 5% is still in val at 10% — the
    property that keeps eval sets stable as they are enlarged).
    Adds a ``split`` column; no shuffle, no RNG state."""
    val_cut = int(val_frac * SPLIT_BUCKETS)
    test_cut = val_cut + int(test_frac * SPLIT_BUCKETS)
    bucket = h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % SPLIT_BUCKETS
    split = (
        F.when(bucket < val_cut, F.lit("val"))
        .when(bucket < test_cut, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return docs.withColumn("split", split)


def split_counts(docs: DataFrame, **kwargs) -> DataFrame:
    """Per-(split, lang) document counts — the sanity table every split
    job prints. Exact oracle twin via the same h64 arithmetic."""
    return (
        hash_split(docs, **kwargs)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "source",
    k: int = 5,
    salt: str = "sample",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified k-per-stratum sample: within each
    stratum keep the k docs with the SMALLEST h64(salt:doc_id) — a
    uniform-without-replacement sample that is stable across runs and
    engines (ties impossible: the hash is keyed by the unique id).

    r9: the same TWO-PHASE exact top-k as :func:`cap_per_source` (a
    single window per stratum was the hot-stratum hazard — one
    mega-source = one sort task): phase 1 ranks within
    (stratum, hash mod 64) and keeps k candidates per pre-bucket,
    phase 2 ranks the ≤ 64·k survivors. Identical result — the global
    k smallest hashes are each among their own pre-bucket's k
    smallest — so gates/oracles are unchanged."""
    hcol = h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w1 = Window.partitionBy(strata_col, F.pmod(hcol, F.lit(64))).orderBy(
        hcol.asc(), F.col(id_col).asc()
    )
    stage1 = (
        docs.withColumn("_prk", F.row_number().over(w1))
        .filter(F.col("_prk") <= k)
        .drop("_prk")
    )
    w2 = Window.partitionBy(strata_col).orderBy(hcol.asc(), F.col(id_col).asc())
    return (
        stage1.withColumn("sample_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def cap_per_source(
    docs: DataFrame,
    k: int = 2,
    salt: str = "cap",
    n_prebuckets: int = 64,
) -> DataFrame:
    """Per-domain frequency cap (the RefinedWeb/C4 'at most k documents
    per source' rule): keep the k docs with the SMALLEST deterministic
    hash per source — a stable lottery, not arrival order. Returns
    (doc_id, source, rk) for the kept docs, rk in 1..k.

    100 TB posture: a single window over ``source`` is the textbook
    skew hazard (one mega-domain = one hot sort partition), so this is
    the standard TWO-PHASE exact top-k: phase 1 ranks within
    (source, h64 mod n_prebuckets) — n_prebuckets-way parallel even
    inside one domain — and keeps k candidates per pre-bucket; phase 2
    ranks the ≤ n_prebuckets*k survivors per source. Both phases sort
    bounded partitions; the result is IDENTICAL to the naive single
    window (the global k smallest hashes per source are each among
    their own pre-bucket's k smallest), which is exactly what the
    DuckDB oracle computes."""
    hv = h64(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string")))
    base = docs.select("doc_id", "source", hv.alias("hv"))
    w1 = Window.partitionBy("source", F.col("hv") % n_prebuckets).orderBy(
        "hv", "doc_id"
    )
    stage1 = (
        base.withColumn("prk", F.row_number().over(w1))
        .filter(F.col("prk") <= k)
        .drop("prk")
    )
    w2 = Window.partitionBy("source").orderBy("hv", "doc_id")
    return (
        stage1.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


SHUFFLE_RANGE_BUCKETS = 1024


def seeded_shuffle(
    docs: DataFrame,
    seed: str = "shuffle",
    n_shards: int = 8,
    id_col: str = "doc_id",
    n_buckets: int = SHUFFLE_RANGE_BUCKETS,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data
    ordering: every row gets its EXACT global rank under the total
    order (h64(seed:id), id) and the shard that rank falls in with
    near-equal contiguous shards — the "shuffle then shard" step every
    epoch pipeline runs before writing training files. Same seed →
    same order on every run, engine, and parallelism; a new epoch is a
    new seed, not RNG state.

    Returns (<id_col>, rank, shard): rank is 0-based over the whole
    corpus, shard = those ranks cut into ``n_shards`` contiguous
    near-equal ranges (sizes differ by at most 1 — the exact cut is
    rank·n_shards div N, so a shard is reproducible from (rank, N)
    alone).

    100 TB posture — exact global rank WITHOUT a single-task global
    sort: the hash is uniform, so its top bits are a RANGE partition
    key. Phase 1 ranks inside each of ``n_buckets`` hash-range buckets
    (per-task sort is N/n_buckets expected, hash-uniform, no data-skew
    exposure because ties on (h64, id) are impossible); phase 2 turns
    local ranks global by adding the broadcast prefix-sum of bucket
    counts — the same two-phase skeleton as the engine's bucketed
    top-N/percentiles, applied to ordering. This is what
    ``row_number() OVER (ORDER BY hash)`` plans as ONE task at any
    scale; the oracle uses that single-window form verbatim."""
    hcol = h64(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    # h64 is 60-bit (15 hex chars); bucket by the top bits so bucket
    # order == hash-range order and ranks concatenate across buckets
    keyed = docs.select(id_col, hcol.alias("h")).select(
        id_col,
        "h",
        F.expr(f"h div {(1 << 60) // int(n_buckets)}").alias("b"),
    )
    w_local = Window.partitionBy("b").orderBy("h", id_col)
    ranked = keyed.withColumn(
        "lrk", F.row_number().over(w_local).cast("long") - 1
    )
    counts = keyed.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    # the prefix-sum windows run over the n_buckets-row COUNT SUMMARY,
    # never the data — bounded by construction. Partitioning by a
    # NON-FOLDABLE constant-zero (a plain lit(0) is folded away by the
    # optimizer) is semantically the empty partition spec (everything
    # in one group) but keeps WindowExec's "No Partition Defined"
    # warning out of the logs, so any future warning is a REAL
    # unbounded window, not this bounded summary.
    # self-subtraction: x*0 is folded away by the optimizer (which
    # would resurface the warning), x-x is not
    one_group = F.col("b") - F.col("b")
    w_off = (
        Window.partitionBy(one_group)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "b",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(
            Window.partitionBy(one_group).orderBy("b").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    return (
        ranked.join(F.broadcast(offs), "b")
        .select(
            id_col,
            (F.col("off") + F.col("lrk")).cast("long").alias("rank"),
            F.expr(f"((off + lrk) * {int(n_shards)}) div n_total")
            .cast("long")
            .alias("shard"),
        )
    )


def priority_scored(
    docs: DataFrame,
    strata_col: str = "source",
    weight_col: str = "n_chars",
    salt: str = "prio",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, stratum, weight, prio, pre): the per-item priority
    projection shared verbatim by the batch sampler and its streaming
    twin — q = w / ((h64(salt:id) + 1) / 2^60), all correctly-rounded
    IEEE (see priority_sample), plus the 64-way pre-bucket key."""
    hv = h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    u = (hv + F.lit(1)).cast("double") / F.lit(float(2**60))
    prio = F.col(weight_col).cast("double") / u
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("stratum"),
        F.col(weight_col).cast("long").alias("weight"),
        prio.alias("prio"),
        (hv % 64).alias("pre"),
    )


def priority_sample(
    docs: DataFrame,
    strata_col: str = "source",
    weight_col: str = "n_chars",
    k: int = 5,
    salt: str = "prio",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement, k per
    stratum — priority sampling (Duffield, Lund & Thorup 2005): each
    item gets priority q = w / u for a per-item uniform u, and the k
    LARGEST priorities are the sample, giving inclusion probability
    increasing in weight with a per-item Horvitz-Thompson estimate
    ``est_w = max(w, tau)`` (tau = the (k+1)-th priority; summing
    est_w over the sample estimates the stratum's total weight,
    unbiased). Strata with <= k items are taken whole with est_w = w
    (tau = 0) — exactly the DLT boundary case.

    Cross-engine exactness (why this is oracle-graded, not
    statistically tested): u = (h64(salt:id) + 1) / 2^60 — an exact
    power-of-two scaling of an integer in [1, 2^60] onto (0, 1] — and
    q = w / u. Int-to-double rounding, the exponent-only /2^60, and a
    single IEEE division are all correctly rounded in both engines, so
    every priority is bit-identical in Spark and DuckDB; no ln/pow
    (whose libm implementations differ in the last ulp) anywhere. The
    classic exponential-key formulation (Efraimidis-Spirakis u^(1/w))
    was rejected for exactly that reason.

    100 TB posture: the same TWO-PHASE exact top-k as cap_per_source —
    phase 1 ranks within (stratum, u mod 64) so one mega-stratum fans
    out 64 ways, phase 2 ranks the <= 64*(k+1) survivors; keeping k+1
    through both phases makes tau available without touching the full
    table again. Returns (doc_id, stratum, weight, sample_rank,
    est_w)."""
    base = priority_scored(docs, strata_col, weight_col, salt, id_col)
    w1 = Window.partitionBy("stratum", "pre").orderBy(
        F.col("prio").desc(), F.col("doc_id").asc()
    )
    stage1 = (
        base.withColumn("_prk", F.row_number().over(w1))
        .filter(F.col("_prk") <= k + 1)
        .drop("_prk", "pre")
    )
    w2 = Window.partitionBy("stratum").orderBy(
        F.col("prio").desc(), F.col("doc_id").asc()
    )
    ranked = stage1.withColumn("sample_rank", F.row_number().over(w2)).filter(
        F.col("sample_rank") <= k + 1
    )
    tau = F.max(F.when(F.col("sample_rank") == k + 1, F.col("prio"))).over(
        Window.partitionBy("stratum")
    )
    return (
        ranked.withColumn("tau", F.coalesce(tau, F.lit(0.0)))
        .filter(F.col("sample_rank") <= k)
        .select(
            "doc_id",
            "stratum",
            "weight",
            F.col("sample_rank").cast("long").alias("sample_rank"),
            F.round(
                F.greatest(F.col("weight").cast("double"), F.col("tau")), 6
            ).alias("est_w"),
        )
    )
