"""Similarity search over embedding columns (``array<float>``).

Two paths, per the scale brief:
- ``cosine_topk``: brute-force cosine top-k — the exact baseline. The
  query set is broadcast (it is small by construction); each executor
  scores its slice of the corpus and a per-query top-k aggregate
  finishes it. Corpus is scanned once, no all-pairs shuffle.
- ``lsh_bucket_topk``: random-hyperplane LSH — deterministic ±1
  hyperplanes derived from the portable h64 hash, so the *same* buckets
  are computable in the DuckDB oracle. Candidates = corpus vectors
  sharing a bucket with the query; exact cosine re-rank inside buckets.
  At 100 TB this turns a full scan per query batch into a bucket-pruned
  probe (the bucket column is a partition/cluster key on disk).

The positional dot product uses an explicit join with a 64-row position
table (``element_at``) rather than ``F.aggregate`` lambda-fold so the
identical computation is expressible in DuckDB (list indexing + range
join). Cosine values are rounded to 6 decimals in outputs to absorb
last-ulp summation-order differences across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import h64


def _dims_df(spark, dim: int):
    return spark.range(dim).select(F.col("id").cast("int").alias("pos"))


def _unrolled(emb: DataFrame, dim: int, id_col: str = "vec_id") -> DataFrame:
    """(vec_id, pos, val, norm) in long form — one explode, carries the
    per-vector L2 norm alongside (computed once with aggregate)."""
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    return emb.select(
        F.col(id_col),
        norm.alias("norm"),
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select(id_col, "norm", "pos", F.col("val").cast("double").alias("val"))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).
    Returns (query_id, rank, neighbor_id, cosine). Broadcast the
    (tiny) query side; corpus side streams."""
    q = _unrolled(emb.filter(F.col("vec_id").isin(query_ids)), dim).select(
        F.col("vec_id").alias("query_id"),
        F.col("norm").alias("qnorm"),
        "pos",
        F.col("val").alias("qval"),
    )
    c = _unrolled(emb, dim)
    dots = (
        c.join(F.broadcast(q), "pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id", "qnorm", "norm")
        .agg(F.sum(F.col("val") * F.col("qval")).alias("dot"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("dot") / (F.col("qnorm") * F.col("norm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        dots.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cosine"))
    )


def embedding_near_dup(emb: DataFrame, dim: int = 64, min_cosine: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine ≥
    threshold). All-pairs via the positional join — exact; for web-scale
    corpora the LSH bucketing below prunes the candidate set first."""
    u = _unrolled(emb, dim)
    a = u.select(F.col("vec_id").alias("vec_a"), F.col("norm").alias("na"), "pos", F.col("val").alias("va"))
    b = u.select(F.col("vec_id").alias("vec_b"), F.col("norm").alias("nb"), "pos", F.col("val").alias("vb"))
    return (
        a.join(b, "pos")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b", "na", "nb")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
        .select(
            "vec_a",
            "vec_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def hyperplane_sign(pos_col, plane: int) -> F.Column:
    """Deterministic ±1 weight of dimension ``pos`` in hyperplane
    ``plane``: sign of bit 0 of h64('plane:pos'). Portable to DuckDB."""
    h = h64(F.concat_ws(":", F.lit(plane).cast("string"), pos_col.cast("string")))
    return (h.bitwiseAND(F.lit(1)) * 2 - 1).cast("double")


def lsh_buckets(emb: DataFrame, dim: int = 64, n_planes: int = 8) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit p = 1 iff
    dot(v, hyperplane_p) > 0. Returns (vec_id, bucket)."""
    u = _unrolled(emb, dim)
    # per-plane signed projection: sum val * sign(plane, pos)
    proj = (
        u.select("vec_id", "pos", "val", F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("plane"))
        .select(
            "vec_id",
            "plane",
            (
                F.col("val")
                * (
                    h64(F.concat_ws(":", F.col("plane").cast("string"), F.col("pos").cast("string")))
                    .bitwiseAND(F.lit(1))
                    * 2
                    - 1
                ).cast("double")
            ).alias("term"),
        )
        .groupBy("vec_id", "plane")
        .agg(F.sum("term").alias("proj"))
    )
    return proj.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("proj") > 0, F.shiftleft(F.lit(1).cast("long"), F.col("plane").cast("int"))).otherwise(0)
        ).alias("bucket")
    )


def lsh_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine re-rank within the bucket. Returns
    (query_id, rank, neighbor_id, cosine)."""
    buckets = lsh_buckets(emb, dim, n_planes)
    u = _unrolled(emb, dim).join(buckets, "vec_id")
    q = u.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("qbucket"),
        F.col("norm").alias("qnorm"),
        F.col("pos").alias("qpos"),
        F.col("val").alias("qval"),
    )
    cand = (
        u.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("pos") == F.col("qpos")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id", "qnorm", "norm")
        .agg(F.sum(F.col("val") * F.col("qval")).alias("dot"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("dot") / (F.col("qnorm") * F.col("norm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cosine"))
    )
