"""Similarity search over embedding columns (``array<float>``).

Five paths, per the scale brief (plus IVF's learned k-means quantizer
and the IVF+PQ composition):

- ``cosine_topk``: brute-force cosine top-k — the exact baseline. The
  query set is broadcast (small by construction); each executor scores
  its corpus slice with an ARRAY-NATIVE dot product (``zip_with`` +
  ``aggregate`` fold, JVM-side) — no positional explode, no join on a
  64-value key. One corpus scan, then a per-query top-k window.
- ``lsh_band_buckets`` / ``lsh_bucket_topk``: random-hyperplane LSH with
  banding. Hyperplane sign s(p, i) = ±1 is derived from the portable
  md5-based h64 hash of "p:i" — computed ONCE at plan-build time in
  Python and embedded as literal ±1 arrays (the DuckDB oracle recomputes
  the same signs symbolically with SQL md5; md5 is md5 in both engines).
  Bucketing is pure per-row expression work — zero shuffle until the
  (band, bucket) equi-join, whose cost is collision-bounded.
- ``embedding_near_dup``: LSH-banded candidate pairs + exact cosine
  re-rank — the production near-dup path. The all-pairs form
  (``embedding_near_dup_allpairs``) is retained ONLY as a small-scale
  test oracle; it must never appear in a gate or bench plan (it is an
  O(n²·dim) scale-killer).
- ``ivf_topk`` (+ ``kmeans_centroids`` learned quantizer,
  ``write_ivf_partitioned``/``ivf_topk_partitioned`` physical layout):
  data-derived cells as the READ-pruning knob — a probe touches
  n_probe/n_cells of the corpus.
- ``pq_topk`` / ``ivfpq_topk`` / ``ivfpq_residual_topk``: product
  quantization as the MEMORY knob — m-byte codes + per-query integer
  ADC lookup tables (learned via :func:`pq_codebooks_learned`,
  residual-encoded in the FAISS-proper variant); composed with IVF
  this is the canonical billion-scale serving layout. Multi-probe
  (``lsh_bucket_topk(multiprobe=True)``) is the LSH-side recall knob.

Cosine values are rounded to 6 decimals in outputs AND rank ordering so
last-ulp summation-order differences across engines cannot flip ranks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import DEFAULT_MAX_BUCKET, _capped_band_pairs

N_BANDS = 8         # LSH bands
BAND_PLANES = 8     # hyperplanes per band → 2^8 buckets per band
# Bucket count per band is 2^BAND_PLANES — THE scale knob: buckets must
# grow with corpus size or intra-bucket candidate sets go quadratic.
# 8 planes (256 buckets) suits the 10^3-10^5 test corpora; a 10^9-vector
# production corpus wants 16-20 planes per band (65k-1M buckets) plus
# multi-probe on the query side to recover recall. Since r03 the knob
# has a COMPUTED default: pass band_planes=None to the candidate-path
# entry points and :func:`auto_band_planes` sizes it from the corpus
# count (kept explicit in the gates so the oracle twin stays pinned).
_TARGET_BUCKET_OCCUPANCY = 32  # expected vectors per bucket at auto size



def _topk_per_query(scored, k, score_col, prebuckets=64):
    """Two-phase exact top-k per query (the engine's standard
    hot-partition guard, same skeleton as cap_per_source): a single
    row_number window keyed on query_id alone sorts the query's ENTIRE
    candidate set in one task — corpus-sized for the brute/PQ scorers.
    Phase 1 ranks within (query_id, neighbor_id mod prebuckets) and
    keeps k per pre-bucket; phase 2 ranks the <= prebuckets*k
    survivors. Identical to the single window under the total order
    (score desc, neighbor_id asc): every global top-k row is in its
    own pre-bucket's top-k."""
    order = [F.col(score_col).desc(), F.col("neighbor_id").asc()]
    # murmur-hash the id for the pre-bucket key: plain id mod 64
    # collapses to one bucket when ids stride by a multiple of 64
    # (sharded id generators do), recreating the hot partition
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.hash("neighbor_id"), F.lit(prebuckets))
    ).orderBy(*order)
    stage1 = (
        scored.withColumn("_prk", F.row_number().over(w1))
        .filter(F.col("_prk") <= k)
        .drop("_prk")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        stage1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", score_col)
    )


def auto_band_planes(
    n_vectors: int,
    target_occupancy: int = _TARGET_BUCKET_OCCUPANCY,
    min_planes: int = BAND_PLANES,
    max_planes: int = 24,
) -> int:
    """Computed default for the bucket-count knob: the smallest
    ``band_planes`` whose 2^planes buckets keep expected occupancy at
    ``target_occupancy`` (planes = ceil(log2(n / target))), clamped to
    [min_planes, max_planes]. Expected intra-bucket join work is then
    n·target per band instead of n²/2^planes with a stale constant:
    10^9 vectors → 2^25/32 → clamped 24 planes (16M buckets/band)."""
    import math

    if n_vectors <= 0:
        return min_planes
    planes = math.ceil(math.log2(max(1.0, n_vectors / float(target_occupancy))))
    return max(min_planes, min(max_planes, planes))


def h64_py(s: str) -> int:
    """Python twin of functions.text.h64 (15-hex-char md5 prefix)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def hyperplane_signs(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 weights of hyperplane ``plane``: sign of bit 0
    of h64('plane:pos'). Same values the oracle derives with SQL md5."""
    return [float((h64_py(f"{plane}:{pos}") & 1) * 2 - 1) for pos in range(dim)]


def _norm(col=None):
    col = col if col is not None else F.col("embedding")
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def _dot(a, b):
    """Array-native dot product: zip_with product + aggregate fold —
    stays in whole-stage codegen, no explode, no join."""
    return F.aggregate(
        F.zip_with(a, b, lambda u, w: u.cast("double") * w.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _signed_projection(emb_col, plane: int, dim: int):
    """dot(v, hyperplane_plane) against the literal ±1 sign vector."""
    signs = F.array(*[F.lit(s) for s in hyperplane_signs(plane, dim)])
    return _dot(emb_col, signs)


def _band_buckets_udf(dim: int, n_bands: int, band_planes: int):
    """Arrow-vectorized bucket computation: all n_bands*band_planes
    hyperplane projections for a batch of vectors in one numpy pass
    (position-sequential accumulation — the same left-to-right order as
    the SQL SUM / Spark aggregate fold, so float results agree with the
    oracle to the last ulp in practice). The per-element higher-order-
    function form costs ~4k interpreted lambda calls per row; this is
    the vectorized production path."""
    from pyspark.sql.functions import pandas_udf

    n_planes = n_bands * band_planes
    S = np.array(
        [hyperplane_signs(p, dim) for p in range(n_planes)], dtype=np.float64
    )  # (planes, dim)

    @pandas_udf("array<long>")
    def buckets(emb: pd.Series) -> pd.Series:
        E = np.array(list(emb.values), dtype=np.float64)  # (n, dim)
        n = E.shape[0]
        proj = np.zeros((n, n_planes), dtype=np.float64)
        for i in range(dim):  # sequential per-position accumulation
            proj += E[:, i : i + 1] * S[None, :, i][0]
        bits = proj > 0
        bu = np.zeros((n, n_bands), dtype=np.int64)
        for b in range(n_bands):
            for p in range(band_planes):
                bu[:, b] += bits[:, b * band_planes + p].astype(np.int64) << p
        return pd.Series(list(bu))

    return buckets


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).
    Returns (query_id, rank, neighbor_id, cosine). Broadcast-nested-loop
    against the tiny query side; corpus side streams once."""
    from .text import spread

    e = spread(emb).select("vec_id", "embedding", _norm().alias("norm"))
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("norm").alias("qnorm"),
    )
    dots = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("embedding"), F.col("qemb")) / (F.col("qnorm") * F.col("norm")), 6
            ).alias("cosine"),
        )
    )
    return _topk_per_query(dots, k, "cosine")


# Fixed free-vector eval queries for the ANN serving-path gate: every
# component is an exact eighth (n/8), so the float64 value and its
# decimal SQL literal are bit-identical across engines. The gate and
# the DuckDB oracle both read THIS list (single source of truth).
ANN_EVAL_QUERIES = [
    (q, [(((q * 37 + j * 11) % 17) - 8) / 8.0 for j in range(64)])
    for q in range(4)
]


def cosine_query_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Free-vector ANN serving path — the embedding twin of the
    free-text BM25 query form: score literal (query_id, vector) pairs
    against the corpus without requiring the query to BE a corpus row
    (no self-exclusion — the query is external). Returns
    (query_id, rank, neighbor_id, cosine), 6dp-rounded, two-phase
    top-k.

    Plan shape: the request-sized query set broadcasts onto one
    streaming pass over the corpus (broadcast-nested-loop, same shape
    as cosine_topk's doc-as-query form); norms and dots are array-
    native folds inside whole-stage codegen."""
    from .text import spread

    spark = emb.sparkSession
    e = spread(emb).select("vec_id", "embedding", _norm().alias("norm"))
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "query_id long, qemb array<double>",
    )
    q = qdf.select(
        "query_id", "qemb", _norm(F.col("qemb")).alias("qnorm")
    )
    dots = e.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("embedding"), F.col("qemb"))
            / (F.col("qnorm") * F.col("norm")),
            6,
        ).alias("cosine"),
    )
    return _topk_per_query(dots, k, "cosine")


def lsh_band_buckets(
    emb: DataFrame,
    dim: int = 64,
    n_bands: int = N_BANDS,
    band_planes: int = BAND_PLANES,
    spread_input: bool = True,
) -> DataFrame:
    """(vec_id, band, bucket): band b's bucket is the sign pattern of
    ``band_planes`` hyperplane projections (global plane index =
    b*band_planes + p). One Arrow-vectorized pass computes every band's
    bucket; posexplode yields n_bands small rows per vector.

    ``spread_input=False`` skips the parallelism guard — right for
    already-tiny inputs (e.g. a filtered query set), where a repartition
    to core count costs more than the whole UDF pass."""
    from .text import spread

    src = spread(emb) if spread_input else emb
    udf = _band_buckets_udf(dim, n_bands, band_planes)
    return (
        src
        .select("vec_id", F.posexplode(udf(F.col("embedding"))).alias("band", "bucket"))
        .select("vec_id", F.col("band").cast("long"), "bucket")
    )


def lsh_buckets(emb: DataFrame, dim: int = 64, n_planes: int = 8) -> DataFrame:
    """Single-table hyperplane LSH bucket per vector (vec_id, bucket) —
    the disk-layout/cluster-key variant (bucket = partition key). For
    candidate generation prefer the banded form (recall)."""
    udf = _band_buckets_udf(dim, n_bands=1, band_planes=n_planes)
    return emb.select("vec_id", udf(F.col("embedding"))[0].alias("bucket"))


def lsh_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
    n_bands: int = N_BANDS,
    band_planes: int | None = BAND_PLANES,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 LSH band bucket with the
    query; exact cosine re-rank on the candidate set. Returns
    (query_id, rank, neighbor_id, cosine). At scale the (band, bucket)
    join replaces the full corpus scan per query batch.

    ``band_planes=None`` → sized by :func:`auto_band_planes` from the
    corpus count (one metadata-cheap count job at plan-build time).

    ``multiprobe=True`` additionally probes every Hamming-1 neighbor
    bucket (one hyperplane bit flipped) on the QUERY side — the
    standard recall knob that trades (1 + band_planes)× more tiny
    probe rows for recall WITHOUT growing bands or shrinking buckets
    (Lv et al., "Multi-Probe LSH", VLDB 2007 — public method). Only
    the broadcast query side expands; the corpus is bucketed once
    either way."""
    from .text import spread

    if band_planes is None:
        band_planes = auto_band_planes(emb.count())

    e = spread(emb).select("vec_id", "embedding", _norm().alias("norm"))
    bands = lsh_band_buckets(emb, dim, n_bands, band_planes)
    # query buckets from a PRE-FILTERED scan (vec_id IN (...) pushes
    # into the parquet read): the bucket UDF runs over |query_ids| rows,
    # not a second full-corpus pass
    qemb = emb.filter(F.col("vec_id").isin(query_ids))
    qb = lsh_band_buckets(qemb, dim, n_bands, band_planes, spread_input=False).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    if multiprobe:
        flips = F.array(*[F.lit(1 << p) for p in range(band_planes)])
        flipped = qb.select(
            "query_id", "band", F.explode(flips).alias("m"), "bucket"
        ).select(
            "query_id", "band",
            F.col("bucket").bitwiseXOR(F.col("m")).alias("bucket"),
        )
        qb = qb.unionByName(flipped).distinct()
    cand_ids = (
        bands.join(F.broadcast(qb), ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    q = qemb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        _norm().alias("qnorm"),
    )
    scored = (
        cand_ids.join(e, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("embedding"), F.col("qemb")) / (F.col("qnorm") * F.col("norm")), 6
            ).alias("cosine"),
        )
    )
    return _topk_per_query(scored, k, "cosine")


def _centroids(emb: DataFrame, n_cells: int):
    """Deterministic coarse-quantizer centroids: the n_cells lowest-id
    vectors (collected once at plan time — n_cells rows) plus their
    norms computed with the SAME sequential left-to-right accumulation
    the SQL twin uses (dim=64 < numpy's pairwise-summation threshold of
    128, so np.add.reduce is sequential)."""
    rows = emb.filter(F.col("vec_id") < n_cells).select("vec_id", "embedding").collect()
    if {r.vec_id for r in rows} != set(range(n_cells)):
        # fail HERE with the contract, not three calls later: an
        # undersized C either crashes numpy with an off-topic AxisError
        # (zero seed rows) or silently shrinks the quantizer and then
        # IndexErrors in write_ivf_partitioned's centroid table
        # (r18 similarity review)
        raise ValueError(
            f"seed quantizer rule requires vec_ids 0..{n_cells - 1} present "
            f"in the corpus (found {len(rows)} of {n_cells}); re-id the "
            "corpus or pass pre-trained centroids/codebooks"
        )
    C = np.array(
        [r.embedding for r in sorted(rows, key=lambda r: r.vec_id)], dtype=np.float64
    )
    Cn = np.sqrt(np.add.reduce(C * C, axis=1))
    return C, Cn


def kmeans_centroids(
    emb: DataFrame,
    dim: int = 64,
    n_cells: int = 16,
    n_iters: int = 2,
    round_decimals: int = 9,
) -> tuple[np.ndarray, np.ndarray]:
    """Distributed Lloyd k-means for the IVF coarse quantizer —
    replaces the lowest-id stand-in with learned centroids while
    keeping every step deterministic and oracle-reproducible.

    Per iteration (all distributed, nothing driver-side but the
    n_cells × dim centroid matrix itself):

    1. assign: one Arrow map pass scores every vector against the
       current centroids (rounded cosine argmax, ties → lowest cell) —
       no shuffle;
    2. re-center: ONE hash aggregate computes per-cell per-component
       sums with map-side combine — a shuffle of n_cells × (dim+1)
       values total. Components are quantized to integers first
       (``CAST(round(v·10⁹) AS BIGINT)``) so the sums are EXACT and
       order-independent — that is what makes the learned centroids
       bit-reproducible by the DuckDB oracle (double sums would drift
       by summation order across engines/partitions, and decimal casts
       of floats differ by engine string-repr rules). New component =
       sum / (count·10⁹), one deterministic IEEE division; empty cells
       keep their previous centroid.

    Init is the deterministic seed the stand-in used (the n_cells
    lowest-id vectors), so ``n_iters=0`` degrades to :func:`_centroids`
    exactly. Fixed small ``n_iters`` is the production shape too:
    k-means for IVF is run to a handful of iterations, not to
    convergence (FAISS default niter=10 at a 256k training sample).

    100 TB posture: per iteration one scan + one tiny aggregate; the
    centroid matrix (n_cells × dim doubles) is the only driver state.
    Returns (C, Cn) like :func:`_centroids`."""
    from pyspark.sql.functions import pandas_udf

    from .text import spread

    C, Cn = _centroids(emb, n_cells)
    if n_iters <= 0:
        return C, Cn
    # each Lloyd iteration is its own job (the re-centering collect), so
    # exchange reuse can't help across them — persist the spread input
    # once (MEMORY_AND_DISK: spills, never OOMs at corpus scale) and
    # drop it before returning; only numpy centroids escape this scope
    from pyspark import StorageLevel

    e = (
        spread(emb)
        .select("embedding")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        for _ in range(n_iters):
            C_cur, Cn_cur = C, Cn

            @pandas_udf("long")
            def cell_of(col: pd.Series) -> pd.Series:
                dots = _cell_dots(col, C_cur, Cn_cur)
                return pd.Series(np.argmax(dots, axis=1).astype(np.int64))

            scale = float(10 ** round_decimals)
            # (cell, pos) LONG aggregate instead of `dim` separate sum
            # columns: the aggregate schema stays 4 columns whatever the
            # embedding dim (a dim-1024 model would otherwise plan a
            # 1025-column hash aggregate — VERDICT r8 watch item). Same
            # integer quantization, so the long sums stay exact and
            # order-independent; shuffle volume is identical
            # (n_cells x dim values either way) and map-side combine
            # still applies to the (cell, pos) keys.
            sums = (
                e.select(cell_of(F.col("embedding")).alias("cell"), "embedding")
                .select(
                    "cell",
                    F.posexplode(
                        F.transform(
                            "embedding",
                            lambda v: F.round(v.cast("double") * F.lit(scale)).cast(
                                "long"
                            ),
                        )
                    ).alias("pos", "q"),
                )
                .groupBy("cell", "pos")
                .agg(F.count("*").alias("n"), F.sum("q").alias("s"))
                .collect()
            )
            C = C.copy()
            for row in sums:
                C[int(row["cell"]), int(row["pos"])] = int(row["s"]) / (
                    int(row["n"]) * scale
                )
            Cn = np.sqrt(np.add.reduce(C * C, axis=1))
    finally:
        # unpersist even when a collect fails mid-iteration, or the
        # MEMORY_AND_DISK blocks leak for the rest of the session
        e.unpersist()
    return C, Cn


def _cell_dots(e, C: np.ndarray, Cn: np.ndarray) -> np.ndarray:
    """Rounded cosine-to-centroid matrix for a batch: sequential
    per-position accumulation (matches SQL SUM order), divide by the
    centroid norm, round to 6 decimals. |v| is constant per row so it
    never affects the argmax/probe ORDER and is omitted — identical on
    the oracle side."""
    E = np.array(list(e.values), dtype=np.float64)
    n, dim = E.shape
    proj = np.zeros((n, C.shape[0]), dtype=np.float64)
    for i in range(dim):
        proj += E[:, i : i + 1] * C[None, :, i][0]
    return np.round(proj / Cn[None, :], 6)


def ivf_cells(
    emb: DataFrame,
    dim: int = 64,
    n_cells: int = 16,
    kmeans_iters: int = 0,
    centroids: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """IVF coarse quantization: (vec_id, cell) — assign every vector to
    its nearest centroid by cosine. ``kmeans_iters=0`` uses the
    deterministic seed centroids (the n_cells lowest-id vectors);
    ``kmeans_iters>0`` runs that many distributed Lloyd iterations
    first (:func:`kmeans_centroids` — exact-decimal re-centering, so
    the learned centroids stay oracle-reproducible). Callers that
    already hold a (C, Cn) pair pass it via ``centroids`` to skip
    recomputation.

    One Arrow-vectorized pass computes all n_cells dots per batch
    (numpy matmul); dots are rounded to 6 decimals and ties break to
    the lowest cell so the DuckDB twin sorts identically. Scale: cell
    count ~ sqrt(n) keeps cells ~sqrt(n) wide; the assignment pass is a
    single map stage (no shuffle)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .text import spread

    C, Cn = (
        centroids
        if centroids is not None
        else kmeans_centroids(emb, dim, n_cells, kmeans_iters)
    )

    @pandas_udf("long")
    def cell_of(e: pd.Series) -> pd.Series:
        dots = _cell_dots(e, C, Cn)
        return pd.Series(np.argmax(dots, axis=1).astype(np.int64))

    return spread(emb).select("vec_id", cell_of(F.col("embedding")).alias("cell"))


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
    n_cells: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 0,
    centroids: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: probe the ``n_probe`` nearest cells
    per query, exact-cosine re-rank only the vectors in those cells.
    Returns (query_id, rank, neighbor_id, cosine).

    The scale path next to LSH (`lsh_bucket_topk`): where LSH buckets
    by random hyperplanes, IVF partitions by data-derived centroids —
    at 10^9 vectors an IVF list is also the natural PHYSICAL partition
    (write the corpus bucketed by cell and a probe reads n_probe/n_cells
    of the data; the cell column is the partition key). Probe factor
    n_probe/n_cells is the recall/cost knob. ``kmeans_iters`` selects
    the quantizer: 0 = deterministic seed centroids, >0 = that many
    Lloyd iterations (:func:`kmeans_centroids`). A pre-trained
    quantizer passes ``centroids=(C, Cn)`` and skips training entirely
    — the production serving shape, where the quantizer is a build-time
    artifact amortized over every query, not retrained per query."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .text import spread

    C, Cn = (
        centroids
        if centroids is not None
        else kmeans_centroids(emb, dim, n_cells, kmeans_iters)
    )

    @pandas_udf("array<long>")
    def probe_cells(e: pd.Series) -> pd.Series:
        dots = _cell_dots(e, C, Cn)
        # order by (dot desc, cell asc): stable argsort on -dot
        order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int64)))

    cells = ivf_cells(emb, dim, n_cells, centroids=(C, Cn))
    e = spread(emb).select("vec_id", "embedding", _norm().alias("norm"))
    qemb = emb.filter(F.col("vec_id").isin(query_ids))
    qprobe = qemb.select(
        F.col("vec_id").alias("query_id"),
        F.explode(probe_cells(F.col("embedding"))).alias("cell"),
    )
    cand_ids = (
        cells.join(F.broadcast(qprobe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    q = qemb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        _norm().alias("qnorm"),
    )
    scored = (
        cand_ids.join(e, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("embedding"), F.col("qemb")) / (F.col("qnorm") * F.col("norm")), 6
            ).alias("cosine"),
        )
    )
    return _topk_per_query(scored, k, "cosine")


def write_ivf_partitioned(
    emb: DataFrame,
    path: str,
    dim: int = 64,
    n_cells: int = 16,
    kmeans_iters: int = 0,
) -> None:
    """Materialize the corpus PHYSICALLY partitioned by IVF cell
    (``cell=N/`` parquet directories) plus a ``_centroids`` side table.
    This is the 10⁹-vector layout: a probe becomes PARTITION PRUNING —
    the scan itself reads only ``n_probe/n_cells`` of the data, no
    filter evaluation over the rest (see ivf_topk_partitioned).
    ``kmeans_iters>0`` learns the quantizer with that many distributed
    Lloyd iterations before bucketing; the probe path is unchanged
    because it reads whatever centroids this wrote.

    Hot-cell posture: an unbalanced quantizer makes one ``cell=N/``
    directory large, but that directory still holds MANY parquet files
    (one per writing task — ``partitionBy`` doesn't coalesce), so a
    probe of a hot cell reads its files in parallel; occupancy affects
    probe COST (∝ cell size), never per-task memory. Monitor balance
    with ``corpus_kmeans_profile`` (per-cell counts); the remedies are
    more ``kmeans_iters`` or a larger ``n_cells``, both of which this
    writer already parameterizes."""
    spark = emb.sparkSession
    C, Cn = kmeans_centroids(emb, dim, n_cells, kmeans_iters)
    cells = ivf_cells(emb, dim, n_cells, centroids=(C, Cn))
    (
        emb.join(cells, "vec_id")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )
    (
        spark.createDataFrame(
            [(i, [float(v) for v in C[i]]) for i in range(n_cells)],
            "vec_id long, embedding array<double>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}_centroids")
    )


def ivf_cells_balanced(
    emb: DataFrame,
    dim: int = 64,
    n_cells: int = 16,
    cap: int = 4096,
    prebuckets: int = 64,
    kmeans_iters: int = 0,
    centroids: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """Capacity-bounded IVF quantization (VERDICT r9 ask #6 — the IVF
    analog of the r9 skew work): (vec_id, cell, subcell) where every
    (cell, subcell) inverted list holds AT MOST ``cap`` vectors, as a
    hard guarantee rather than a k-means balance hope.

    Classic balanced k-means bounds list size by constraining the
    ASSIGNMENT (min-cost-flow / penalty terms) — it trades recall for
    balance, doesn't distribute well, and still admits adversarial
    corpora (``cap`` duplicates of one direction defeat any centroid
    placement). Instead the cell assignment stays the plain
    nearest-centroid argmax (identical to :func:`ivf_cells`, so probing
    ALL subcells of a probed cell yields the EXACT same candidate set —
    recall is preserved by construction, pytest-pinned), and each cell
    is rank-split: subcell = global_rank_within_cell // cap.

    The rank uses the engine's standard two-phase hot-partition guard
    (same skeleton as ``_topk_per_query``/cap_per_source): phase 1
    ranks within (cell, h64(vec_id) mod prebuckets) — per-task sort
    state is hot_cell/prebuckets, never hot_cell — and a prefix sum
    over the tiny (cell, prebucket) count table turns local ranks into
    global ranks. The order (h64(vec_id) mod P, vec_id) is total, and
    the h64 is the portable md5 derivation
    (``conv(substr(md5(id),1,15),16,10)``), so a DuckDB oracle computes
    the identical subcell for every vector (gate ann_ivf_balanced).

    100 TB posture: one window bounded by cap·E[bucket], one count
    aggregate, one broadcast join of n_cells x prebuckets offsets. The
    physical layout twin is :func:`write_ivf_partitioned_balanced`."""
    cells = ivf_cells(emb, dim, n_cells, kmeans_iters, centroids)
    pb = F.pmod(
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(prebuckets),
    )
    w_local = Window.partitionBy("cell", "pb").orderBy("vec_id")
    ranked = (
        cells.withColumn("pb", pb)
        .withColumn("lrk", F.row_number().over(w_local).cast("long") - 1)
    )
    counts = ranked.groupBy("cell", "pb").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("cell").orderBy("pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "cell", "pb", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    return ranked.join(F.broadcast(offs), ["cell", "pb"]).select(
        "vec_id",
        "cell",
        F.expr(f"(off + lrk) div {int(cap)}").cast("long").alias("subcell"),
    )


def write_ivf_partitioned_balanced(
    emb: DataFrame,
    path: str,
    dim: int = 64,
    n_cells: int = 16,
    cap: int = 4096,
    kmeans_iters: int = 0,
) -> None:
    """:func:`write_ivf_partitioned` with the capacity-bounded
    quantizer: the corpus lands in ``cell=N/subcell=M/`` directories of
    AT MOST ``cap`` vectors each, so a hot cell becomes many bounded
    partitions at BUILD time instead of one outsized probe-time scan
    unit. :func:`ivf_topk_partitioned` reads this layout unchanged —
    its ``cell IN probed`` filter prunes on the outer directory level
    and every subcell under a probed cell is read (in parallel, one
    bounded split each), so results are identical to the unbalanced
    layout (pytest-pinned)."""
    spark = emb.sparkSession
    C, Cn = kmeans_centroids(emb, dim, n_cells, kmeans_iters)
    bal = ivf_cells_balanced(
        emb, dim, n_cells, cap=cap, centroids=(C, Cn)
    )
    (
        emb.join(bal, "vec_id")
        .write.partitionBy("cell", "subcell")
        .mode("overwrite")
        .parquet(path)
    )
    (
        spark.createDataFrame(
            [(i, [float(v) for v in C[i]]) for i in range(n_cells)],
            "vec_id long, embedding array<double>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}_centroids")
    )


def semantic_dedup(
    emb: DataFrame,
    dim: int = 64,
    n_cells: int = 16,
    cap: int = 4096,
    tau: float = 0.999,
    prebuckets: int = 64,
    kmeans_iters: int = 0,
    centroids: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """SemDeDup-style embedding-level deduplication (Abbas et al. 2023:
    cluster the corpus, drop within-cluster semantic duplicates):
    returns (vec_id, keep, dup_of) where a vector is DROPPED iff a
    lower-id vector in its quantizer list has rounded cosine ≥ tau;
    ``dup_of`` is the lowest such witness (NULL for kept rows).

    The single-pass lowest-id rule is the scalable standard — it needs
    no iteration and is order-deterministic; transitive-closure
    grouping is :func:`~..dedup.duplicate_clusters` territory (text
    path), and near-dup PAIR mining across clusters is
    :func:`embedding_near_dup` (banded LSH).

    100 TB posture: candidate pairs come from a self-join keyed on the
    CAPACITY-BOUNDED (cell, subcell) lists of
    :func:`ivf_cells_balanced` — co-partitioned shuffle, per-task pair
    work ≤ cap², never |cluster|² (SemDeDup's own clusters are
    unbounded: one boilerplate direction produces a quadratic cluster;
    the cap makes the adversarial case linear in list count). The
    trade, as with any bucketed candidate generator, is that
    duplicates split across subcells of one cell keep one
    representative PER SUBCELL — at most ceil(occ/cap) survivors of a
    pathological identical-direction cluster instead of 1 (gate
    semantic_dedup pins exactly this shape; the DuckDB oracle
    recomputes the identical lists, pairs, and verdicts)."""
    # bal feeds THREE consumers (both self-join sides via e, plus the
    # final keep-list join) and is itself the whole quantizer pipeline;
    # e feeds both self-join sides. Call-scoped persists plan each
    # once — unpersisted, the lazy plan re-derives the quantizer per
    # reference (32 documents scans / 68 Exchanges measured in
    # plans/r19/semantic_dedup_before.txt). Caches released via
    # checkpointed() on return (r19, guide §2.4/§5).
    bal = ivf_cells_balanced(
        emb, dim, n_cells, cap=cap, prebuckets=prebuckets,
        kmeans_iters=kmeans_iters, centroids=centroids,
    ).persist()
    from .text import spread

    e = (
        spread(emb).select("vec_id", "embedding", _norm().alias("norm"))
        .join(bal, "vec_id")
        # explicit exchange on the list key: co-partitions the
        # self-join below AND materializes the UDF-derived cell ids so
        # Catalyst's project-collapse cannot inline the Python UDF
        # into the join condition (ExtractPythonUDFFromJoinCondition
        # would demote that to a cross join + filter — quadratic)
        .repartition("cell", "subcell")
        .persist()
    )
    a = e.select(
        F.col("cell"), F.col("subcell"),
        F.col("vec_id").alias("u"), F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
    )
    b = e.select(
        F.col("cell"), F.col("subcell"),
        F.col("vec_id").alias("v"), F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
    )
    pairs = (
        a.join(b, ["cell", "subcell"])
        .filter(F.col("u") < F.col("v"))
        .select(
            "v",
            "u",
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos"),
        )
    )
    dropped = (
        pairs.filter(F.col("cos") >= float(tau))
        .groupBy("v")
        .agg(F.min("u").alias("dup_of"))
    )
    # dup_of uses a -1 sentinel (not NULL) for kept rows: the driver's
    # value-hash canonicalizer sorts mixed tuples and NULL longs break
    # cross-engine ordering
    from ._scope import checkpointed

    return checkpointed(
        bal.select("vec_id")
        .join(dropped.withColumnRenamed("v", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.col("dup_of").isNull().alias("keep"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long").alias("dup_of"),
        ),
        bal,
        e,
    )


def ann_recall_eval(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
    n_cells: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 0,
) -> DataFrame:
    """Measured recall@k of the IVF index against exact brute force —
    the standard ANN quality harness, as ONE Spark job: (query_id,
    n_hit, recall) where n_hit counts exact-top-k neighbors the probe
    returned and recall = n_hit / k.

    Turns 'recall preserved' claims into a per-query measured number
    (gate ann_recall_eval re-derives both result sets AND the overlap
    in SQL). Ranks compare by neighbor SET, not order, so last-ulp
    cosine ties cannot flip the metric. Scale: both sides are the
    existing two-phase top-k plans; the overlap is an id-keyed
    left-semi join plus one count aggregate."""
    exact = cosine_topk(emb, query_ids, k=k, dim=dim).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk(
        emb, query_ids, k=k, dim=dim, n_cells=n_cells, n_probe=n_probe,
        kmeans_iters=kmeans_iters,
    ).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(int(k)), 6
            ).alias("recall"),
        )
    )


def ivf_topk_partitioned(
    spark,
    path: str,
    query_ids: list[int],
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """IVF top-k over the partitioned layout: probe cells are computed
    driver-side from the tiny centroid table, and the corpus scan is
    ``filter(cell IN probed)`` — Catalyst turns that into partition
    pruning (the plan's PartitionFilters; pytest-pinned), so only the
    probed directories are ever read. Results are identical to
    :func:`ivf_topk` on the same corpus."""
    cent_rows = spark.read.parquet(f"{path}_centroids").collect()
    C = np.array(
        [r.embedding for r in sorted(cent_rows, key=lambda r: r.vec_id)], dtype=np.float64
    )
    Cn = np.sqrt(np.add.reduce(C * C, axis=1))

    corpus_all = spark.read.parquet(path)
    qrows = (
        corpus_all.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    if not qrows:
        # no query id matched the corpus: empty result, stable schema
        # (np broadcasting below would crash on a 0-row embedding matrix)
        return spark.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, cosine double"
        )
    import pandas as pd

    dots = _cell_dots(pd.Series([r.embedding for r in qrows]), C, Cn)
    order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probe]
    probe_pairs = [
        (int(r.vec_id), int(c)) for r, cells in zip(qrows, order) for c in cells
    ]
    probed = sorted({c for _, c in probe_pairs})

    corpus = corpus_all.filter(F.col("cell").isin(probed))
    e = corpus.select("vec_id", "cell", "embedding", _norm().alias("norm"))
    qb = spark.createDataFrame(probe_pairs, "query_id long, cell long")
    cand_ids = (
        e.join(F.broadcast(qb), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    q = spark.createDataFrame(
        [(int(r.vec_id), list(r.embedding)) for r in qrows],
        "query_id long, qemb array<double>",
    ).select("query_id", "qemb", _norm(F.col("qemb")).alias("qnorm"))
    scored = (
        cand_ids.join(e, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("embedding"), F.col("qemb")) / (F.col("qnorm") * F.col("norm")), 6
            ).alias("cosine"),
        )
    )
    return _topk_per_query(scored, k, "cosine")


def embedding_near_dup(
    emb: DataFrame,
    dim: int = 64,
    min_cosine: float = 0.9,
    n_bands: int = N_BANDS,
    band_planes: int | None = BAND_PLANES,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine ≥
    threshold) — LSH-banded candidates + exact re-rank. Only pairs that
    collide in ≥1 band are ever scored, so the worst case is bounded by
    bucket collision counts, not n². (Recall is the standard LSH
    trade-off: a pair at exactly the threshold angle is found with
    probability 1-(1-p^band_planes)^n_bands; the DuckDB oracle applies
    the identical bucketing, so the comparison is exact.)

    ``band_planes=None`` → sized by :func:`auto_band_planes` from the
    corpus count — that bounds EXPECTED occupancy, but a cluster of
    identical embeddings collides regardless of bucket count, so
    ``max_bucket`` (default :data:`~.dedup.DEFAULT_MAX_BUCKET`)
    additionally degrades oversized buckets to star edges via
    :func:`~.dedup._capped_band_pairs` — linear worst case,
    connectivity preserved (the DuckDB oracle twin applies the
    identical cap). The cosine re-rank can drop a star edge whose
    members pairwise-pass only when a bucket mixes dissimilar vectors,
    which an oversized bucket (near-identical embeddings) in practice
    does not."""
    if band_planes is None:
        band_planes = auto_band_planes(emb.count())
    # _capped_band_pairs caches its windowed band table before the
    # self-join branches, so the bucket UDF runs exactly once — no
    # separate cache needed here
    bands = lsh_band_buckets(emb, dim, n_bands, band_planes)
    cand = _capped_band_pairs(
        bands.select(
            F.col("vec_id").alias("doc_id"), "band", F.col("bucket").alias("band_key")
        ),
        max_bucket,
    ).select(F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"))
    from .text import spread

    e = spread(emb).select("vec_id", "embedding", _norm().alias("norm"))
    ea = e.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), F.col("norm").alias("na")
    )
    eb = e.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), F.col("norm").alias("nb")
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(_dot(F.col("emb_a"), F.col("emb_b")) / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def embedding_near_dup_allpairs(
    emb: DataFrame, dim: int = 64, min_cosine: float = 0.9
) -> DataFrame:
    """All-pairs exact near-dup — TEST ORACLE ONLY (O(n²·dim)). Used by
    unit tests to measure the LSH path's recall at small n; never wire
    this into a gate or bench plan."""
    e = emb.select("vec_id", "embedding", _norm().alias("norm"))
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), F.col("norm").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), F.col("norm").alias("nb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_dot(F.col("emb_a"), F.col("emb_b")) / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): memory-compressed ANN codes + ADC scoring


def pq_codebooks(emb: DataFrame, dim: int = 64, m: int = 8, n_codes: int = 16):
    """Deterministic PQ codebooks: subspace ``s``'s code ``j`` is the
    s-th subvector of the j-th lowest-id vector (the same seed rule the
    IVF coarse quantizer starts from, so the DuckDB twin derives the
    identical codebooks from the table itself). Returns float64
    (m, n_codes, dim//m).

    PQ is the memory half of the 100 TB ANN story: IVF prunes which
    partitions a probe READS; PQ shrinks what a scoring pass HOLDS —
    m uint8 codes per vector instead of dim float64s (64 B vs 512 B at
    dim=64, m=8; 48 GB vs 384 GB per 10^9 vectors), so candidate
    scoring runs against codes + a per-query lookup table instead of
    raw vectors (Jegou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011 — public method)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    C, _ = _centroids(emb, n_codes)  # (n_codes, dim), vec_id-ordered
    dsub = dim // m
    return np.stack([C[:, s * dsub : (s + 1) * dsub] for s in range(m)])


def _pq_score_tables(qs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n_queries, m, n_codes) integer micro-dot tables: dot of each
    query subvector with each codebook entry, rounded to 6 decimals
    then scaled to exact int64 micros — ADC scores are SUMS of these,
    and integer sums are order-independent across engines."""
    nq = qs.shape[0]
    m, n_codes, dsub = books.shape
    t = np.empty((nq, m, n_codes), dtype=np.int64)
    for s in range(m):
        sub = qs[:, s * dsub : (s + 1) * dsub]
        # sequential per-position accumulation, NOT matmul: BLAS may
        # reorder/FMA the dsub-term sum, and a dot on a 6th-decimal
        # rounding boundary would then round differently than the
        # oracle's SUM — same determinism contract as _cell_dots.
        # np.round is banker's rounding while the DuckDB twin's ROUND
        # is half-away-from-zero: accepted repo-wide convention — a dot
        # landing EXACTLY on a 6th-decimal half-boundary is measure-zero
        # for real-valued embeddings, and both gate corpora and the
        # integer-micros scaling below keep every observed value off the
        # boundary.
        dots = np.zeros((nq, n_codes), dtype=np.float64)
        for i in range(dsub):
            dots += sub[:, i : i + 1] * books[s][None, :, i][0]
        t[:, s, :] = np.rint(np.round(dots, 6) * 1_000_000).astype(np.int64)
    return t


def pq_encode(
    emb: DataFrame, codebooks: np.ndarray, dim: int = 64
) -> DataFrame:
    """Encode the corpus: (vec_id, codes array<int>) — per subspace the
    argmin-L2 codebook entry (squared distance rounded to 6 decimals,
    ties → lowest code, mirroring the SQL twin). One Arrow map pass,
    no shuffle; at scale this materializes once next to (or instead
    of) the raw vectors."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .text import spread

    m, n_codes, dsub = codebooks.shape

    @pandas_udf("array<int>")
    def encode(e: pd.Series) -> pd.Series:
        E = np.array(list(e.values), dtype=np.float64)
        n = E.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        for s in range(m):
            sub = E[:, s * dsub : (s + 1) * dsub]
            # ||x - c||^2 per code, sequential accumulation like SQL SUM
            d2 = np.zeros((n, n_codes), dtype=np.float64)
            for i in range(dsub):
                diff = sub[:, i : i + 1] - codebooks[s][None, :, i][0]
                d2 += diff * diff
            codes[:, s] = np.argmin(np.round(d2, 6), axis=1)
        return pd.Series(list(codes))

    return spread(emb).select("vec_id", encode(F.col("embedding")).alias("codes"))


def pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ asymmetric-distance top-k: encode the corpus to m-byte codes,
    build each query's (m × n_codes) integer micro-dot table, score
    candidates as exact integer sums of table entries, rank desc with
    neighbor_id tie-break. Returns (query_id, rank, neighbor_id,
    score_u) where score_u is the ADC approximate dot in micros.

    Plan: encode = one Arrow pass; scoring joins the encoded corpus
    against a BROADCAST (n_queries × m × n_codes) table and reduces
    m array lookups per pair in one Arrow pass — no shuffle of raw
    vectors anywhere, the 100 TB property PQ exists for. Composes with
    IVF (encode within each cell; probe scores codes, not vectors)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # pre-trained codebooks (pq_codebooks_learned) pass through
    # ``codebooks`` — training is a build-time artifact, like ivf_topk's
    # ``centroids``; default = the deterministic oracle-reproducible seed
    books = codebooks if codebooks is not None else pq_codebooks(emb, dim, m, n_codes)
    if books.shape != (m, n_codes, dim // m):
        raise ValueError(
            f"codebooks shape {books.shape} != ({m}, {n_codes}, {dim // m})"
        )
    qrows = (
        emb.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    if not qrows:
        # no query id matched the corpus: empty result, stable schema
        # (np broadcasting below would crash on a 0-row query matrix)
        return emb.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, score_u long"
        )
    qrows.sort(key=lambda r: r.vec_id)
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    tables = _pq_score_tables(
        np.array([r.embedding for r in qrows], dtype=np.float64), books
    )

    codes_df = pq_encode(emb, books, dim)

    @pandas_udf("array<long>")
    def adc_scores(codes: pd.Series) -> pd.Series:
        Cc = np.array(list(codes.values), dtype=np.int64)  # (batch, m)
        n = Cc.shape[0]
        out = np.empty((n, len(qids)), dtype=np.int64)
        sub_idx = np.arange(m)
        for qi in range(len(qids)):
            out[:, qi] = tables[qi][sub_idx[None, :], Cc].sum(axis=1)
        return pd.Series(list(out))

    scored = codes_df.select(
        "vec_id", F.posexplode(adc_scores(F.col("codes"))).alias("qpos", "score_u")
    )
    qmap = F.array(*[F.lit(int(q)) for q in qids])
    scored = scored.select(
        F.element_at(qmap, F.col("qpos") + 1).cast("long").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        "score_u",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    return _topk_per_query(scored, k, "score_u")


def ivfpq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """IVF + PQ composed — the canonical billion-scale ANN layout
    (FAISS IVFPQ; Jegou et al. 2011): the coarse quantizer prunes WHICH
    cells a probe reads (n_probe/n_cells of the corpus), PQ codes are
    WHAT the scoring pass holds (m bytes per vector). Returns
    (query_id, rank, neighbor_id, score_u) — ADC integer micro-dot
    scores over probed cells only, self excluded, ties → neighbor_id.

    Plan: cell assignment + PQ encoding are each one Arrow map pass;
    candidates come from the broadcast (query, probed-cell) equi-join
    (collision-bounded, never all-pairs); scoring joins candidates to
    the m-byte codes and reduces table lookups per pair — raw vectors
    appear nowhere after encode. Both quantizers use the deterministic
    lowest-id seed so the DuckDB twin reproduces every step."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .text import spread

    C, Cn = _centroids(emb, n_cells)
    books = pq_codebooks(emb, dim, m, n_codes)
    qrows = (
        emb.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    if not qrows:
        # no query id matched the corpus: empty result, stable schema
        # (create_map() with zero args and 0-row numpy would crash)
        return emb.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, score_u long"
        )
    qrows.sort(key=lambda r: r.vec_id)
    qids = [int(r.vec_id) for r in qrows]
    qpos_of = {q: i for i, q in enumerate(qids)}
    tables = _pq_score_tables(
        np.array([r.embedding for r in qrows], dtype=np.float64), books
    )

    @pandas_udf("array<long>")
    def probe_cells(e: pd.Series) -> pd.Series:
        dots = _cell_dots(e, C, Cn)
        order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int64)))

    cells = ivf_cells(emb, dim, n_cells, centroids=(C, Cn))
    codes = pq_encode(emb, books, dim)
    qemb = emb.filter(F.col("vec_id").isin(query_ids))
    qprobe = qemb.select(
        F.col("vec_id").alias("query_id"),
        F.explode(probe_cells(F.col("embedding"))).alias("cell"),
    )
    cand = (
        cells.join(F.broadcast(qprobe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )

    qpos_map = F.create_map(
        *[x for q, i in qpos_of.items() for x in (F.lit(q), F.lit(i))]
    )
    pairs = cand.join(codes, "vec_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        qpos_map[F.col("query_id")].alias("qpos"),
        "codes",
    )

    @pandas_udf("long")
    def adc_pair_score(qpos: pd.Series, codes: pd.Series) -> pd.Series:
        Cc = np.array(list(codes.values), dtype=np.int64)  # (batch, m)
        qp = qpos.values.astype(np.int64)[:, None]  # (batch, 1)
        sub_idx = np.arange(m)[None, :]
        return pd.Series(tables[qp, sub_idx, Cc].sum(axis=1))

    scored = pairs.select(
        "query_id", "neighbor_id",
        adc_pair_score(F.col("qpos"), F.col("codes")).alias("score_u"),
    )
    return _topk_per_query(scored, k, "score_u")


def pq_codebooks_learned(
    emb: DataFrame,
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 2,
    round_decimals: int = 9,
) -> np.ndarray:
    """Learned PQ codebooks: per-subspace Lloyd k-means from the
    deterministic seed (:func:`pq_codebooks`), the quality upgrade over
    the seed rule exactly as :func:`kmeans_centroids` is for IVF.

    Per iteration ONE distributed pass covers all m subspaces:
    ``mapInPandas`` computes, per input partition, the (s, code) →
    (count, component sums) partial table — assignments never leave the
    executor, and the shuffle is partitions × m × n_codes tiny rows,
    not the corpus. Re-centering quantizes components to integers
    (``round(v·10⁹)`` longs) before summing, so the learned codebooks
    are bit-identical regardless of partitioning (the same
    order-independence contract the IVF quantizer pins); empty codes
    keep their previous entry. Assignment uses 6dp-rounded squared L2
    with lowest-code tie-break — identical to :func:`pq_encode`.
    """
    import pandas as pd

    from .text import spread

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    books = pq_codebooks(emb, dim, m, n_codes)
    if n_iters <= 0:
        return books
    dsub = dim // m
    scale = float(10 ** round_decimals)
    out_schema = "s int, code int, n long, " + ", ".join(
        f"c{i} long" for i in range(dsub)
    )
    from pyspark import StorageLevel

    e = spread(emb).select("embedding").persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(n_iters):
            cur = books.copy()

            def partials(batches, _cur=cur):
                counts = np.zeros((m, n_codes), dtype=np.int64)
                sums = np.zeros((m, n_codes, dsub), dtype=np.int64)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    E = np.array(list(pdf["embedding"].values), dtype=np.float64)
                    Eq = np.rint(E * scale).astype(np.int64)
                    for s in range(m):
                        sub = E[:, s * dsub : (s + 1) * dsub]
                        d2 = np.zeros((len(E), n_codes), dtype=np.float64)
                        for i in range(dsub):
                            diff = sub[:, i : i + 1] - _cur[s][None, :, i][0]
                            d2 += diff * diff
                        codes = np.argmin(np.round(d2, 6), axis=1)
                        np.add.at(counts[s], codes, 1)
                        np.add.at(
                            sums[s], codes, Eq[:, s * dsub : (s + 1) * dsub]
                        )
                rows = {
                    "s": np.repeat(np.arange(m), n_codes).astype(np.int32),
                    "code": np.tile(np.arange(n_codes), m).astype(np.int32),
                    "n": counts.reshape(-1),
                }
                flat = sums.reshape(m * n_codes, dsub)
                for i in range(dsub):
                    rows[f"c{i}"] = flat[:, i]
                yield pd.DataFrame(rows)

            agg = (
                e.mapInPandas(partials, out_schema)
                .groupBy("s", "code")
                .agg(
                    F.sum("n").alias("n"),
                    *[F.sum(f"c{i}").alias(f"c{i}") for i in range(dsub)],
                )
                .collect()
            )
            books = books.copy()
            for row in agg:
                n = int(row["n"])
                if n == 0:
                    continue  # empty code keeps its previous entry
                s, j = int(row["s"]), int(row["code"])
                for i in range(dsub):
                    books[s, j, i] = int(row[f"c{i}"]) / (n * scale)
    finally:
        e.unpersist()
    return books


def ivfpq_residual_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """Residual IVFPQ — PQ over ``v - centroid[cell(v)]`` instead of
    raw vectors (the actual FAISS IVFPQ design; Jegou et al. 2011 §IV):
    residuals concentrate near 0 regardless of which cell a vector
    lives in, so the SAME m-byte code budget quantizes a much tighter
    distribution — better recall than :func:`ivfpq_topk` at identical
    storage. Score(q, v) ≈ dot(q, C[cell]) + dot(q, r̂_v), both terms
    exact integer micros (the first per (query, probed cell) on the
    driver — n_queries × n_cells values; the second via the standard
    ADC tables against RESIDUAL codebooks).

    ONE Arrow pass computes each vector's cell AND its residual codes
    (no corpus self-join to look up centroids); candidates come from
    the same broadcast probed-cell equi-join as ivfpq_topk. Residual
    codebooks seed from the n_codes lowest-id vectors' residuals —
    deterministic, so the DuckDB twin derives every step."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .text import spread

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    dsub = dim // m
    C, Cn = _centroids(emb, n_cells)

    # residual codebooks: residuals of the n_codes lowest-id vectors
    # (driver-side: n_codes rows; their cells via the same rounded dots)
    seed_rows = (
        emb.filter(F.col("vec_id") < n_codes).select("vec_id", "embedding").collect()
    )
    if {r.vec_id for r in seed_rows} != set(range(n_codes)):
        raise ValueError(
            f"residual codebook seed rule requires vec_ids 0..{n_codes - 1} "
            f"present in the corpus (found {len(seed_rows)} of {n_codes})"
        )
    seed_rows.sort(key=lambda r: r.vec_id)
    S = np.array([r.embedding for r in seed_rows], dtype=np.float64)
    seed_cells = np.argmax(_cell_dots(pd.Series(list(S)), C, Cn), axis=1)
    R = S - C[seed_cells]  # (n_codes, dim) residuals
    books = np.stack([R[:, s * dsub : (s + 1) * dsub] for s in range(m)])

    qrows = (
        emb.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, score_u long"
        )
    qrows.sort(key=lambda r: r.vec_id)
    qids = [int(r.vec_id) for r in qrows]
    qpos_of = {q: i for i, q in enumerate(qids)}
    Q = np.array([r.embedding for r in qrows], dtype=np.float64)
    tables = _pq_score_tables(Q, books)  # vs RESIDUAL codebooks
    # dot(q, C[cell]) term, rounded micros — sequential accumulation
    qc = np.zeros((len(qids), n_cells), dtype=np.float64)
    for i in range(dim):
        qc += Q[:, i : i + 1] * C[None, :, i][0]
    qcell_u = np.rint(np.round(qc, 6) * 1_000_000).astype(np.int64)
    qprobe_order = np.argsort(
        -_cell_dots(pd.Series(list(Q)), C, Cn), axis=1, kind="stable"
    )[:, :n_probe]

    @pandas_udf("struct<cell: long, codes: array<int>>")
    def cell_and_codes(e: pd.Series) -> pd.DataFrame:
        E = np.array(list(e.values), dtype=np.float64)
        n = E.shape[0]
        cells = np.argmax(_cell_dots(e, C, Cn), axis=1)
        Rv = E - C[cells]
        codes = np.empty((n, m), dtype=np.int32)
        for s in range(m):
            sub = Rv[:, s * dsub : (s + 1) * dsub]
            d2 = np.zeros((n, n_codes), dtype=np.float64)
            for i in range(dsub):
                diff = sub[:, i : i + 1] - books[s][None, :, i][0]
                d2 += diff * diff
            codes[:, s] = np.argmin(np.round(d2, 6), axis=1)
        return pd.DataFrame(
            {"cell": cells.astype(np.int64), "codes": list(codes)}
        )

    enc = spread(emb).select(
        "vec_id", cell_and_codes(F.col("embedding")).alias("cc")
    ).select("vec_id", F.col("cc.cell").alias("cell"), F.col("cc.codes").alias("codes"))

    probe_rows = [
        (int(qids[qi]), int(cell))
        for qi in range(len(qids))
        for cell in qprobe_order[qi]
    ]
    qprobe = emb.sparkSession.createDataFrame(probe_rows, "query_id long, cell long")
    cand = (
        enc.join(F.broadcast(qprobe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
    )

    qpos_map = F.create_map(
        *[x for q, i in qpos_of.items() for x in (F.lit(q), F.lit(i))]
    )

    @pandas_udf("long")
    def residual_score(qpos: pd.Series, cell: pd.Series, codes: pd.Series) -> pd.Series:
        Cc = np.array(list(codes.values), dtype=np.int64)
        qp = qpos.values.astype(np.int64)
        cl = cell.values.astype(np.int64)
        sub_idx = np.arange(m)[None, :]
        adc = tables[qp[:, None], sub_idx, Cc].sum(axis=1)
        return pd.Series(adc + qcell_u[qp, cl])

    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        residual_score(
            qpos_map[F.col("query_id")], F.col("cell"), F.col("codes")
        ).alias("score_u"),
    )
    return _topk_per_query(scored, k, "score_u")


# ---------------------------------------------------------------------------
# int8 scalar quantization (SQ8) — the serving-memory workhorse of real
# vector stores (FAISS SQ8 / Milvus / pgvector halfvec-style): 4x
# smaller vectors, integer dot products, exact-arithmetic rescale.

SQ8_LEVELS = 127  # symmetric int8 range [-127, 127]


def sq8_quantize(emb: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: q_i =
    round(127 * x_i / max|x|), plus the integer self-dot ``qnorm`` the
    scorer needs. All-zero vectors quantize to zeros (scale 0).

    Every step is exact or correctly rounded IEEE (abs/max exact, one
    multiply + one divide + round) so Spark and DuckDB produce
    bit-identical codes — the reason sq8_topk is oracle-graded rather
    than recall-tested. Pure projection: no shuffle, no UDF; at 100 TB
    this runs as a map over the corpus scan and the quantized table is
    what serving loads (64 B of codes + 8 B norm per 64-dim vector vs
    256 B of floats)."""
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    qvec = F.when(
        maxabs > 0,
        F.transform(
            F.col("embedding"),
            lambda v: F.round(
                (F.lit(float(SQ8_LEVELS)) * v.cast("double")) / maxabs
            ).cast("long"),
        ),
    ).otherwise(
        F.transform(F.col("embedding"), lambda v: F.lit(0).cast("long"))
    )
    qnorm = F.aggregate(
        F.col("qvec"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x * x,
    )
    return (
        emb.select("vec_id", qvec.alias("qvec"))
        .select("vec_id", "qvec", qnorm.alias("qnorm"))
    )


def sq8_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Top-k neighbors by QUANTIZED cosine (self excluded): integer
    dot product over the SQ8 codes, rescaled by the exact integer code
    norms — est_cos = dot_q / sqrt(qnorm_a * qnorm_b). Returns
    (query_id, rank, neighbor_id, est_cos).

    The integer dot (|q_i| <= 127, 64 dims -> |dot| <= ~10^6) is
    BIGINT-exact in any summation order — the float-drift hazard the
    full-precision scorer must round away simply does not exist here.
    Plan shape matches cosine_topk: request-sized quantized query side
    broadcast onto one streaming pass over the quantized corpus,
    zip_with/aggregate folds inside codegen, two-phase top-k."""
    from .text import spread

    q8 = sq8_quantize(spread(emb))
    q = q8.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("qq"),
        F.col("qnorm").alias("qn_q"),
    )
    dot_q = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("qq"), lambda u, w: u * w),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        q8.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot_q.alias("dot_q"),
            F.col("qnorm").alias("qn_n"),
            F.col("qn_q"),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.when(
                (F.col("qn_q") > 0) & (F.col("qn_n") > 0),
                F.round(
                    F.col("dot_q")
                    / F.sqrt((F.col("qn_q") * F.col("qn_n")).cast("double")),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("est_cos"),
        )
    )
    return _topk_per_query(scored, k, "est_cos")


MMR_POOL = 20      # candidate pool per query fed to the diversifier
MMR_LAM_NUM = 1    # lambda = num/den: relevance weight in the MMR score
MMR_LAM_DEN = 2


def mmr_rerank_sq8(
    emb: DataFrame,
    query_ids: list[int] | None,
    k: int = 5,
    pool: int = MMR_POOL,
    lam_num: int = MMR_LAM_NUM,
    lam_den: int = MMR_LAM_DEN,
    dim: int = 64,
    queries: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) over the SQ8 serving scorer: greedily pick k of the top
    ``pool`` candidates, each pick maximizing
    lam*rel(d) - (1-lam)*max_{s in picked} sim(d, s) — the diversity
    re-rank every retrieval stack runs between ANN and the consumer so
    near-duplicate hits don't crowd out coverage. Returns
    (query_id, pick_rank, neighbor_id, mmr_u).

    ALL-INTEGER greedy: relevance and pairwise similarity are the SQ8
    estimates scaled to micro-units (round(est_cos*1e6) as BIGINT) and
    the score is lam_num*rel_u - (lam_den-lam_num)*maxsim_u — BIGINT
    arithmetic end-to-end, ties to the smaller neighbor_id, so the
    K-step unrolled DuckDB CTE reproduces every pick exactly (the
    float formulation would hinge last-ulp argmax flips; see
    functions/graph.py for the same convention).

    100 TB posture: the iterative argmax runs per GROUP inside one
    Arrow-batched applyInPandas over (pool cands, pool^2 sims) — both
    request-bounded, never corpus-bounded; the corpus-sized work
    (scoring + two-phase top-pool + the pool self-join) is all
    JVM-side DataFrame ops. A driver-side literal-feedback loop (the
    bpe.py trap) or a k-round join cascade were both rejected: the
    per-query state is a few hundred rows, exactly what bounded-group
    applyInPandas is for."""
    import pandas as pd

    from .text import spread

    if query_ids is None and queries is None:
        # isin(None) compiles to `vec_id IN (NULL)` — silently empty
        # output instead of a caller-bug signal (r18 similarity review)
        raise ValueError("mmr_rerank_sq8: pass query_ids or queries")
    q8 = sq8_quantize(spread(emb))
    if queries is not None:
        spark = emb.sparkSession
        qdf = spark.createDataFrame(
            [(int(qi), [float(x) for x in v]) for qi, v in queries],
            "vec_id long, embedding array<float>",
        )
        # literal queries quantize through the SAME Spark expression as
        # the corpus (a driver-side Python round() would use bankers
        # rounding and diverge from the engines on exact halves)
        q = sq8_quantize(qdf).select(
            F.col("vec_id").alias("query_id"),
            F.col("qvec").alias("qq"),
            F.col("qnorm").alias("qn_q"),
        )
    else:
        q = q8.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"),
            F.col("qvec").alias("qq"),
            F.col("qnorm").alias("qn_q"),
        )
    dot_q = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("qq"), lambda u, w: u * w),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    est = F.when(
        (F.col("qn_q") > 0) & (F.col("qnorm") > 0),
        F.round(
            dot_q / F.sqrt((F.col("qn_q") * F.col("qnorm")).cast("double")), 6
        ),
    ).otherwise(F.lit(0.0))
    if queries is not None:
        scored = q8.crossJoin(F.broadcast(q)).select(
            "query_id", F.col("vec_id").alias("neighbor_id"), est.alias("est_cos")
        )
    else:
        scored = q8.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_id")
        ).select(
            "query_id", F.col("vec_id").alias("neighbor_id"), est.alias("est_cos")
        )
    cands = _topk_per_query(scored, pool, "est_cos").select(
        "query_id",
        "neighbor_id",
        F.round(F.col("est_cos") * 1_000_000).cast("long").alias("rel_u"),
    ).localCheckpoint()

    # pairwise similarities among each query's pool: request-bounded
    # (pool^2 rows/query) — broadcast the pair list onto two passes
    # over the quantized corpus for the code arrays
    ca = cands.select("query_id", F.col("neighbor_id").alias("a"))
    cb = cands.select("query_id", F.col("neighbor_id").alias("b"))
    pairs = ca.join(cb, "query_id").filter(F.col("a") != F.col("b"))
    qa = q8.select(
        F.col("vec_id").alias("a"), F.col("qvec").alias("va"),
        F.col("qnorm").alias("na"),
    )
    qb = q8.select(
        F.col("vec_id").alias("b"), F.col("qvec").alias("vb"),
        F.col("qnorm").alias("nb"),
    )
    with_a = qa.join(F.broadcast(pairs), "a")
    with_ab = qb.join(F.broadcast(with_a), "b")
    pair_dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda u, w: u * w),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sim_est = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0),
        F.round(
            pair_dot / F.sqrt((F.col("na") * F.col("nb")).cast("double")), 6
        ),
    ).otherwise(F.lit(0.0))
    # request-bounded tables; localCheckpoint makes each a leaf so the
    # pool self-join and the cogroup don't trip the ambiguous-self-join
    # analyzer (cands appears on three sides), and the corpus scoring
    # pass runs exactly once instead of once per consumer
    sims = with_ab.select(
        "query_id", "a", "b",
        F.round(sim_est * 1_000_000).cast("long").alias("sim_u"),
    ).localCheckpoint()

    ln, ld, kk = int(lam_num), int(lam_den), int(k)

    def mmr_fn(key, cpdf, spdf):
        rel = {
            int(n): int(r)
            for n, r in zip(cpdf["neighbor_id"], cpdf["rel_u"])
        }
        simm = {
            (int(a), int(b)): int(su)
            for a, b, su in zip(spdf["a"], spdf["b"], spdf["sim_u"])
        }
        picked: list[int] = []
        rows = []
        remaining = set(rel)
        for rank in range(1, kk + 1):
            if not remaining:
                break
            best = None
            for d in sorted(remaining):
                ms = max((simm.get((d, s2), 0) for s2 in picked), default=0)
                sc = ln * rel[d] - (ld - ln) * ms
                if best is None or sc > best[0]:
                    best = (sc, d)
            picked.append(best[1])
            remaining.discard(best[1])
            rows.append((int(key[0]), rank, best[1], best[0]))
        return pd.DataFrame(
            rows, columns=["query_id", "pick_rank", "neighbor_id", "mmr_u"]
        )

    return (
        cands.groupBy("query_id")
        .cogroup(sims.groupBy("query_id"))
        .applyInPandas(
            mmr_fn,
            "query_id long, pick_rank long, neighbor_id long, mmr_u long",
        )
    )


def label_centroid_similarity(emb: DataFrame) -> DataFrame:
    """Pairwise cosine similarity between per-label centroids in SQ8
    code space — the cluster-separation diagnostic a labeling/
    clustering pass reports (labels whose centroids sit close are
    candidates for merging; a label far from all others is either a
    clean concept or noise). Returns (label_a, label_b, n_a, n_b,
    cos_centroid) for label_a < label_b.

    Integer-exact core: centroids are the UNSCALED per-dimension BIGINT
    sums of the SQ8 codes (cosine is scale-invariant, so dividing by
    the count is pointless work); the centroid dot product and the
    self-dots are then BIGINT-exact in any summation/merge order, and
    only the final dot/(sqrt(na)*sqrt(nb)) touches doubles (two
    correctly-rounded sqrts + multiply + divide + the shared 6dp round
    — deterministic cross-engine, the sq8_topk argument). sqrt per
    side rather than sqrt(na*nb): the BIGINT product of two self-dots
    can overflow at corpus scale (~10^13 each), the doubles cannot.

    100 TB posture: one posexplode to (label, pos, code) rows whose
    map-side partial aggregation collapses each task's contribution to
    |labels|*dim rows before the shuffle — the shuffle carries
    label-count-sized data regardless of corpus size; the pairwise
    join runs over the |labels|*dim summary table (broadcast-sized).
    No UDFs, no collects."""
    from .text import spread

    src = spread(emb)
    q8 = sq8_quantize(src)
    labeled = src.select("vec_id", "label").join(q8, "vec_id")
    sums = (
        labeled.select(
            "label", F.posexplode(F.col("qvec")).alias("pos", "qv")
        )
        .groupBy("label", "pos")
        .agg(F.sum("qv").cast("long").alias("s"))
    )
    counts = labeled.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = sums.select(
        F.col("label").alias("label_a"), "pos", F.col("s").alias("sa")
    )
    b = sums.select(
        F.col("label").alias("label_b"), "pos", F.col("s").alias("sb")
    )
    dots = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot"))
    )
    norms = (
        sums.groupBy("label")
        .agg(F.sum(F.col("s") * F.col("s")).cast("long").alias("nrm"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("nrm").alias("nb"))
    ca = counts.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    return (
        dots.join(na, "label_a")
        .join(nb, "label_b")
        .join(ca, "label_a")
        .join(cb, "label_b")
        .select(
            F.col("label_a").cast("long").alias("label_a"),
            F.col("label_b").cast("long").alias("label_b"),
            "n_a",
            "n_b",
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                F.round(
                    F.col("dot")
                    / (
                        F.sqrt(F.col("na").cast("double"))
                        * F.sqrt(F.col("nb").cast("double"))
                    ),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("cos_centroid"),
        )
    )
