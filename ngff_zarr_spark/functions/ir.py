"""Sparse-vector information-retrieval operators over the documents
table: TF-IDF weighting, term-at-a-time sparse top-k document
similarity, and Okapi BM25 doc-as-query retrieval.

The scale design is the classic term-partitioned formulation (the one
every large-scale IR/dedup system uses because the alternative — a
dense doc×doc product — is quadratic): weights live as (doc, term, w)
rows, the self-join runs ON THE TERM KEY so only documents sharing a
term ever meet, and high-document-frequency terms are EXCLUDED from
pairing by an absolute ``max_df`` cap. The cap is what keeps the plan
100 TB-safe: a term in ``df`` documents contributes df² pair rows, so
un-capped stopwords alone would recreate the quadratic blowup, while
capped terms bound per-document candidates by n_distinct_terms·max_df.
Semantically the cap costs almost nothing — a ubiquitous term carries
the least IDF mass by construction. Everything is built-in DataFrame
ops (explode → two hash aggregates → one equi-join → one aggregate →
two-phase top-k); no UDFs, no driver-side loops, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import spread, tokens_col

TFIDF_MAX_DF = 64   # absolute df pairing cap
TFIDF_TOPK = 5
TFIDF_SHINGLE_K = 3  # words per term (same k as the dedup shingles)

# Fixed free-text eval queries for the serving-path gate: phrases from
# the synthetic corpus vocabulary, long enough to yield several
# TFIDF_SHINGLE_K-gram terms each. The gate and the DuckDB oracle both
# read THIS list (single source of truth for the literals).
IR_EVAL_QUERIES = [
    (0, "key agg row scan slow fast table value part hash"),
    (1, "batch window spark order data column agg join"),
    (2, "small fast slow filter value small value table"),
    (3, "stream customer group spark data vector"),
]


def _shingle_tf(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf): occurrence counts of TFIDF_SHINGLE_K-word
    shingles of the lowercased text — the shared term space of every
    IR operator in this module. Tokenization is materialized through a
    projection boundary before the positional transform (same reason
    as dedup.shingle_df: a lambda body embeds its argument tree)."""
    k = TFIDF_SHINGLE_K
    toksed = spread(docs).select(
        "doc_id", tokens_col(F.lower(F.col("text"))).alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.when(
        n >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
            ),
        ),
    ).otherwise(F.array())
    return (
        toksed.select("doc_id", F.explode(shingles).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def _topk_per_group(
    scored: DataFrame,
    group: str,
    bucket_col: str,
    order: list,
    k: int,
    prebuckets: int,
) -> DataFrame:
    """The engine's standard two-phase exact top-k (rank inside
    (group, hash-prebucket), keep k, re-rank the ≤ prebuckets·k
    survivors) shared by every retrieval operator in this module — one
    million-candidate hub group never serializes a partition. Appends a
    1-based ``rank`` column and keeps rows with rank ≤ k."""
    w1 = Window.partitionBy(
        group, F.pmod(F.hash(bucket_col), F.lit(prebuckets))
    ).orderBy(*order)
    stage1 = (
        scored.withColumn("_prk", F.row_number().over(w1))
        .filter(F.col("_prk") <= k)
        .drop("_prk")
    )
    w2 = Window.partitionBy(group).orderBy(*order)
    return (
        stage1.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
    )


def tfidf_weights(
    docs: DataFrame, max_df: int = TFIDF_MAX_DF, tf: DataFrame | None = None
) -> DataFrame:
    """(doc_id, term, w): smooth-IDF TF-IDF weights where a term is a
    ``TFIDF_SHINGLE_K``-word shingle of the lowercased text (the same
    k-gram space the MinHash dedup family uses — single words are far
    too coarse a similarity signal once a corpus's head vocabulary
    saturates, and a shingle's df decays fast enough that the absolute
    ``max_df`` cap keeps essentially all of the discriminative mass).
    w = tf · (ln((1+N)/(1+df)) + 1) — the sklearn smooth-idf
    convention, exactly reproducible in SQL; tf counts OCCURRENCES
    (repeated shingles weigh more), unlike the dedup family's distinct
    sets.

    N arrives via a broadcast 1-row cross join (no driver action); df
    comes from a term-key aggregate of the same tf table the weights
    join against, so Catalyst reuses the term partitioning for the
    join instead of adding a shuffle.

    ``tf``: optionally a precomputed (ideally persisted) _shingle_tf
    table — a hybrid-retrieval pass that runs several lexical scorers
    over the same corpus materializes the tokenize→count work once and
    shares it (VERDICT r12 watch item)."""
    if tf is None:
        tf = _shingle_tf(docs)
    # r19 (guide §2.4): df attaches to EVERY tf row here, so the
    # count-aggregate-joined-back form shuffled tf by term twice (the
    # partial-agg exchange plus the full probe side); a whole-partition
    # count window is the same df on one term shuffle. (bm25 keeps its
    # df_tab aggregate: there df only decorates the request-sized query
    # term list, and a window would shuffle the full tf table for it.)
    from pyspark.sql import Window

    total = docs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long")
        )
        .filter(F.col("df") <= int(max_df))
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * (
                    F.log((F.lit(1.0) + F.col("n_total")) / (F.lit(1.0) + F.col("df")))
                    + F.lit(1.0)
                )
            ).alias("w"),
        )
    )


def tfidf_topk(
    docs: DataFrame, k: int = TFIDF_TOPK, max_df: int = TFIDF_MAX_DF,
    prebuckets: int = 64, tf: DataFrame | None = None,
) -> DataFrame:
    """Top-k most-similar documents per document by TF-IDF cosine over
    the ``max_df``-capped term space: (doc_a, rank, doc_b, cos). Norms
    use the SAME capped weights the dot products use, so cos is a true
    cosine in that space (self-similarity = 1).

    Pair generation is the term-key self-join described in the module
    docstring; the final per-document selection is the engine's
    standard two-phase exact top-k (rank inside (doc, hash-prebucket),
    keep k, re-rank the ≤ prebuckets·k survivors) so one
    million-candidate hub document never serializes a partition.
    Scores round to 6dp BEFORE ranking with a doc_b tie-break — the
    exact convention the ANN gates use to stay hash-comparable with
    the DuckDB twin."""
    # the weight table feeds THREE consumers (norms + both self-join
    # sides) and its own build references tf twice (tf + df_tab); a
    # call-scoped persist of each materializes the tokenize→tf→idf
    # pipeline once instead of once per consumer — the pair-sized
    # result is checkpointed and the caches released (r19, guide §2.4/§5)
    owned = []
    # r19: with the weight build's df window (tfidf_weights), tf has
    # exactly ONE reference in this plan, so an owned tf no longer
    # rates a persist — only the thrice-consumed weight table does.
    if tf is None:
        tf = _shingle_tf(docs)
    w = tfidf_weights(docs, max_df=max_df, tf=tf).persist()
    owned.append(w)
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = w.select(F.col("term"), F.col("doc_id").alias("doc_a"), F.col("w").alias("wa"))
    b = w.select(F.col("term"), F.col("doc_id").alias("doc_b"), F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    scored = (
        dots.join(norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na")), "doc_a")
        .join(norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
    )
    order = [F.col("cos").desc(), F.col("doc_b").asc()]
    out = _topk_per_group(scored, "doc_a", "doc_b", order, k, prebuckets).select(
        "doc_a", "rank", "doc_b", "cos"
    )
    from ._scope import checkpointed

    return checkpointed(out, *owned)


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_ids: list[int],
    k: int = TFIDF_TOPK,
    max_df: int = TFIDF_MAX_DF,
    k1: float = BM25_K1,
    b: float = BM25_B,
    prebuckets: int = 64,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 retrieval: each query is a document's distinct shingle
    set (doc-as-query, the standard retrieval-eval shape); every corpus
    document sharing a below-``max_df`` shingle is scored

        Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·dl/avgdl))

    with idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). Document length dl is
    the document's TOTAL shingle-occurrence count (pre-cap — length
    normalization must reflect the document, not the pruned term
    space); avgdl is the corpus mean (1-row broadcast). The df cap
    bounds candidate generation exactly as in :func:`tfidf_topk`; the
    query doc itself scores too (self-retrieval at rank 1 is the
    built-in sanity signal). Returns (query_id, rank, doc_id, score),
    score rounded 6dp before the two-phase top-k rank."""
    k1 = float(k1)
    b = float(b)
    # the tf table is referenced FOUR times downstream (df_tab, qterms,
    # dl, the scoring join). Catalyst's ReusedExchange only dedupes the
    # canonically-identical subtrees; the qterms branch gets the
    # query-id filter pushed below the aggregate, so its subtree
    # differs and the tokenize→count pipeline runs again per
    # non-reusable reference. A call-scoped persist materializes it
    # once; the request-sized result is checkpointed and the cache
    # released (functions/_scope.py — the triangle_stats convention).
    # r19, guide §2.4/§5.
    owns_tf = tf is None
    if owns_tf:
        tf = _shingle_tf(docs).persist()
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qterms = (
        tf.filter(F.col("doc_id").isin([int(q) for q in query_ids]))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
        .join(df_tab, "term")
        .filter(F.col("df") <= int(max_df))
    )
    out = _bm25_rank(docs, tf, df_tab, qterms, k, k1, b, prebuckets)
    if owns_tf:
        from ._scope import checkpointed

        return checkpointed(out, tf)
    return out


def bm25_query_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = TFIDF_TOPK,
    max_df: int = TFIDF_MAX_DF,
    k1: float = BM25_K1,
    b: float = BM25_B,
    prebuckets: int = 64,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Free-text BM25 retrieval — the serving path of the retrieval
    stack: each (query_id, text) literal tokenizes through the SAME
    shingle space as the corpus (lowercase → whitespace tokens →
    TFIDF_SHINGLE_K-gram terms, distinct per query), then scores via
    the identical df-capped join and formula as the doc-as-query form.
    A query shorter than the shingle width contributes no terms and
    retrieves nothing (by construction, not by crash).

    Plan shape: the query set is request-sized BY CONTRACT, so its
    shingled term list is explicitly ``F.broadcast`` onto the tf join —
    the corpus-wide tf table never shuffles for a serving lookup;
    candidate volume stays bounded by n_query_terms · max_df. Returns
    (query_id, rank, doc_id, score), 6dp-rounded scores, two-phase
    top-k."""
    k1 = float(k1)
    b = float(b)
    # same call-scoped tf persist as bm25_topk (three non-reusable
    # references: df_tab, dl, the scoring join) — r19, guide §2.4/§5
    owns_tf = tf is None
    if owns_tf:
        tf = _shingle_tf(docs).persist()
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qdf = docs.sparkSession.createDataFrame(
        [(int(q), str(t)) for q, t in queries], "doc_id long, text string"
    )
    qterms = F.broadcast(
        _shingle_tf(qdf)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
        .join(df_tab, "term")
        .filter(F.col("df") <= int(max_df))
    )
    out = _bm25_rank(docs, tf, df_tab, qterms, k, k1, b, prebuckets)
    if owns_tf:
        from ._scope import checkpointed

        return checkpointed(out, tf)
    return out


def _bm25_rank(
    docs: DataFrame,
    tf: DataFrame,
    df_tab: DataFrame,
    qterms: DataFrame,
    k: int,
    k1: float,
    b: float,
    prebuckets: int,
) -> DataFrame:
    """Shared BM25 scoring tail: join the capped (query_id, term, df)
    list to the corpus tf/dl tables, sum the per-term contributions,
    two-phase top-k. Both N and avgdl arrive as 1-row broadcasts."""
    total = docs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    # explicit exact-long-sum / count division (one double op) rather
    # than AVG: aggregate-internal accumulation order is an engine
    # implementation detail, a single division is not
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    scored = (
        qterms.join(tf, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(avgdl))
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_total") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    order = [F.col("score").desc(), F.col("neighbor_id").asc()]
    return _topk_per_group(
        scored, "query_id", "neighbor_id", order, k, prebuckets
    ).select("query_id", "rank", F.col("neighbor_id").alias("doc_id"), "score")


RRF_K = 60          # standard reciprocal-rank-fusion constant
RRF_UNIT = 1_000_000  # integer micro-unit so fusion scores hash exactly


def rrf_fusion(
    runs: list[DataFrame],
    k: int = TFIDF_TOPK,
    prebuckets: int = 64,
) -> DataFrame:
    """Reciprocal-rank fusion of retrieval runs: each run is a
    (query_id, rank, doc_id) DataFrame (any extra columns ignored) and
    contributes ``RRF_UNIT div (RRF_K + rank)`` — INTEGER micro-units,
    so fused scores are BIGINT-exact across engines instead of
    last-ulp-sensitive float sums of 1/(60+r). A document absent from
    a run simply contributes nothing from it (standard RRF). Returns
    (query_id, rank, doc_id, rrf_micro) — the fused top-k per query
    through the engine's two-phase exact top-k."""
    if not runs:
        # the fold below would fall through with contrib=None and die
        # on an off-topic AttributeError (r18 review)
        raise ValueError("rrf_fusion: need at least one retrieval run")
    contrib = None
    for r in runs:
        c = r.select(
            "query_id",
            "doc_id",
            F.expr(f"CAST({RRF_UNIT} div ({RRF_K} + rank) AS BIGINT)").alias("c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").cast("long").alias("rrf_micro")
    )
    order = [F.col("rrf_micro").desc(), F.col("doc_id").asc()]
    return _topk_per_group(scored, "query_id", "doc_id", order, k, prebuckets).select(
        "query_id", "rank", "doc_id", "rrf_micro"
    )


def ranking_metrics(
    run: DataFrame, qrels: DataFrame, k: int = TFIDF_TOPK
) -> DataFrame:
    """Retrieval-quality evaluation of a ranked run against a binary
    relevance set — the measurement half of the retrieval stack (a
    corpus pipeline that builds an index should also be able to score
    it, at corpus scale, without collecting either side).

    ``run``: (query_id, rank, doc_id) — any of this module's retrieval
    outputs. ``qrels``: (query_id, doc_id) binary relevance pairs.
    Returns per query: (query_id, n_rel, n_hits, recall, mrr, ndcg),
    doubles rounded 6dp:

    - recall@k   = |retrieved∩relevant| / |relevant|
    - MRR@k      = 1 / rank of the first relevant hit (0 if none)
    - nDCG@k     = Σ_hits 1/log2(rank+1) over the IDEAL prefix
                   Σ_{i=1..min(n_rel,k)} 1/log2(i+1)

    Plan shape: one distinct + count per query side, one equi-join of
    the (≤ n_queries·k)-row run against qrels, one aggregate — every
    step hash-partitioned on query_id; the ideal-DCG denominator is a
    per-row ``aggregate(sequence(...))`` fold over at most k terms (no
    join, no window). The per-query DCG sums ≤ k doubles, so the 6dp
    round absorbs cross-engine summation-order ulps."""
    q = qrels.select("query_id", "doc_id").distinct()
    n_rel = q.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    hits = (
        run.filter(F.col("rank") <= int(k))
        .select("query_id", "rank", "doc_id")
        .join(q, ["query_id", "doc_id"])
    )
    agg = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("rank").alias("first_rank"),
        F.sum(F.lit(1.0) / F.log2(F.col("rank") + 1)).alias("dcg"),
    )
    idcg = F.expr(
        f"aggregate(sequence(1, int(least(n_rel, {int(k)}))), "
        "cast(0 as double), (acc, i) -> acc + 1.0 / log2(i + 1))"
    )
    return n_rel.join(agg, "query_id", "left").select(
        "query_id",
        "n_rel",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_rel"), 6
        ).alias("recall"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_rank"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6).alias("ndcg"),
    )
