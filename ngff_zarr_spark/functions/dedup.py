"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB posture:
- exact dedup is one hash aggregate on a digest (map-side combine, one
  shuffle of digests — never of document text);
- MinHash/LSH turns all-pairs O(n^2) into a band-bucket equi-join whose
  cost is bounded by bucket collision counts;
- SimHash pairs join on signature bands the same way;
- n-gram Jaccard joins on shared shingles (an inverted index join), so
  only documents sharing at least one shingle ever meet.

Everything is built-in expressions (md5/conv/array ops) — no Python in
the hot path — and every operator has an exact DuckDB-oracle twin
because the hashes are the portable ``h64`` md5 derivation.
"""

from __future__ import annotations

import contextlib
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import h64, spread, tokens_col

NUM_PERM = 16       # minhash permutations
BAND_SIZE = 4       # rows per LSH band → 4 bands
SHINGLE_K = 3       # words per shingle
MINHASH_MOD = 4294967291  # largest 32-bit prime (2^32 - 5)
# default document-frequency cap for the n-gram inverted-index join: a
# shingle in more than this many documents is a stop-phrase, not a
# similarity signal, and its bucket joins as df² pairs — 10^4 bounds the
# worst bucket at ~10^8 comparisons (minutes on one executor) where an
# uncapped stop-phrase at 10^6 df would be 10^12 (never finishes).
DEFAULT_MAX_DF = 10_000
# default occupancy cap for LSH band buckets (minhash/simhash candidate
# joins). A bucket at or below the cap joins pairwise (≤ cap² ≈ 10^6
# comparisons — sub-second on one core); a bucket ABOVE it would go
# quadratic (a 10^6-doc boilerplate cluster that survives exact dedup
# via trivial perturbations lands in ONE bucket → 10^12 pairs → the job
# never finishes), so it degrades to STAR EDGES: bucket-min doc ↔ each
# member, O(occ) edges. Connected components over the edges are
# preserved exactly (every member stays reachable through the hub), so
# dedup decisions (clusters / keep-set) are unchanged; only the
# enumerated pair list shrinks for oversized buckets.
DEFAULT_MAX_BUCKET = 1024


def _norm_text(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5 of normalized text. Returns one row
    per distinct content: (content md5, group size, representative =
    smallest doc_id). ``n_dups > 1`` marks duplicated content."""
    keyed = docs.select(F.md5(_norm_text(F.col("text"))).alias("content_md5"), "doc_id")
    return keyed.groupBy("content_md5").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("representative"),
    )


def shingle_df(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Distinct k-word shingles per document: (doc_id, shingle).
    Built with a positional array transform (no self-join): shingle i =
    tokens[i..i+k-1] joined by spaces.

    The tokenization is materialized through a projection boundary
    BEFORE the transform: lambda bodies embed their argument expression
    tree, so referencing the raw ``tokens_col`` inside ``element_at``
    would re-run the regex+split k times per shingle (the dominant cost
    of the whole minhash pipeline before this fix)."""
    toksed = spread(docs).select(
        "doc_id", tokens_col(_norm_text(F.col("text"))).alias("toks")
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
    return toksed.select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))


def minhash_signatures_wide(docs: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """MinHash signature matrix in wide form: (doc_id, m0..m{P-1}).

    Double-hashing construction (Kirsch & Mitzenmacher): each shingle is
    hashed ONCE (one md5, split into two 32-bit halves ha/hb) and
    permutation p's value is ``(ha + p*hb) mod P32`` — pure integer
    arithmetic per permutation instead of p string-concat+md5 passes.
    The cryptographic hash stays out of the inner loop (16× fewer md5
    evaluations per shingle; was 56% of the whole round-1 bench). The
    identical derivation runs in the DuckDB oracle (md5 is md5 in both
    engines; the arithmetic stays below 2^36, exact in BIGINT).

    Wide is the 100 TB shape: ONE hash aggregate with ``num_perm`` min
    expressions — no perm-explode (16× fewer shuffle rows than the long
    form), map-side combine collapses to one 16-column row per doc per
    task before the exchange."""
    sh = shingle_df(docs)
    md5c = F.md5(F.col("shingle"))
    hashed2 = sh.select(
        "doc_id",
        F.conv(F.substring(md5c, 1, 8), 16, 10).cast("long").alias("ha"),
        F.conv(F.substring(md5c, 9, 8), 16, 10).cast("long").alias("hb"),
    )
    return hashed2.groupBy("doc_id").agg(
        *[
            F.min((F.col("ha") + p * F.col("hb")) % MINHASH_MOD).alias(f"m{p}")
            for p in range(num_perm)
        ]
    )


def minhash_signatures(docs: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """Long-form view (doc_id, perm, minhash) of the wide signature —
    the oracle-friendly shape; derived by a cheap posexplode projection
    over :func:`minhash_signatures_wide` (the aggregate itself never
    materializes long form)."""
    wide = minhash_signatures_wide(docs, num_perm)
    return wide.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"m{p}") for p in range(num_perm)])
        ).alias("perm", "minhash"),
    )


def _band_table(wide: DataFrame, num_perm: int, band_size: int) -> DataFrame:
    """(doc_id, band, band_key) from the wide signature. Band key is
    the order-independent polynomial sum of minhash * 31^i over the
    band's positions — plain projection arithmetic on the wide row
    (minhash < 2^32, * 31^3, summed over 4 → the key stays < 2^49:
    exact BIGINT in both engines)."""
    n_bands = num_perm // band_size
    band_keys = [
        sum(
            (F.col(f"m{b * band_size + i}") * F.lit(31 ** i) for i in range(band_size)),
            start=F.lit(0).cast("long"),
        )
        for b in range(n_bands)
    ]
    return wide.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band", "band_key")
    )


def _capped_band_pairs(
    bands: DataFrame, max_bucket: int | None, payload: tuple[str, ...] = ()
) -> DataFrame:
    """Candidate pairs from a band table ``(doc_id, band, band_key
    [, payload…])`` with a bucket-occupancy cap — the skew guard that
    keeps LSH band joins linear on pathological buckets.

    Buckets at or below ``max_bucket`` self-join pairwise (collision-
    bounded, ≤ cap² comparisons per bucket). Buckets ABOVE the cap emit
    STAR EDGES instead: hub ↔ member, where the hub is the bucket's
    smallest doc_id — O(occ) edges, connected components preserved
    exactly (every member reaches every other through the hub).
    Occupancy and hub are WINDOW aggregates over (band, band_key) — one
    exchange on the join key the band table needed anyway, no separate
    occupancy aggregate + join. The windowed table feeds THREE consumers
    (pairwise self-join side a, side b, star branch), so it is CACHED
    before branching: without that, Catalyst re-executes the full
    exchange+sort+window per consumer (three executions, zero
    ReusedExchange — the aliased self-join sides don't canonicalize to
    one subplan), which tripled the most expensive shuffle of the dedup
    pipeline. The cached scan also preserves the (band, band_key) hash
    partitioning, so the pairwise self-join needs no further exchange.
    ``max_bucket=None`` opts out (the historical uncapped join).

    ``payload`` columns ride along as ``<col>_a`` / ``<col>_b`` (the
    hub's payload is carried atomically via min-by-struct)."""
    from pyspark.sql import Window

    pay = list(payload)

    def _pairwise(side: DataFrame) -> DataFrame:
        a, b = side.alias("a"), side.alias("b")
        return a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in pay],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in pay],
        )

    if max_bucket is None:
        return _pairwise(bands).distinct()
    w = Window.partitionBy("band", "band_key")
    bx = bands.select(
        "doc_id",
        "band",
        "band_key",
        *pay,
        F.count(F.lit(1)).over(w).alias("occ"),
        F.min(F.struct("doc_id", *pay)).over(w).alias("hub"),
    ).cache()
    star = bx.filter(
        (F.col("occ") > max_bucket) & (F.col("doc_id") != F.col("hub.doc_id"))
    ).select(
        F.col("hub.doc_id").alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"hub.{c}").alias(f"{c}_a") for c in pay],
        *[F.col(c).alias(f"{c}_b") for c in pay],
    )
    from ._scope import checkpointed

    # scope the bx cache to this call: the (much smaller, cap-bounded)
    # candidate list is checkpointed and the windowed band table
    # released — an explicit cache must not outlive its query
    return checkpointed(
        _pairwise(bx.filter(F.col("occ") <= max_bucket)).unionByName(star).distinct(),
        bx,
    )


def minhash_candidates(
    docs: DataFrame,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
    min_est_jaccard: float = 0.125,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """LSH candidate pairs: band the signature (band id = perm / band_size,
    band key = portable hash of the band's concatenated minhashes), join
    docs sharing any band bucket, then estimate Jaccard as the fraction
    of matching minhash positions. Returns (doc_a, doc_b, est_jaccard)
    with doc_a < doc_b.

    Scale: the join key is (band, band_key) — collision-bounded; the
    signature-agreement count is a 16-column comparison in a projection
    after joining the candidate pairs back to the WIDE signature (one
    row per doc) — no perm-level join, no per-pair aggregate. Buckets
    above ``max_bucket`` degrade to star edges (:func:`_capped_band_pairs`)
    so a boilerplate near-identical cluster can't go quadratic.
    Connected components — and therefore :func:`duplicate_clusters` /
    :func:`dedup_keep_representatives` — are unchanged by the cap
    whenever ``min_est_jaccard <= band_size/num_perm`` (a band collision
    means the full band agrees, so every within-bucket edge, star or
    pairwise, scores at least band_size/num_perm and survives the
    filter; the default 0.125 < 4/16 qualifies). Only the enumerated
    pair list shrinks for oversized buckets."""
    wide = minhash_signatures_wide(docs, num_perm).cache()
    bands = _band_table(wide, num_perm, band_size)
    cand = _capped_band_pairs(bands, max_bucket)
    wa = wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{p}").alias(f"a{p}") for p in range(num_perm)],
    )
    wb = wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{p}").alias(f"b{p}") for p in range(num_perm)],
    )
    agree = sum(
        ((F.col(f"a{p}") == F.col(f"b{p}")).cast("long") for p in range(num_perm)),
        start=F.lit(0).cast("long"),
    )
    from ._scope import checkpointed

    # wide is scoped to this call (three consumers above); the scored
    # candidate pairs are the small side — checkpoint them, release it
    return checkpointed(
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select("doc_a", "doc_b", (agree / num_perm).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_est_jaccard),
        wide,
    )


def duplicate_clusters(
    pairs: DataFrame,
    max_iters: int = 20,
    checkpoint_dir: str | None = None,
    reliable: bool | None = None,
) -> DataFrame:
    """Connected components over near-duplicate pairs → duplicate
    clusters: (doc_id, cluster_id) where cluster_id is the SMALLEST
    doc_id reachable through the pair graph. This is the step that
    turns pairwise candidates into dedup decisions (keep one doc per
    cluster) — the standard tail of a MinHash/LSH pipeline.

    Algorithm: hash-min label propagation. Every node starts labeled
    with its own id; each round propagates the minimum label across
    edges (one shuffle per round: edges join labels, groupBy min). The
    round count is bounded by the graph diameter, which for near-dup
    clusters is tiny (duplicates of one source form near-cliques:
    diameter ≤ 2-3 in practice); the loop exits EARLY via one cheap
    count when no label changed. If ``max_iters`` rounds pass without
    convergence the function RAISES rather than return wrong labels —
    the DuckDB oracle computes exact transitive closure, and a
    too-long chain silently mislabeled would drop the wrong documents
    downstream. Raise ``max_iters`` (rounds needed ≈ graph diameter)
    if that ever fires on a real corpus.

    Fault-tolerance contract: each round's labels are materialized to
    truncate lineage (otherwise the plan doubles per round and re-runs
    LSH candidate generation every iteration). Two modes:

    - ``reliable=False`` → ``localCheckpoint`` (executor-local blocks;
      fastest, but an executor loss mid-loop kills the query). Right
      for interactive / short jobs.
    - ``reliable=True`` → ``checkpoint()`` to the session's checkpoint
      directory on reliable storage (HDFS/object store): executor loss
      only recomputes from the last round. Right for the multi-hour
      100 TB dedup jobs this feeds (SURVEY §7 phase 5).

    Default (``reliable=None``): reliable checkpointing is ON whenever
    the SparkContext has a checkpoint dir configured; passing
    ``checkpoint_dir`` sets one (for the duration of this call — the
    prior session checkpoint dir is restored on exit, so other session
    code never silently inherits it) and implies reliable mode.

    ``max_iters`` must exceed the graph diameter by one: convergence is
    detected by a no-change round, so a diameter-d graph needs d+1
    rounds to be recognized as converged.

    100 TB posture: labels are (doc_id, long) pairs — never the text;
    each iteration is edge-count-bounded work; candidate pairs are
    already collision-bounded by the LSH band join feeding this. The
    alternating large-star/small-star optimization (Kiveris et al.)
    halves rounds on adversarial graphs but near-dup graphs never need
    it — diameter stays small because duplicate groups are dense.

    Returns every doc that appears in ≥1 pair with its cluster label
    (singletons are by definition not duplicates — callers keep them)."""
    if max_iters <= 0:
        raise ValueError(
            f"max_iters={max_iters}: need at least diameter+1 rounds "
            "(>=1 even for an empty pair graph) to detect convergence"
        )
    with _checkpoint_scope(pairs, checkpoint_dir, reliable) as use_reliable:
        return _duplicate_clusters_loop(pairs, max_iters, use_reliable)


@contextlib.contextmanager
def _checkpoint_scope(pairs: DataFrame, checkpoint_dir: str | None, reliable: bool | None):
    """Shared checkpoint-dir plumbing for the iterative CC twins: apply
    the reliable-mode defaulting contract (documented on
    duplicate_clusters), set the session checkpoint dir for the scope,
    and restore the EXACT prior dir (or unset) on exit — the public
    setCheckpointDir can't do either (it appends a fresh UUID subdir),
    so restoration goes through the JVM var directly. Yields the
    resolved ``reliable`` flag."""
    sc = pairs.sparkSession.sparkContext
    prior_dir = sc.getCheckpointDir()
    set_dir = checkpoint_dir is not None and checkpoint_dir != prior_dir
    if checkpoint_dir is not None and reliable is None:
        reliable = True
    if reliable is None:
        reliable = prior_dir is not None
    if reliable and checkpoint_dir is None and prior_dir is None:
        raise ValueError(
            "reliable=True needs a checkpoint directory: pass "
            "checkpoint_dir= or call sc.setCheckpointDir() first"
        )
    if set_dir:
        sc.setCheckpointDir(checkpoint_dir)
    try:
        yield reliable
    finally:
        if set_dir:
            try:
                jopt = (
                    sc._jvm.scala.Option.apply(prior_dir)
                    if prior_dir is not None
                    else sc._jvm.scala.Option.empty()
                )
                getattr(sc._jsc.sc(), "checkpointDir_$eq")(jopt)
            except Exception:
                # non-classic backend: best effort via the public setter
                if prior_dir is not None:
                    sc.setCheckpointDir(prior_dir)


def _duplicate_clusters_loop(
    pairs: DataFrame, max_iters: int, reliable: bool
) -> DataFrame:
    if reliable:
        def _pin(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def _pin(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    # edges pre-hashed on the per-round join key: checkpoint preserves
    # outputPartitioning, and labels arrive already hashed on u from the
    # previous round's groupBy — the round join then needs no exchange
    # on either side, leaving ONE shuffle per round (the label agg).
    # Symmetrization is an explode (both directions from ONE pass over
    # the pair plan) — a two-branch union would execute the full LSH
    # candidate pipeline twice before the checkpoint.
    edges = _pin(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("u"), F.col("doc_b").alias("w")),
                    F.struct(F.col("doc_b").alias("u"), F.col("doc_a").alias("w")),
                )
            ).alias("e")
        )
        .select("e.u", "e.w")
        .distinct()
        .repartition("w")
    )
    labels = _pin(
        edges.select("u").distinct().select("u", F.col("u").alias("label"))
    )
    converged = False
    for _ in range(max_iters):
        # candidate label per node = min(own, min over neighbors' labels)
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("u", "w"), "w")
            .select("u", "label")
        )
        # own-label rows carry the label twice: min(label) is the new
        # label, min(own) recovers the previous one — so convergence
        # detection rides the SAME aggregate instead of a per-round
        # join of old vs new labels (one fewer shuffle per round)
        pinned = _pin(
            labels.select("u", "label", F.col("label").alias("own"))
            .unionByName(
                neighbor_labels.withColumn("own", F.lit(None).cast("long"))
            )
            .groupBy("u")
            .agg(F.min("label").alias("label"), F.min("own").alias("own"))
            .withColumn("changed", F.col("label") < F.col("own"))
        )
        labels = pinned.select("u", "label")
        if pinned.filter(F.col("changed")).limit(1).count() == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters did not converge in max_iters={max_iters} "
            "rounds; the pair graph has a longer chain than expected — "
            "raise max_iters (rounds needed = graph diameter + 1)"
        )
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("cluster_id"))


def duplicate_clusters_star(
    pairs: DataFrame,
    max_iters: int = 30,
    checkpoint_dir: str | None = None,
    reliable: bool | None = None,
) -> DataFrame:
    """Diameter-robust connected components: the alternating
    large-star / small-star edge contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"). Same contract as
    :func:`duplicate_clusters` — (doc_id, cluster_id = smallest
    reachable doc_id) for every doc appearing in ≥1 pair — but the
    round count is O(log² n) in the worst case instead of the graph
    DIAMETER, so a chain-shaped candidate graph (boilerplate A≈B≈C…
    chains are real in web corpora) converges in ~10 rounds where
    hash-min propagation needs diameter+1 and aborts at its budget.

    Per round, on the canonical (small, large) distinct edge set:

    - **large-star**: for each node u, attach every LARGER neighbor v
      to m = min(Γ(u) ∪ {u}) — one symmetrize (explode, not a
      plan-doubling union), one min-aggregate, one join.
    - **small-star**: orient edges large→small; attach each smaller
      neighborhood (and u itself) to its minimum — one min-aggregate,
      one join, one union with the (node-count-bounded) mins table.

    Both stars preserve connectivity and never increase the edge count
    beyond the symmetrized input; at the fixpoint the edge set IS the
    star {(component min, member)}, read off as labels directly. TWO
    rounds run per checkpoint barrier (same reliable/local contract as
    duplicate_clusters — see _checkpoint_scope; the barrier truncates
    lineage), and convergence is detected by the star-shape probe (no
    root is a leaf, no leaf has two parents) — a star is a fixpoint of
    both operations, so the first star is exactly the edge-set-equality
    fixpoint the loop previously waited one extra round to observe.
    ``max_iters`` rounds without a star RAISES rather than return
    wrong labels.

    100 TB posture: every step is edge-count-bounded (no node ever
    materializes its full 2-hop neighborhood, unlike naive contraction);
    the min-aggregates are map-side-combinable; no driver collect.
    Prefer this twin when the candidate graph's shape is unknown;
    hash-min stays the default for the near-clique clusters LSH
    actually emits (fewer shuffles per round, rounds ≈ 2-3)."""
    if max_iters <= 0:
        raise ValueError(f"max_iters={max_iters}: need >= 1 round")
    with _checkpoint_scope(pairs, checkpoint_dir, reliable) as use_reliable:
        return _star_loop(pairs, max_iters, use_reliable)


def _star_loop(pairs: DataFrame, max_iters: int, reliable: bool) -> DataFrame:
    if reliable:
        def _pin(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def _pin(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    from pyspark.sql import Window

    # ONE pass over the pairs plan (r20 — guide §1.2 "don't compute
    # things twice"): the r19 shape pinned nodes and edges separately,
    # executing the full candidate-pair pipeline feeding `pairs` TWICE
    # (once per eager pin). Pin the canonical (s <= b) distinct table
    # WITH self-pairs instead; nodes (self-paired docs still owe a
    # (doc, doc) row) and the s < b edge set are lazy derivations of
    # the one leaf.
    base = _pin(
        pairs.select(
            F.least("doc_a", "doc_b").alias("s"),
            F.greatest("doc_a", "doc_b").alias("b"),
        ).distinct()
    )
    nodes = base.select(
        F.explode(F.array(F.col("s"), F.col("b"))).alias("doc_id")
    ).distinct()
    edges = base.filter(F.col("s") < F.col("b"))

    def _round(e, dedup_sym=False):
        """One large-star + small-star contraction round.

        Exchange budget (r20, guide §2.4): THREE exchanges — the u
        window, ONE b exchange serving the large-star dedup AND the b
        window (hashpartitioning(b) satisfies ClusteredDistribution
        (s, b), and min(s) per b is dedup-insensitive, so the dedup
        rides the window's exchange instead of paying its own
        (s, b) aggregate exchange as in r19), and the caller's
        barrier distinct. Composed (mid-barrier) rounds skip the
        barrier distinct and instead dedup the exploded (u, w) table
        on the u-window exchange (``dedup_sym``) — 2.5 exchanges per
        round across a 2-round barrier, vs 4 in the r19 shape.

        The large-star dedup stays load-bearing at scale (r19 audit):
        on a near-clique component the deduped output is O(nodes)
        where the raw multiset is O(edges); it now costs zero extra
        exchange. The neighborhood minima are whole-partition windows
        (not aggregate+join-back) per the r19 rewrite — the join probe
        shipped every (u, ·) row to u's partition anyway."""
        sym = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("u"), F.col("b").alias("w")),
                    F.struct(F.col("b").alias("u"), F.col("s").alias("w")),
                )
            ).alias("e")
        ).select("e.u", "e.w")
        if dedup_sym:
            # mid-barrier input is a multiset (the previous round's
            # barrier distinct was deferred); exploding a duplicated
            # (s, b) row duplicates both orientations, and the dedup
            # rides the u-window exchange (u ⊆ {u, w})
            sym = sym.repartition("u").dropDuplicates(["u", "w"])
        ls = (
            sym.withColumn("mn", F.min("w").over(Window.partitionBy("u")))
            .filter(F.col("w") > F.col("u"))
            .select(
                F.least("mn", F.col("u")).alias("s"), F.col("w").alias("b")
            )
            .filter(F.col("s") < F.col("b"))
        )
        # small-star on the large→small orientation (every ls edge has
        # s < b, so b is the large endpoint). The (mn, b) attach rows
        # are emitted once per edge instead of once per b — the
        # barrier distinct (or the next round's dedup_sym) dedupes
        # them, so the edge SET is unchanged.
        lsm = (
            ls.repartition("b")
            .dropDuplicates(["s", "b"])
            .withColumn("mn", F.min("s").over(Window.partitionBy("b")))
        )
        return (
            lsm.select(F.col("mn").alias("s"), F.col("s").alias("b"))
            .unionByName(
                lsm.select(F.col("mn").alias("s"), F.col("b").alias("b"))
            )
            .filter(F.col("s") < F.col("b"))
        )

    def _is_star(e):
        """True iff ``e`` (a distinct edge set with s < b) is a
        disjoint union of stars: no root is also a leaf, and no leaf
        has two parents. One probe job (both tests unioned under one
        limit); both sides are map-side-combinable aggregates of the
        just-checkpointed barrier table, and AQE broadcasts the
        near-fixpoint distinct-roots side."""
        chained = e.join(
            e.select(F.col("b").alias("s")).distinct(), "s", "left_semi"
        ).select(F.lit(1).alias("one"))
        multi = (
            e.groupBy("b")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .select(F.lit(1).alias("one"))
        )
        return chained.unionByName(multi).limit(1).count() == 0

    # Termination is the STAR-SHAPE test, not the r19 set-equality
    # test (count + anti-join): a star is a fixpoint of both star
    # operations (large-star of a star re-attaches every leaf to the
    # root; small-star re-emits the same edges), components never
    # merge or split, node sets are preserved, and every edge keeps
    # s < b — so each component's star root is the component minimum
    # and the first star IS the r19 loop's fixpoint, read off one
    # round (and one pin + count + anti-join) earlier. Two rounds run
    # per checkpoint barrier (r20, guide §1.2/§2.4 — the sequential
    # barrier structure, not per-round compute, was the remaining
    # wall): interleaved A/B on the diameter-511 chain fixture
    # measured 133 → 70 scheduled jobs (−47%) and wall −20%, with
    # 3-round barriers measuring WORSE (52 jobs but +9% wall) and a
    # persisted mid-round also worse (the union's doubled lsm subtree
    # is already deduped by AQE shuffle-stage reuse).
    converged = edges.limit(1).count() == 0
    rounds = 0
    while not converged and rounds < max_iters:
        stepped = _round(edges)
        steps = 1
        if max_iters - rounds >= 2:
            stepped = _round(stepped, dedup_sym=True)
            steps = 2
        edges = _pin(stepped.distinct())
        rounds += steps
        converged = _is_star(edges)
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters_star did not converge in max_iters={max_iters} "
            "rounds; raise max_iters (expected rounds ~ O(log^2 n))"
        )
    # fixpoint edge set is the star {(component min, member)}
    return nodes.join(
        edges.select(F.col("b").alias("doc_id"), F.col("s").alias("root")),
        "doc_id",
        "left",
    ).select(
        "doc_id", F.coalesce(F.col("root"), F.col("doc_id")).alias("cluster_id")
    )


def dedup_keep_representatives(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """End-to-end dedup decision: drop every doc whose cluster
    representative (smallest doc_id in its connected component) is a
    different doc. Returns the surviving documents — the 'keep' set a
    training-data pipeline feeds downstream. Anti-join on the small
    (doc_id, cluster) label table; document text shuffles nowhere."""
    clusters = duplicate_clusters(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(drop, "doc_id", "left_anti")


def simhash(docs: DataFrame, bits: int = 60) -> DataFrame:
    """SimHash signature per document: bit b is set when the sum over
    tokens of ±1 (sign of bit b of the token hash) is positive. 60 bits
    so the signature fits the portable h64 domain. Returns
    (doc_id, simhash).

    Vectorized bit votes: ONE row per token (no tokens×bits row
    blowup — that was a 60× amplification); the per-bit vote sums are 60
    constant-shift aggregate expressions in a single hash aggregate, and
    the signature is reassembled from the 60 sums in a plain projection.
    All JVM built-ins inside whole-stage codegen."""
    toks = spread(docs).select(
        "doc_id", F.explode(tokens_col(_norm_text(F.col("text")))).alias("tok")
    )
    hashed = toks.select("doc_id", h64(F.col("tok")).alias("h"))
    vote_aggs = [
        F.sum(F.expr(f"(shiftright(h, {b}) & 1) * 2 - 1")).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = hashed.groupBy("doc_id").agg(*vote_aggs)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_candidates(
    docs: DataFrame,
    bits: int = 60,
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the signature into ``n_bands``
    equal bit-slices, equi-join on any matching band (a pair within
    Hamming distance < n_bands must agree on ≥1 band — pigeonhole), then
    verify with bit_count(xor) ≤ max_hamming.

    Buckets above ``max_bucket`` degrade to star edges
    (:func:`_capped_band_pairs`) so a skewed bucket can't go quadratic.
    Unlike the minhash cap, the post-join Hamming verification CAN drop
    a star edge whose members pairwise-pass (the hub may sit farther
    from a member than two members sit from each other), so above the
    cap the pair set is a connectivity-preserving subset only for
    buckets of near-identical signatures — which is exactly what an
    oversized bucket is in practice (a boilerplate cluster whose
    signatures differ by ≲ max_hamming bits). Below the cap the result
    is bit-identical to the uncapped join."""
    band_bits = bits // n_bands
    sig = simhash(docs, bits)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_key",
        F.expr(f"shiftright(simhash, cast(band * {band_bits} as int))")
        .bitwiseAND(F.lit((1 << band_bits) - 1)),
    )
    pairs = _capped_band_pairs(banded, max_bucket, payload=("simhash",)).select(
        "doc_a",
        "doc_b",
        F.col("simhash_a").alias("sig_a"),
        F.col("simhash_b").alias("sig_b"),
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = SHINGLE_K,
    min_jaccard: float = 0.1,
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share ≥1 shingle
    (inverted-index join — no all-pairs blowup). Returns
    (doc_a, doc_b, jaccard) for pairs ≥ threshold.

    ``max_df`` is the hot-shingle skew guard: a stop-phrase shingle
    shared by 10⁶ documents makes its inverted-index bucket quadratic.
    Shingles whose document frequency exceeds it are excluded from BOTH
    candidate generation and the intersection/union counts (standard
    inverted-index df-capping: jaccard is computed over the
    discriminative shingle vocabulary; near-identical documents still
    share plenty of sub-cap shingles). At 100 TB this bound is what
    keeps the join's worst bucket O(max_df²) instead of O(n²).

    The guard is ON by default (``DEFAULT_MAX_DF`` = 10⁴); pass
    ``max_df=None`` to opt out explicitly — exact whole-vocabulary
    jaccard, safe only when the corpus is known stop-phrase-free."""
    sh = shingle_df(docs, k)
    owned = []
    if max_df is not None:
        # r19 second pass (guide §2.4): the df cap is a whole-partition
        # count WINDOW over shingle instead of a frequency aggregate
        # joined back — the raw shingle table then has exactly ONE
        # consumer, so the r19 first-pass persist (which existed to
        # stop the tokenize→shingle pipeline running for both the
        # aggregate and the probe side) disappears along with the
        # join; the capped table's cache build below is one tokenize
        # pass + one shingle shuffle.
        from pyspark.sql import Window

        sh = (
            sh.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
            )
            .filter(F.col("df") <= max_df)
            .drop("df")
        )
    sh = sh.cache()
    owned.append(sh)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    from ._scope import checkpointed

    return checkpointed(
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard),
        *owned,
    )


def dup_shingle_frac(docs: DataFrame, k: int = SHINGLE_K, min_df: int = 2) -> DataFrame:
    """Corpus-level duplicated-shingle fraction per document: of a
    doc's distinct k-gram shingles, the fraction that occur in at least
    ``min_df`` documents — the standard cross-document repetition /
    contamination signal (a high value means the doc is mostly made of
    text that exists elsewhere in the corpus, even when no single pair
    passes a near-dup threshold). Returns
    (doc_id, n_shingles, n_dup_shingles, dup_frac).

    100 TB posture: one shingle shuffle — the document frequency rides
    a whole-partition count window over the inverted-index rows (r19,
    guide §2.4: df decorates EVERY row here, so the old aggregate
    joined back shuffled the shingle table twice and needed a cache to
    keep the tokenize pass single); per-doc stats re-aggregate the
    windowed rows; text never shuffles."""
    from pyspark.sql import Window

    sh = shingle_df(docs, k)
    return (
        sh.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("df") >= min_df).cast("long")).alias("n_dup_shingles"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup_shingles",
            F.round(F.col("n_dup_shingles") / F.col("n_shingles"), 6).alias("dup_frac"),
        )
    )


EDIT_MAX_DIST = 24  # default edit-distance acceptance bound


def edit_distance_candidates(
    docs: DataFrame,
    max_dist: int = EDIT_MAX_DIST,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Exact-edit-distance near-dup verification (the RETSim-style
    re-rank stage): MinHash/LSH band candidates — already bucket-capped,
    never all-pairs — re-scored with a TRUE Levenshtein distance over
    the normalized text, keeping pairs within ``max_dist`` edits.
    Returns (doc_a, doc_b, dist), doc_a < doc_b.

    Scale: candidate generation is the existing capped band join;
    distance runs JVM-side via the THRESHOLD form of ``levenshtein``
    (O(len·max_dist) banded DP with early exit instead of the O(len²)
    full matrix — at book-length documents that's the difference
    between a bounded row cost and a quadratic one). The oracle
    computes the full DuckDB levenshtein and filters — identical
    accepted set, because the threshold form only short-circuits
    ABOVE the bound."""
    cand = minhash_candidates(docs, max_bucket=max_bucket).select("doc_a", "doc_b")
    norm = docs.select("doc_id", _norm_text(F.col("text")).alias("nt"))
    ta = norm.select(F.col("doc_id").alias("doc_a"), F.col("nt").alias("ta"))
    tb = norm.select(F.col("doc_id").alias("doc_b"), F.col("nt").alias("tb"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(F.col("ta"), F.col("tb"), int(max_dist)).cast("long").alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= int(max_dist)))
    )


def _capped_ref_bands(
    wide: DataFrame, num_perm: int, band_size: int, max_bucket: int | None
) -> DataFrame:
    """Witness-capped band table of the reference side: per (band,
    band_key) keep only the ``max_bucket`` smallest doc_ids."""
    from pyspark.sql import Window

    rb = _band_table(wide, num_perm, band_size)
    if max_bucket is None:
        return rb
    w = Window.partitionBy("band", "band_key").orderBy("doc_id")
    return (
        rb.select("doc_id", "band", "band_key", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= max_bucket)
        .drop("rn")
    )


def build_ref_index(
    ref_docs: DataFrame,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """The offline corpus index every ingest batch reuses:
    ``(ref_wide, ref_bands)`` — the wide signature table and the
    witness-capped band table. Production materializes both to storage
    (bucketed by band_key / doc_id for co-located lookups) and refreshes
    them as the corpus grows; here they come back as GC-scoped
    checkpoint leaves so a long-lived session can hold them across many
    :func:`incremental_dedup` batches without recomputation."""
    wide = minhash_signatures_wide(ref_docs, num_perm).localCheckpoint()
    bands = _capped_ref_bands(wide, num_perm, band_size, max_bucket).localCheckpoint()
    return wide, bands


# ---------------------------------------------------------------------------
# persisted corpus index (VERDICT r14 ask #2): the build_ref_index
# tables as PARQUET TABLES with an incremental refresh verb, so the
# continuously-growing-corpus story survives session restarts and the
# index is shared by every ingest job, not one driver's checkpoints.
#
# Layout under `path`:
#   wide/   — the FULL signature table (doc_id, m0..m{P-1}), hash-
#             clustered on doc_id (`n_files` output files): the
#             est_jaccard join side. Never capped — every admitted doc
#             must be judgeable against.
#   bands/  — the witness-capped band table, disk-partitioned by
#             `band` (partition pruning for band-sliced probes) and
#             hash-clustered on band_key within each band dir.
#   _meta.json — {num_perm, band_size, max_bucket, max_doc_id[, gen]}:
#             the refresh contract's parameters + the monotonic-id
#             high-water mark. When `gen` is present (r17), the data
#             tables live under a generation directory `gen=<G>/` and
#             readers pin G == meta.gen — the level that makes
#             SAME-PATH compaction possible (compact_ref_index_inplace
#             publishes gen=G+1 then commits the meta; gen-less
#             indexes keep the legacy flat layout and migrate on their
#             first in-place compaction).
#
# WRITERS ARE SINGLE-WRITER (ADVICE r16): refresh, in-place compaction
# and vacuum serialize on a `_writer.lock` file under `path` — a
# concurrent admission would race the orphan GC (one writer's in-flight
# staging directory is indistinguishable from a crash orphan to
# another), a concurrent compaction would strand a refresh's batch in
# the superseded generation, and an unserialized vacuum could reclaim a
# compaction's uncommitted generation. Contention fails loudly; a crash
# leaves the lock behind and the error message names it for manual
# removal. Commit primitives assume POSIX semantics (O_EXCL create for
# the lock, fsync+rename for the atomic meta replace) — true on local
# disks, NFS v3+, and HDFS-style stores; a plain-S3 deployment maps
# both to conditional puts (If-None-Match / If-Match on the lock and
# meta objects), the same translation every table format makes there.
#
# REFRESH = APPEND, exactly equal to a from-scratch rebuild, because of
# the monotonic-id ingest contract (new batch ids strictly above the
# stored high-water mark — the same disjoint-growing-id contract
# incremental_dedup already requires): the stored witnesses of any
# bucket are its smallest doc_ids, so a rebuild would keep them all and
# rank every new arrival AFTER them. Refresh therefore only has to (a)
# append the whole batch to wide/, and (b) append the batch's band rows
# whose merged rank (stored bucket size + rank within the batch) still
# clears the cap. Stored rows are never rewritten or demoted.
#
# Cost shape (the plan contract, pinned in tests/test_r15_ref_index.py):
# refresh scans the BATCH plus the stored bands table's two key columns
# (columnar scan joined against the batch's touched bucket keys — an
# index-metadata scan bounded by cap × occupied buckets, never the
# corpus text and never wide/), so a daily batch pays batch-sized work
# plus one bounded index-column scan. On a metastore cluster the same
# tables would be written bucketed on their FULL join keys —
# bucketBy(band, band_key) for bands/, bucketBy(doc_id) for wide/ — to
# make the probe joins corpus-side shuffle-free (since Spark 3.3
# co-partition requires the partitioning to cover every join key:
# spark.sql.requireAllClusterKeysForCoPartition). The path layout here
# is the portable form; the shuffle-free plan is PINNED in
# tests/test_r17_bucketed_index.py (bucketed probe join = 1 exchange,
# the batch side only, vs 2 for the path layout, identical rows).
# ---------------------------------------------------------------------------

INDEX_FILES = 16  # output-file clustering knob (executor-count-sized)


def _index_meta_path(path: str) -> str:
    import os

    return os.path.join(path, "_meta.json")


def _write_index_meta(path: str, meta: dict) -> None:
    """ATOMIC meta commit: temp file + os.replace. The meta write IS
    the commit point of every index verb — a plain open('w') truncates
    first, so a crash mid-write would brick the whole index (every
    verb starts by reading the meta), not just the in-flight batch."""
    import json
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=path, prefix="_meta.", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(json.dumps(meta))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, _index_meta_path(path))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _index_data_root(path: str, meta: dict) -> str:
    """Directory holding the wide/ and bands/ tables: a ``gen=<G>``
    level when the meta carries a generation (r17 layout), else the
    index root itself (legacy flat layout — every pre-r17 index)."""
    import os

    if "gen" in meta:
        return os.path.join(path, f"gen={int(meta['gen'])}")
    return path


@contextmanager
def _index_writer_lock(path: str):
    """Exclusive single-writer lock for index mutation verbs (ADVICE
    r16): O_CREAT|O_EXCL on ``path/_writer.lock`` — atomic on POSIX
    filesystems. Concurrent writers raise instead of racing the orphan
    GC / generation commit; a crashed writer leaves the lock behind
    and the error names it (manual removal is the recovery — the
    commit protocol itself is crash-safe, only the lock is sticky)."""
    import json
    import os
    import time

    lock = os.path.join(path, "_writer.lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"ref index at {path} is locked by another writer "
            f"({lock} exists). refresh_ref_index and "
            "compact_ref_index_inplace are single-writer verbs; if the "
            "previous writer crashed, remove the lock file and retry "
            "(the batch-staging commit protocol is crash-safe)."
        ) from None
    try:
        os.write(fd, json.dumps({"pid": os.getpid(), "time": time.time()}).encode())
        os.close(fd)
        yield
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def write_ref_index(
    ref_docs: DataFrame,
    path: str,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    n_files: int = INDEX_FILES,
) -> None:
    """Materialize the corpus dedup index (see layout note above) from
    scratch. Overwrites ``path``."""
    import json
    import os

    import shutil

    shutil.rmtree(path, ignore_errors=True)
    hi_row = ref_docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    hi = int(hi_row) if hi_row is not None else -1
    wide = minhash_signatures_wide(ref_docs, num_perm)
    # batch-scoped staging (crash safety, r15): every admission —
    # including this base build — lands in its own batch=<hi> partition
    # directory, and the _meta.json high-water mark is the COMMIT
    # POINT. Readers filter batch <= max_doc_id, so a crash after a
    # data write but before the meta write leaves an invisible orphan
    # directory, and a retry overwrites exactly that directory
    # (mode=overwrite on the batch dir) — no duplicate signatures, no
    # half-admitted band rows, bit-identical to a crash-free run.
    wide_dir = os.path.join(path, "wide", f"batch={hi}")
    wide.repartition(n_files, "doc_id").write.mode("overwrite").parquet(wide_dir)
    # derive the band table from the JUST-WRITTEN wide parquet, not the
    # live plan: the band projection is a deterministic function of the
    # wide rows, and re-reading 17 narrow columns is far cheaper than
    # re-running the shingle+md5+min-aggregate pipeline a second time
    # (the two writes each executed the full signature computation).
    # Same rows by construction — the stored signatures ARE the batch.
    stored_wide = ref_docs.sparkSession.read.parquet(wide_dir).select(
        "doc_id", *[f"m{p}" for p in range(num_perm)]
    )
    bands = _capped_ref_bands(stored_wide, num_perm, band_size, max_bucket)
    (
        bands.repartition(n_files, "band_key")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(os.path.join(path, "bands", f"batch={hi}"))
    )
    _write_index_meta(
        path,
        {
            "num_perm": num_perm,
            "band_size": band_size,
            "max_bucket": max_bucket,
            "max_doc_id": hi,
        },
    )


def read_ref_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(ref_wide, ref_bands) from a persisted index — drop-in for
    :func:`build_ref_index`'s return, reusable across sessions. Only
    COMMITTED batches are served: the batch partition column is
    filtered against the _meta.json high-water mark, so orphan
    directories left by a crashed refresh are invisible (partition
    pruning — the orphan files are never opened). Gen-aware (r17):
    reads pin the generation recorded in the meta, so an in-place
    compaction that publishes gen=G+1 never changes what an
    already-opened reader sees (its plan references gen=G's files,
    which survive until :func:`vacuum_ref_index`)."""
    import os

    meta = read_ref_index_meta(path)
    root = _index_data_root(path, meta)
    hi = meta["max_doc_id"]
    num_perm = meta["num_perm"]
    wide = (
        spark.read.parquet(os.path.join(root, "wide"))
        .filter(F.col("batch") <= hi)
        .select("doc_id", *[f"m{p}" for p in range(num_perm)])
    )
    bands = (
        spark.read.parquet(os.path.join(root, "bands"))
        .filter(F.col("batch") <= hi)
        .select("doc_id", "band", "band_key")
    )
    return wide, bands


def read_ref_index_meta(path: str) -> dict:
    import json

    with open(_index_meta_path(path)) as fh:
        return json.load(fh)


def _gc_orphan_batches(data_root: str, max_doc_id: int) -> None:
    """Delete wide/batch=* and bands/batch=* directories (under the
    current generation's data root) whose batch id exceeds the
    committed high-water mark — uncommitted orphans from a crashed
    refresh. Readers already hide them via the batch filter, but a
    LATER commit of a *different* batch raises the high-water mark past
    the orphan and would resurrect it: its rows were never counted in
    that batch's occupancy scan (bucket caps could overfill) and a
    crash between the wide and bands writes can leave wide rows with no
    band rows (ADVICE r15). Collecting them at admission time closes
    the crash-then-skip hole; a crash-then-retry still simply
    overwrites its own directory. Callers hold the writer lock (ADVICE
    r16) — GC must never see another live writer's staging dirs."""
    import os
    import shutil

    for sub in ("wide", "bands"):
        root = os.path.join(data_root, sub)
        if not os.path.isdir(root):
            continue
        for name in os.listdir(root):
            if not name.startswith("batch="):
                continue
            try:
                bid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if bid > max_doc_id:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def refresh_ref_index(spark, path: str, new_docs: DataFrame) -> None:
    """Admit ``new_docs`` into the persisted index: stage their
    signatures and still-under-cap band rows into batch=<hi> partition
    directories, then COMMIT by advancing the _meta.json high-water
    mark. Equal to a from-scratch :func:`write_ref_index` over the
    union (pinned in tests/test_r15_ref_index.py) under the
    monotonic-id contract, which is VERIFIED here: a batch at or below
    the stored high-water mark raises instead of silently corrupting
    witness order.

    Crash-safe and retry-idempotent (r15): the data writes land in
    batch-scoped directories with mode=overwrite, and readers
    (read_ref_index AND this function's own occupancy scan) filter
    batch <= the committed high-water mark — a crash between the data
    writes and the meta write leaves invisible orphans, and re-running
    the same batch overwrites them exactly. Without the staging, a
    retry after such a crash would re-APPEND the batch's signatures
    (the stale high-water guard cannot tell a retry from a new batch),
    silently corrupting every downstream est_jaccard agreement
    count."""
    import json
    import os

    from pyspark.sql import Window

    with _index_writer_lock(path):
        meta = read_ref_index_meta(path)
        root = _index_data_root(path, meta)
        # garbage-collect uncommitted orphans BEFORE admitting this
        # batch: once this commit raises the high-water mark, any
        # orphan below the new mark would become visible without ever
        # being occupancy-counted
        _gc_orphan_batches(root, int(meta["max_doc_id"]))
        num_perm, band_size = meta["num_perm"], meta["band_size"]
        max_bucket = meta["max_bucket"]
        lo = new_docs.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).collect()[0]
        if lo["lo"] is None:
            return  # empty batch — nothing to admit
        if lo["lo"] <= meta["max_doc_id"]:
            raise ValueError(
                f"refresh_ref_index: batch min doc_id {lo['lo']} <= stored "
                f"high-water mark {meta['max_doc_id']} — the append-only "
                "refresh requires strictly growing doc_ids (rebuild with "
                "write_ref_index for out-of-order corpora)"
            )
        new_wide = minhash_signatures_wide(new_docs, num_perm).localCheckpoint()
        new_bands = _band_table(new_wide, num_perm, band_size)
        if max_bucket is None:
            admitted = new_bands
        else:
            # stored occupancy of ONLY the buckets this batch touches:
            # the stored-bands scan reads two key columns and semi-joins
            # the (small) touched-key set before aggregating. COMMITTED
            # batches only — an orphan directory from a crashed prior
            # attempt must not count toward occupancy (the batch filter
            # is a partition prune, not a data read)
            stored = (
                spark.read.parquet(os.path.join(root, "bands"))
                .filter(F.col("batch") <= meta["max_doc_id"])
                .select("band", "band_key")
            )
            touched = new_bands.select("band", "band_key").distinct()
            occ = (
                stored.join(F.broadcast(touched), ["band", "band_key"])
                .groupBy("band", "band_key")
                .agg(F.count(F.lit(1)).alias("stored_n"))
            )
            w = Window.partitionBy("band", "band_key").orderBy("doc_id")
            admitted = (
                new_bands.withColumn("rn", F.row_number().over(w))
                .join(occ, ["band", "band_key"], "left")
                .filter(
                    F.col("rn") + F.coalesce(F.col("stored_n"), F.lit(0))
                    <= F.lit(int(max_bucket))
                )
                .select("doc_id", "band", "band_key")
            )
        hi = int(lo["hi"])
        new_wide.write.mode("overwrite").parquet(
            os.path.join(root, "wide", f"batch={hi}")
        )
        (
            admitted.repartition("band_key")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(os.path.join(root, "bands", f"batch={hi}"))
        )
        # commit point: only now do readers see the batch
        meta["max_doc_id"] = hi
        _write_index_meta(path, meta)


def compact_ref_index(
    spark, src: str, dst: str, n_files: int = INDEX_FILES
) -> None:
    """Compact a many-batch index into a single-batch layout at ``dst``
    WITHOUT touching corpus text: the stored wide signatures and the
    stored (already witness-capped) band rows are the source of truth
    and are rewritten verbatim into one ``batch=<hi>`` staging per
    table, committed by meta. After ~N daily refreshes the index
    carries N batch directories per table; every open pays the listing
    and footer cost of all of them — compaction is the standard
    maintenance verb that folds them back to one (object-store table
    compaction shape: build the new layout, then repoint the alias;
    ``dst`` is the new alias target).

    Exactly equal to the incremental index by construction: monotonic
    admission keeps precisely the cap-smallest witnesses per bucket —
    the same set a from-scratch cap over the union keeps (pinned by
    refresh ≡ rebuild) — so copying the stored rows IS the rebuild.
    Only committed batches are read (orphans stay behind); a crash
    before the dst meta write leaves dst unreadable and src untouched.

    ``dst`` must be a DIFFERENT path (guarded — ADVICE r16: the dst
    tree is removed before the lazily-read src DataFrames execute, so
    an aliased call would destroy the index it is reading). For
    same-path compaction use :func:`compact_ref_index_inplace`."""
    import json
    import os
    import shutil

    # realpath, not abspath: a symlink alias of the source must not
    # slip past the guard into the rmtree (code-review r17)
    if os.path.realpath(dst) == os.path.realpath(src):
        raise ValueError(
            "compact_ref_index: dst == src would rmtree the source "
            "index before its lazily-read DataFrames execute; use "
            "compact_ref_index_inplace(spark, path) for same-path "
            "compaction (generation layout)"
        )
    meta = dict(read_ref_index_meta(src))
    meta.pop("gen", None)  # dst is written in the flat (gen-less) layout
    hi = int(meta["max_doc_id"])
    wide, bands = read_ref_index(spark, src)
    shutil.rmtree(dst, ignore_errors=True)
    wide.repartition(n_files, "doc_id").write.mode("overwrite").parquet(
        os.path.join(dst, "wide", f"batch={hi}")
    )
    (
        bands.repartition(n_files, "band_key")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(os.path.join(dst, "bands", f"batch={hi}"))
    )
    _write_index_meta(dst, meta)


def compact_ref_index_inplace(
    spark, path: str, n_files: int = INDEX_FILES
) -> None:
    """SAME-PATH compaction via a generation level (VERDICT r16 ask #5):
    fold the index's N batch directories into one ``batch=<hi>`` under
    a NEW ``gen=<G+1>`` directory, then commit by writing ``gen: G+1``
    into the meta. The alias-repoint form (:func:`compact_ref_index`)
    needs the deployment to be able to change the index path; this verb
    compacts where the path IS the configuration.

    Reader safety: reads pin the generation recorded in the meta at
    open time (:func:`read_ref_index`), and this verb never deletes —
    a reader that opened gen=G keeps scanning gen=G's files (still on
    disk) while new opens see gen=G+1; superseded generations are
    reclaimed by the separate :func:`vacuum_ref_index`, to be run once
    in-flight readers have drained (the Delta VACUUM / Iceberg
    expire-snapshots split). Crash before the meta write leaves a
    partial gen=G+1 directory, which is DELETED WHOLESALE on the next
    compaction attempt (ADVICE r17): mode=overwrite alone only
    replaces the exact batch=<hi> subdirectory, so if a refresh raised
    the high-water mark between the crash and the retry, the crashed
    attempt's batch=<old_hi> dirs would survive inside the newly
    committed generation, pass the batch<=hi read filter, and
    resurrect duplicate index rows. The uncommitted gen dir is safe to
    remove under the writer lock — meta.gen < new_gen means no reader
    ever pinned it, and the source DataFrames below read the CURRENT
    generation's files, not new_root. Src rows are rewritten verbatim —
    compaction never re-minhashes text. Legacy flat-layout indexes
    migrate on their first in-place compaction (gen=1; vacuum then
    removes the flat tables). Single-writer (shares the refresh
    lock)."""
    import json
    import os
    import shutil

    with _index_writer_lock(path):
        meta = dict(read_ref_index_meta(path))
        hi = int(meta["max_doc_id"])
        new_gen = int(meta.get("gen", 0)) + 1
        new_root = os.path.join(path, f"gen={new_gen}")
        # clear any crash-leftover partial generation: uncommitted by
        # definition (meta.gen < new_gen), possibly holding stale
        # batch dirs from an attempt made at a LOWER high-water mark
        shutil.rmtree(new_root, ignore_errors=True)
        wide, bands = read_ref_index(spark, path)
        wide.repartition(n_files, "doc_id").write.mode("overwrite").parquet(
            os.path.join(new_root, "wide", f"batch={hi}")
        )
        (
            bands.repartition(n_files, "band_key")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(os.path.join(new_root, "bands", f"batch={hi}"))
        )
        # commit point: new opens now resolve gen=<new_gen>
        meta["gen"] = new_gen
        _write_index_meta(path, meta)


def vacuum_ref_index(path: str) -> None:
    """Reclaim superseded generations left by
    :func:`compact_ref_index_inplace`: every ``gen=<G>`` directory with
    G != meta.gen, plus the legacy flat ``wide``/``bands`` tables once
    a migration committed a generation. DESTRUCTIVE to still-open
    readers pinned on an old generation — run it after in-flight
    readers drain, exactly like Delta VACUUM. "In-flight readers"
    includes RUNNING STREAMS: a streaming gatekeeper
    (streaming/pipeline.py) resolves the index once at stream start and
    scans its pinned generation on every micro-batch, so vacuum between
    a stream's start and stop deletes files under it — compact freely,
    vacuum only between stream restarts. No-op on a flat-layout
    index (nothing is superseded until a compaction commits).

    Takes the writer lock: unserialized, vacuum could read meta.gen=G
    while an in-flight compaction has already written gen=G+1's data
    but not yet committed — the "superseded" check would then rmtree
    the about-to-be-committed generation and the commit would publish
    a pointer to deleted files (code-review r17)."""
    import os
    import shutil

    with _index_writer_lock(path):
        meta = read_ref_index_meta(path)
        if "gen" not in meta:
            return
        cur = f"gen={int(meta['gen'])}"
        for name in os.listdir(path):
            full = os.path.join(path, name)
            if name.startswith("gen=") and name != cur and os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            elif name in ("wide", "bands") and os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)


def minhash_candidates_incremental(
    new_docs: DataFrame,
    ref_docs: DataFrame | None,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
    min_est_jaccard: float = 0.125,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    ref_wide: DataFrame | None = None,
    ref_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental (new-crawl vs existing-corpus) LSH candidates:
    (new_doc, ref_doc, est_jaccard) for banded-signature collisions
    ACROSS the two sets only — the reference corpus is never paired
    against itself, so a daily ingest pays for the batch, not the
    accumulated 100 TB. Caller contract: disjoint doc_id spaces.

    Skew posture: a reference-side bucket above ``max_bucket`` (a
    boilerplate cluster already IN the corpus) keeps only its
    ``max_bucket`` smallest doc_ids as WITNESSES; per-bucket join
    fan-out is ≤ cap × colliding new docs, never |bucket| × new. The
    new side is the small side by assumption and is not capped (every
    new doc must be judged). The cap is a recall/cost TRADE, not a
    free lunch: a retained witness proves only the BAND collision —
    it may still fail the downstream ``min_est_jaccard`` signature
    test, so a new doc whose only true near-duplicates were capped
    out of every shared bucket can be wrongly kept. The oracle twin
    applies the identical cap, so gates stay exact; the recall loss
    is bounded by how often a >cap bucket's kept witnesses are all
    band-coincidences, which shrinks as band_size grows (ADVICE r14).

    ``ref_wide``/``ref_bands`` short-circuit the corpus-side builds:
    production maintains the corpus signature INDEX offline — the wide
    signature table AND the witness-capped band table (see
    :func:`build_ref_index`) — and every ingest batch reuses both, so
    per-batch work is batch-sized plus index hash lookups (the corpus
    is never re-scanned, re-banded, or re-windowed per batch). To omit
    ``ref_docs``, BOTH index halves are required: ``ref_bands`` alone
    cannot serve the signature-agreement join (ADVICE r14). Caller owns
    their lifecycle (not unpersisted here)."""
    from ._scope import checkpointed

    if ref_docs is None and ref_wide is None:
        raise ValueError(
            "minhash_candidates_incremental: ref_docs=None requires ref_wide "
            "(the est_jaccard join needs the corpus signature table; "
            "ref_bands alone only generates candidates). Pass both halves "
            "of build_ref_index's result."
        )

    wn = minhash_signatures_wide(new_docs, num_perm).cache()
    owns_ref = ref_wide is None
    wr = minhash_signatures_wide(ref_docs, num_perm).cache() if owns_ref else ref_wide
    nb = _band_table(wn, num_perm, band_size).withColumnRenamed("doc_id", "new_doc")
    rb = (
        _capped_ref_bands(wr, num_perm, band_size, max_bucket)
        if ref_bands is None
        else ref_bands
    )
    cand = (
        nb.join(rb, ["band", "band_key"])
        .select("new_doc", F.col("doc_id").alias("ref_doc"))
        .distinct()
    )
    wa = wn.select(
        F.col("doc_id").alias("new_doc"),
        *[F.col(f"m{p}").alias(f"a{p}") for p in range(num_perm)],
    )
    wb = wr.select(
        F.col("doc_id").alias("ref_doc"),
        *[F.col(f"m{p}").alias(f"b{p}") for p in range(num_perm)],
    )
    agree = sum(
        ((F.col(f"a{p}") == F.col(f"b{p}")).cast("long") for p in range(num_perm)),
        start=F.lit(0).cast("long"),
    )
    temps = (wn, wr) if owns_ref else (wn,)
    return checkpointed(
        cand.join(wa, "new_doc")
        .join(wb, "ref_doc")
        .select("new_doc", "ref_doc", (agree / num_perm).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_est_jaccard),
        *temps,
    )


def incremental_dedup(
    new_docs: DataFrame,
    ref_docs: DataFrame | None,
    min_est_jaccard: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    ref_wide: DataFrame | None = None,
    ref_bands: DataFrame | None = None,
) -> DataFrame:
    """Per-new-document ingest verdicts against the existing corpus:
    (doc_id, n_ref_matches, best_est_jaccard, keep) — keep = 1 iff no
    reference document matches at ``min_est_jaccard`` or above. The
    ingest-time gatekeeper a continuously-growing corpus runs on every
    new batch (candidates from :func:`minhash_candidates_incremental`,
    one per-new-doc aggregate on top; ``ref_wide``/``ref_bands`` reuse
    the :func:`build_ref_index` offline corpus index)."""
    cand = minhash_candidates_incremental(
        new_docs,
        ref_docs,
        min_est_jaccard=min_est_jaccard,
        max_bucket=max_bucket,
        ref_wide=ref_wide,
        ref_bands=ref_bands,
    )
    per = cand.groupBy("new_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_ref_matches"),
        F.max("est_jaccard").alias("best"),
    )
    return (
        new_docs.select("doc_id")
        .join(per.withColumnRenamed("new_doc", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_ref_matches"), F.lit(0)).cast("long").alias(
                "n_ref_matches"
            ),
            F.round(F.coalesce(F.col("best"), F.lit(0.0)), 6).alias(
                "best_est_jaccard"
            ),
            (F.coalesce(F.col("n_ref_matches"), F.lit(0)) == 0).cast("long").alias(
                "keep"
            ),
        )
    )
