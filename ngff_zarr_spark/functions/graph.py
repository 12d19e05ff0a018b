"""Iterative graph analytics over document-similarity edges.

PageRank here is the engine's template for FIXED-ITERATION distributed
graph algorithms (the connected-components operator in dedup.py covers
the converge-until-stable family): K rounds of
rank←base+d·Σ(in-contributions), each round one join + one aggregate
over the edge table, ranks LOCAL-CHECKPOINTED per round (the same
lineage truncation duplicate_clusters uses). A persist is NOT enough
here: each round references ranks TWICE (contribution source + update
target), so without truncation the LOGICAL plan doubles per round and
Catalyst analysis goes 2^K (measured 1.3→2→3.7→10→30 s across five
rounds on a 25-edge graph) — the planning-side sibling of the
broadcast-feedback trap documented in functions/bpe.py. No scalar ever
leaves the cluster.

All arithmetic is INTEGER micro-units (the lm.py convention): ranks
live in units of 10⁻¹² of total mass, contributions are floor
divisions, and the damping multiply is ·85//100 — BIGINT-exact in both
engines, so the K-stage DuckDB oracle matches bit-for-bit regardless
of floating summation order (a float formulation drifts in the last
ulp across engines as K grows). The deliberate costs: dangling-node
mass is dropped (documented, standard in simplified PageRank) and
floor division sheds ≤1 micro-unit per contribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12   # total initial mass in micro-units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85
PR_ITERS = 5


def pagerank(
    docs: DataFrame,
    edges: DataFrame,
    n_iters: int = PR_ITERS,
) -> DataFrame:
    """(doc_id, rank_micro) after ``n_iters`` damped PageRank rounds
    over the UNDIRECTED ``edges`` (doc_a, doc_b) — each edge walks both
    ways. Documents with no edges hold the base rank throughout."""
    nodes = docs.select("doc_id")
    und = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # persisted for the K rounds only — released before returning
    # (every round's ranks is an eager localCheckpoint, so by the time
    # we return, ed has been fully consumed; functions/_scope.py)
    ed = und.join(deg, "src").persist()

    n_total = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    # every division is INTEGER `div` (Spark) / `//` (DuckDB): a
    # double `/` + cast would TRUNCATE in Spark but ROUND in DuckDB —
    # a guaranteed cross-engine mismatch on non-integral quotients
    ranks = nodes.crossJoin(F.broadcast(n_total)).select(
        "doc_id",
        F.expr(f"CAST({PR_SCALE} div n_total AS BIGINT)").alias("r"),
        F.expr(
            f"CAST(({PR_DAMP_DEN - PR_DAMP_NUM} * ({PR_SCALE} div n_total))"
            f" div {PR_DAMP_DEN} AS BIGINT)"
        ).alias("base"),
    ).localCheckpoint()

    for _ in range(int(n_iters)):
        contrib = (
            ranks.join(ed, ranks.doc_id == ed.src)
            .select("dst", F.expr("CAST(r div deg AS BIGINT)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        # localCheckpoint (eager) truncates the logical plan to a leaf —
        # the double self-reference above would otherwise double the
        # plan tree every round (module docstring)
        ranks = (
            ranks.join(contrib, ranks.doc_id == contrib.dst, "left_outer")
            .select(
                "doc_id",
                F.expr(
                    f"CAST(base + ({PR_DAMP_NUM} * COALESCE(s, 0))"
                    f" div {PR_DAMP_DEN} AS BIGINT)"
                ).alias("r"),
                "base",
            )
            .localCheckpoint()
        )
    ed.unpersist()
    return ranks.select("doc_id", F.col("r").alias("rank_micro"))


def triangle_stats(docs: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-document triangle count and local clustering coefficient
    over the UNDIRECTED candidate graph: (doc_id, deg, n_tri,
    clustering) for every document (isolated docs report 0/0/0.0).
    Triangle density separates true duplicate clusters (near-cliques,
    clustering → 1) from chains of coincidental band collisions
    (clustering → 0) — the standard graph-quality signal a dedup pass
    inspects before trusting its connected components.

    100 TB posture — this is the degree-ordered wedge join (Cohen 2009
    "Graph twiddling in a MapReduce world"; also Suri & Vassilvitskii
    2011): every edge is ORIENTED from its lower-(deg, id) endpoint to
    the higher, wedges are enumerated by self-joining oriented edges on
    their source, and a wedge counts iff its closing edge exists. The
    orientation bounds out-degree by O(√m) even on power-law hubs — a
    celebrity node of degree 10⁶ contributes wedges only through its
    LOW-degree neighbors — so the wedge join cannot quadratically
    explode the way a naive neighbor-pair enumeration would. Each
    triangle is emitted exactly once (its minimum-order vertex owns
    it); per-node counts come from one explode of the 3 corners.
    Everything is joins + aggregates on 64-bit ids: no UDFs, no
    collects, no iteration.
    """
    from ._scope import checkpointed

    # canon/oriented are each consumed by several joins below; persist
    # (the pagerank convention) so the candidate-derivation subtree
    # plans ONCE instead of being inlined per consumer — unpersisted,
    # the physical plan carries ~6 copies of the upstream MinHash
    # pipeline (measured: 56 exchanges vs 13). Both caches are scoped
    # to this call: the returned per-doc stats are checkpointed and
    # the temps released (functions/_scope.py).
    canon = (
        edges.select(
            F.least("doc_a", "doc_b").alias("a"),
            F.greatest("doc_a", "doc_b").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        canon.select(F.col("a").alias("doc_id"))
        .unionAll(canon.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    da = deg.select(F.col("doc_id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("doc_id").alias("b"), F.col("deg").alias("degb"))
    # orient low-(deg, id) -> high-(deg, id); ties impossible beyond id
    lower_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        canon.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("dega")).otherwise(F.col("degb")).alias(
                "dsrc"
            ),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(lower_first, F.col("degb")).otherwise(F.col("dega")).alias(
                "ddst"
            ),
        )
        .persist()
    )
    e1 = oriented.select("src", F.col("dst").alias("v"), F.col("ddst").alias("dv"))
    e2 = oriented.select("src", F.col("dst").alias("w"), F.col("ddst").alias("dw"))
    wedges = e1.join(e2, "src").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tris = wedges.join(closing, ["v", "w"]).select("src", "v", "w")
    per_node = (
        tris.select(F.explode(F.array("src", "v", "w")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    result = (
        docs.select("doc_id")
        .join(deg, "doc_id", "left")
        .join(per_node, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    2 * F.coalesce(F.col("n_tri"), F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("clustering"),
        )
    )
    return checkpointed(result, canon, oriented)
