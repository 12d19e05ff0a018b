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
    return ranks.select("doc_id", F.col("r").alias("rank_micro"))
