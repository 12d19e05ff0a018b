"""Cache-scope hygiene for operators that persist intermediates.

Problem (VERDICT r13 ask #6): an operator that ``persist()``s a
subtree consumed by several branches of its plan — the right move for
plan-dedup (see graph.triangle_stats: 56 → 13 exchanges) — but returns
its result LAZILY leaves the cache pinned for the rest of the session:
explicit persists are never garbage-collected, so a long-lived
interactive session accumulates dead executor memory with every query.

Fix: convert the explicit persist into a GC-MANAGED leaf before
returning. ``localCheckpoint()`` (eager) materializes the frame into
executor block storage, truncates lineage to a leaf, and — unlike
``persist()`` — its blocks are released by Spark's ContextCleaner as
soon as the checkpointed plan is no longer referenced. The query's
result stays valid and reusable; nothing outlives its consumers.

Two shapes:

- :func:`checkpointed` — the RESULT is the small side (pairs,
  per-group stats): checkpoint it eagerly, then drop every temp cache
  in ``finally``-style immediately after. Total work is unchanged when
  the caller consumes the result once (the usual gate shape); repeat
  consumers get the leaf for free.
- :func:`handoff` — the TEMP is the small side and the result is
  corpus-sized (e.g. BPE's word vocabulary feeding a full-corpus
  tokenize): checkpoint the temp, release its explicit cache, and let
  downstream reference the leaf. Pinned memory becomes temp-sized and
  GC-scoped instead of permanent.

Caveat (same trade the per-round PageRank checkpoints already take):
localCheckpoint blocks are non-replicated — an executor loss makes the
truncated lineage unrecoverable and fails the job instead of
recomputing. That is the documented cost of lineage truncation here;
reliable ``checkpoint()`` to a cluster FS is the drop-in upgrade when
running wide jobs on preemptible fleets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Plan-inspection escape: checkpoint leaves hide the operator's plan
# from .explain(), so plan-shape tests flip this to True (monkeypatch)
# to receive the LAZY plan instead. Production code never touches it —
# with it on, temps stay pinned and the caller owns the cleanup
# (tests clearCache()).
PLAN_INSPECTION = False


def checkpointed(result: DataFrame, *temps: DataFrame) -> DataFrame:
    """Eagerly materialize ``result`` as a lineage-truncated leaf,
    then release the ``temps``' explicit caches. Returns the leaf.

    EAGER-EXECUTION CONTRACT (ADVICE r14): operators returning through
    here (minhash_candidates, triangle_stats, lm_perplexity,
    exact_percentiles_bucketed, ...) execute AT CONSTRUCTION, not at
    first action. Two consequences for composing callers:

    - downstream filters/projections do NOT push into the operator's
      plan — the full result materializes first. When you only need a
      slice, pre-filter the INPUTS (doc/event tables), not the output.
    - the leaf's blocks are non-replicated: an executor loss after
      construction fails consuming jobs instead of recomputing (the
      module-docstring trade; reliable checkpointing is the upgrade).

    The results these operators return are deliberately the SMALL side
    (pairs, per-group stats, model rows), so eager materialization
    costs one bounded job — that is why the trade is on by default
    rather than exposed as a flag on every operator."""
    if PLAN_INSPECTION:
        return result
    out = result.localCheckpoint()
    for t in temps:
        t.unpersist()
    return out


def handoff(temp: DataFrame) -> DataFrame:
    """Swap an explicitly persisted ``temp`` for a GC-managed
    checkpoint leaf: downstream plans reference the leaf; the explicit
    cache is released immediately."""
    if PLAN_INSPECTION:
        return temp
    out = temp.localCheckpoint()
    temp.unpersist()
    return out
