"""Deterministic sequence packing for training-data pipelines.

Packing concatenates documents into fixed-token-budget training
sequences. The classical first-fit bin packer is inherently sequential;
the scalable, reproducible variant used here is HASHED-BUCKET GREEDY
packing: docs are routed to ``n_buckets`` independent streams by a
content-keyed hash, ordered deterministically inside each stream
(hash, then id — a uniform shuffle without RNG state), and cut into
packs by cumulative token count — ``pack_id`` advances whenever the
running total would exceed the budget. A doc longer than the budget
occupies a pack of its own (truncation is the trainer's call, not the
packer's).

The pack cut uses the BLOCK contract: a doc belongs to the pack its
starting token offset falls in — ``pack_id = floor(start_offset /
budget)`` over budget-capped token counts. A pack may overhang its
budget by at most one straddling doc (trainers treat the overhang as
the cross-pack continuation segment, exactly as with fixed-stride
chunking of a concatenated stream). The closed form makes the
assignment a pure window expression, identical in Spark and the ANSI
SQL oracle — no sequential first-fit state anywhere.

100 TB posture: one hash-partitioned window per bucket (the ONLY
shuffle), cumulative sum inside the window, per-row arithmetic for the
pack cut — no driver state, no RNG, rerun-stable at any parallelism.
``n_buckets`` should be sized to executor count; each bucket's window
is independent, so skew is bounded by the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import h64, tokens_col

DEFAULT_BUDGET = 2048
DEFAULT_BUCKETS = 32


def pack_sequences(
    docs: DataFrame,
    budget: int = DEFAULT_BUDGET,
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "pack",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each doc a (bucket, pack_id, pack_offset) under the
    block-packing contract above. ``pack_offset`` is the doc's starting
    token offset inside its bucket stream — the trainer's seek
    position; ``n_tokens`` is capped at ``budget`` for the pack
    arithmetic but reported raw.

    Scale posture: the cumulative sum is inherently sequential per
    bucket, so per-task work is corpus_size / ``n_buckets`` — the knob
    scales it (hash-uniform buckets can't be hot; raise ``n_buckets``
    with the corpus). Pack ids are bucket-local, so the choice of
    ``n_buckets`` never changes WHICH docs share a pack stream's
    arithmetic, only the parallelism."""
    h = h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    toks = F.size(tokens_col(F.col("text"))).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
        F.pmod(h, F.lit(n_buckets)).cast("long").alias("bucket"),
        h.alias("_h"),
    )
    capped = F.least(F.col("n_tokens"), F.lit(budget))
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("_h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(capped).over(w)
    return base.select(
        "doc_id",
        "bucket",
        "n_tokens",
        (cum - capped).alias("pack_offset"),
        F.floor((cum - capped) / budget).cast("long").alias("pack_id"),
    )


def pack_stats(docs: DataFrame, **kwargs) -> DataFrame:
    """Per-(bucket, pack) roll-up: docs per pack and token fill — the
    packing-efficiency table a pipeline prints before a training run."""
    budget = kwargs.get("budget", DEFAULT_BUDGET)
    packed = pack_sequences(docs, **kwargs)
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.least(F.col("n_tokens"), F.lit(budget)))
            .cast("long")
            .alias("n_tokens_packed"),
        )
    )
