"""Distributed BPE (byte-pair-encoding) merge learning and subword
segmentation — tokenizer TRAINING as a Spark job.

The classic Sennrich formulation operates on the word-count table, not
the raw corpus: the corpus collapses to (word, count) once (the only
corpus-sized aggregate), and every merge iteration then runs over the
vocabulary — orders of magnitude smaller than the corpus and exactly
the shape that keeps 100 TB training tractable. Each of the K
iterations is: (1) adjacent-symbol pair counts weighted by word count
(one hash aggregate over the vocab), (2) global argmax pair with a
deterministic tie-break (count desc, left asc, right asc — a 1-row
reduction broadcast back), (3) apply the merge to every word's symbol
sequence.

Symbol sequences are SEP-wrapped strings (``SEP s SEP`` per symbol,
concatenated), so applying a merge is ONE literal ``replace`` — no
UDF, no per-row Python. Left-to-right non-overlapping literal
replacement is exactly the greedy BPE merge application, and Spark's
``replace`` and DuckDB's ``replace`` share those semantics, which is
what makes the K-stage DuckDB oracle possible. Words containing SEP or
the sentinel byte are excluded up front (both engines); real corpora
never contain the 0x1f/0x02 control bytes.

Each iteration's argmax is COLLECTED to the driver (one row per
iteration — the merge table IS the trained model, driver-sized by
definition, exactly like the k-means centroid collects the IVF build
uses). Embedding the winning pair as a literal keeps the vocab plan a
LINEAR chain of replaces; routing it through a broadcast join instead
nests the whole previous plan inside every broadcast subquery and the
plan tree doubles per iteration (measured: analysis time ~2× per added
merge — unusable past K≈6). The vocab is persisted per iteration so
each argmax job scans only the current table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import spread, tokens_col

SEP = "\x1f"        # symbol delimiter (unit separator)
SENTINEL = "\x02"   # never-matching merge when pairs are exhausted
BPE_MERGES = 8      # default merge-learning iterations


def _word_counts(docs: DataFrame, per_doc: bool) -> DataFrame:
    keys = ["doc_id", "word"] if per_doc else ["word"]
    return (
        spread(docs)
        .select("doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("word"))
        .filter(
            ~F.col("word").contains(SEP) & ~F.col("word").contains(SENTINEL)
        )
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _initial_seq() -> F.Column:
    chars = F.regexp_extract_all(F.col("word"), F.lit("."), 0)
    return F.concat(
        F.lit(SEP), F.array_join(chars, SEP + SEP), F.lit(SEP)
    ).alias("seq")


def _syms(seq: F.Column) -> F.Column:
    return F.split(F.btrim(seq, F.lit(SEP)), SEP + SEP)


def _learn(docs: DataFrame, n_merges: int, need_vocab: bool = True):
    """Run the merge-learning loop; returns (merge_rows, final_vocab)
    where merge_rows is a driver-side list of (step, left, right,
    pair_count) — exhausted steps carry the sentinel with
    pair_count = -1 and are filtered by the public wrappers — and
    final_vocab is the (word, cnt, seq) DataFrame after all merges
    (None when ``need_vocab=False`` — bpe_learn only consumes the
    merge table, so it skips the final vocab-sized checkpoint job).

    Job-count posture (r19, guide §1.2 "fewer passes"): each iteration
    runs ONE vocab-sized job — the argmax collect — instead of the
    former argmax + explicit ``count()`` materialization pair. The
    merge-applied generation is persisted LAZILY; the NEXT iteration's
    argmax (or the final handoff) materializes it while its parent
    generation is still cached, and the parent is released immediately
    after that materialization. Two generations stay pinned at any
    moment, exactly as before; the per-iteration job count halves
    (2K+1 → K+1 vocab-sized jobs for K merges)."""
    words = _word_counts(docs, per_doc=False).select(
        "word", "cnt", _initial_seq()
    ).persist()
    merge_rows = []
    prev = None  # parent generation: cached until `words` materializes
    for step in range(1, int(n_merges) + 1):
        sy = _syms(F.col("seq"))
        n = F.size(sy)
        prs = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.struct(
                    F.element_at(sy, (i + 1).cast("int")).alias("la"),
                    F.element_at(sy, (i + 2).cast("int")).alias("rb"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<la:string,rb:string>>"))
        top = (
            words.select("cnt", F.explode(prs).alias("pr"))
            .groupBy(F.col("pr.la").alias("la"), F.col("pr.rb").alias("rb"))
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), F.col("la").asc(), F.col("rb").asc())
            .limit(1)
            .collect()
        )
        # the argmax job materialized `words`' cache (its first scan);
        # the parent generation's cache is now dead weight — release it
        if prev is not None:
            prev.unpersist()
            prev = None
        la, rb, c = (
            (top[0].la, top[0].rb, int(top[0].c)) if top else (SENTINEL, SENTINEL, -1)
        )
        merge_rows.append((step, la, rb, c))
        if c <= 0:
            break  # pairs exhausted — later steps would all be sentinels
        nxt = words.select(
            "word",
            "cnt",
            F.replace(
                F.col("seq"),
                F.lit(SEP + la + SEP + SEP + rb + SEP),
                F.lit(SEP + la + rb + SEP),
            ).alias("seq"),
        ).persist()  # lazy: the next argmax/handoff materializes it
        prev, words = words, nxt
    if not need_vocab:
        words.unpersist()
        if prev is not None:
            prev.unpersist()
        return merge_rows, None
    from ._scope import handoff

    # swap the final vocab's explicit persist for a GC-managed leaf:
    # the vocab is model-sized (distinct words), downstream consumers
    # (subword stats, encode) reference the leaf, and nothing stays
    # pinned once the caller's result is gone. handoff() materializes
    # the (possibly still-lazy) final generation while its parent is
    # cached; the parent is released right after.
    leaf = handoff(words)
    if prev is not None:
        prev.unpersist()
    return merge_rows, leaf


def bpe_learn(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """The learned merge table: (step, left, right, pair_count),
    ordered by training step. Steps past pair exhaustion (no adjacent
    pair left anywhere in the vocab) are dropped."""
    rows, _ = _learn(docs, n_merges, need_vocab=False)
    return docs.sparkSession.createDataFrame(
        [r for r in rows if r[3] > 0],
        "step long, left string, right string, pair_count long",
    )


def bpe_subword_stats(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Apply the learned tokenizer back to the corpus: (doc_id,
    n_words, n_subwords) where n_subwords is the document's token count
    under the K-merge BPE vocabulary. One broadcast-or-shuffle join of
    the per-document word counts against the final (word → segment
    count) vocab — the corpus text is never rescanned per merge."""
    _, vocab = _learn(docs, n_merges)
    seg = vocab.select("word", F.size(_syms(F.col("seq"))).cast("long").alias("n_syms"))
    dwc = _word_counts(docs, per_doc=True)
    return (
        dwc.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_syms")).cast("long").alias("n_subwords"),
        )
    )


def bpe_encode(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Tokenize the corpus with the learned vocabulary: one row per
    emitted subword — (doc_id, word_idx, sym_idx, token_id, token),
    where word_idx is the word's position in the document, sym_idx the
    subword's position within the word, and token_id the vocabulary id
    (alphabetical rank over the final symbol set — deterministic and
    oracle-reproducible; a frequency-ranked id table drops in the same
    way).

    Encoding is ONE join of the corpus's positional words against the
    (vocab-sized) final segmentation, then a posexplode — text is
    never re-merged per document, which is the point of the word-count
    formulation: the expensive K-round merge application happened once
    per DISTINCT word."""
    from pyspark.sql import Window

    _, vocab = _learn(docs, n_merges)
    seg = vocab.select("word", _syms(F.col("seq")).alias("syms"))
    ids = (
        seg.select(F.explode("syms").alias("token"))
        .distinct()
        .withColumn(
            "token_id",
            # vocab-sized table (bounded by construction); the
            # non-foldable constant-zero partition (self-subtraction —
            # x*0 IS folded by the optimizer, x-x is not) keeps the
            # "No Partition Defined" warning out of the logs
            F.row_number()
            .over(
                Window.partitionBy(
                    F.length("token") - F.length("token")
                ).orderBy(F.col("token").asc())
            )
            .cast("long"),
        )
    )
    dw = (
        spread(docs)
        .select(
            "doc_id",
            F.posexplode(tokens_col(F.lower(F.col("text")))).alias("word_idx", "word"),
        )
        .filter(~F.col("word").contains(SEP) & ~F.col("word").contains(SENTINEL))
    )
    return (
        dw.join(seg, "word")
        .select(
            "doc_id",
            F.col("word_idx").cast("long").alias("word_idx"),
            F.posexplode("syms").alias("sym_idx", "token"),
        )
        .select(
            "doc_id",
            "word_idx",
            F.col("sym_idx").cast("long").alias("sym_idx"),
            "token",
        )
        .join(F.broadcast(ids), "token")
        .select("doc_id", "word_idx", "sym_idx", "token_id", "token")
    )
