"""Cross-corpus duplicated-substring span detection — the Spark-first
take on suffix-array substring dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better").

A token position is COVERED if the n-token window starting there
occurs at least twice in the whole corpus (any document, any
position). Covered windows are merged per document into maximal spans
— the byte ranges a substring-dedup pass would cut. Unlike a true
suffix array this fixes the match length at ``n`` (the standard
minimum-match threshold; suffix arrays find longer matches, but every
such match is a union of length-n windows, so span RECALL is
identical — only per-span extents beyond n merge differently).

100 TB posture, and why this beats a distributed suffix array:
  * one explode to (doc, pos, gram-hash) — the shuffle carries 64-bit
    hashes + positions, never text;
  * the duplicate test is a gram-keyed count aggregate joined back to
    the position table: each position row matches EXACTLY ONE count
    row, so hot grams (boilerplate that appears millions of times)
    cannot blow up the join the way pairwise candidate joins do —
    output cardinality == input cardinality, no skew cap needed;
  * span merging is a per-doc window (lag/cummax + running span id) —
    linear, one shuffle keyed by doc.
A distributed suffix array needs global sort of all suffixes (a
corpus-sized range shuffle per round); this is two hash shuffles and
an id-keyed window, and it streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _norm_text
from .text import h64, spread, tokens_col

SPAN_N = 4  # minimum duplicated-window length in tokens


def _positioned_grams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, pos, gh): the h64 of the n-token window at each token
    position. posexplode keeps the start offset the span merge needs."""
    toksed = spread(docs).select(
        "doc_id", tokens_col(_norm_text(F.col("text"))).alias("toks")
    )
    toks = F.col("toks")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    grams = F.when(
        cnt >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toksed.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    ).select("doc_id", "pos", h64(F.col("gram")).alias("gh"))


def duplicated_spans(docs: DataFrame, n: int = SPAN_N) -> DataFrame:
    """Maximal per-document spans of tokens covered by corpus-duplicated
    n-grams: (doc_id, span_start, span_end, n_tokens, n_windows);
    span_end is inclusive, token units."""
    pg = _positioned_grams(docs, n)
    df_counts = pg.groupBy("gh").agg(F.count(F.lit(1)).alias("c"))
    dup = (
        pg.join(df_counts.filter(F.col("c") >= 2), "gh")
        .select("doc_id", "pos")
    )
    # two stacked windows over the same (doc_id, pos) ordering — Spark
    # reuses the sort, so this is one shuffle, not two
    w = Window.partitionBy("doc_id").orderBy("pos")
    marked = dup.withColumn(
        "prev_end",
        F.max(F.col("pos") + n - 1).over(w.rowsBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "new_span",
        F.when(
            F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end") + 1), 1
        ).otherwise(0),
    )
    spans = marked.withColumn(
        "span_id",
        F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return spans.groupBy("doc_id", "span_id").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + n - 1).cast("long").alias("span_end"),
        (F.max("pos") + n - F.min("pos")).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
    ).select("doc_id", "span_start", "span_end", "n_tokens", "n_windows")


def duplicated_token_fraction(docs: DataFrame, n: int = SPAN_N) -> DataFrame:
    """Per-document share of tokens inside duplicated spans — the
    corpus-contamination scalar a dedup pass reports before cutting."""
    spans = duplicated_spans(docs, n).groupBy("doc_id").agg(
        F.sum("n_tokens").alias("dup_tokens")
    )
    totals = spread(docs).select(
        "doc_id", F.size(tokens_col(_norm_text(F.col("text")))).cast("long").alias("total")
    )
    return totals.join(spans, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        "total",
        F.round(
            F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("total"), 6
        ).alias("dup_frac"),
    )
