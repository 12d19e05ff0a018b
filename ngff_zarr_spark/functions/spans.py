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


def _toksed(docs: DataFrame) -> DataFrame:
    """(doc_id, toks): the normalized token array — the shared
    tokenization every gram/total derivation in this module starts
    from."""
    return spread(docs).select(
        "doc_id", tokens_col(_norm_text(F.col("text"))).alias("toks")
    )


def _positioned_grams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, pos, gh): the h64 of the n-token window at each token
    position. posexplode keeps the start offset the span merge needs."""
    return _grams_of(_toksed(docs), n)


def _grams_of(toksed: DataFrame, n: int) -> DataFrame:
    """Positioned grams from a prebuilt (doc_id, toks) frame."""
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
    # r19 (guide §2.4): the corpus frequency test is a WHOLE-PARTITION
    # window over gh, not an aggregate joined back onto its own input —
    # the join shape computed the tokenize→gram pipeline twice (the
    # aggregate branch and the probe branch never canonicalize
    # together) and shuffled pg twice; the window shuffles pg by gh
    # exactly once. Hot grams concentrate identically either way (the
    # SMJ probe already shipped every (gh, ·) row to gh's partition)
    # and WindowExec spills per-group state to disk.
    pg = _positioned_grams(docs, n)
    dup = (
        pg.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("gh"))
        )
        .filter(F.col("c") >= 2)
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


def duplicated_span_removal(docs: DataFrame, n: int = SPAN_N) -> DataFrame:
    """Occurrence-level removal verdicts for corpus-duplicated windows —
    the KEEP-ONE policy :func:`duplicated_spans` deliberately doesn't
    take. ``duplicated_spans`` marks every position covered by a
    repeated n-gram (both copies of a duplicated phrase are "covered");
    an actual substring-dedup pass (reference point: Lee et al. 2022
    keep one occurrence of each duplicated sequence) must RETAIN one
    canonical copy or the text disappears from the corpus entirely.

    Returns one row per occurrence of a corpus-repeated window:
    (doc_id, pos, gh, n_occ, rep_doc, rep_pos, is_canonical) — the
    canonical witness is the lexicographically smallest (doc_id, pos)
    holding that window's content, and ``is_canonical`` marks the one
    row a removal pass keeps; everything else is the cut set.

    100 TB posture (same as duplicated_spans, one aggregate wider):
    count and witness are whole-partition windows over the gram hash —
    one shuffle of the position table, output cardinality == input
    cardinality by construction, boilerplate grams spill per-group
    window state instead of blowing up a join. Only hashes and
    positions shuffle, never text."""
    # r19 (guide §2.4): count + witness as whole-partition windows over
    # gh instead of a gram-keyed aggregate joined back onto its own
    # input — same single-shuffle rationale as duplicated_spans above,
    # one aggregate wider (min(struct) rides the same window frame).
    wgh = Window.partitionBy("gh")
    pg = _positioned_grams(docs, n).withColumn(
        "n_occ", F.count(F.lit(1)).over(wgh).cast("long")
    ).withColumn("wit", F.min(F.struct("doc_id", "pos")).over(wgh))
    return pg.filter(F.col("n_occ") >= 2).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "gh",
        "n_occ",
        F.col("wit.doc_id").alias("rep_doc"),
        F.col("wit.pos").cast("long").alias("rep_pos"),
        (
            (F.col("doc_id") == F.col("wit.doc_id"))
            & (F.col("pos") == F.col("wit.pos"))
        ).alias("is_canonical"),
    )


def substring_dedup_stats(docs: DataFrame, n: int = SPAN_N) -> DataFrame:
    """Per-document summary of what a keep-one substring-dedup pass
    would actually CUT: (doc_id, n_tokens, n_windows, n_rep,
    cut_tokens, cut_frac). ``n_rep`` counts this doc's removal-set
    windows (repeated windows minus canonical keepers), ``cut_tokens``
    the size of the union of their [pos, pos+n) token intervals, and
    ``cut_frac = cut_tokens / n_tokens`` rounded 6dp. Distinct from
    :func:`duplicated_token_fraction`, which reports tokens that are
    duplicated ANYWHERE (canonical copies included) — the contamination
    signal; this is the deletion budget.

    The interval union is closed-form on the per-doc sorted position
    array: consecutive removal positions p_i, p_{i+1} contribute
    min(n, p_{i+1} − p_i) and the last contributes n — one
    collect_list + higher-order aggregate, per-task state bounded by
    DOCUMENT length (the engine's standing per-doc bound, same as
    shingling/winnowing), never corpus size. Exactly equal to merging
    maximal spans first (pytest-pinned against duplicated_spans on the
    all-occurrences set)."""
    drop = duplicated_span_removal(docs, n).filter(~F.col("is_canonical"))
    per_doc = drop.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rep"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    m = F.size(F.col("ps"))
    gaps = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.when(
            i == m, F.lit(int(n)).cast("long")
        ).otherwise(
            F.least(
                F.lit(int(n)).cast("long"),
                F.element_at(F.col("ps"), (i + 1).cast("int"))
                - F.element_at(F.col("ps"), i.cast("int")),
            )
        ),
    )
    per_doc = per_doc.select(
        "doc_id", "n_rep",
        F.aggregate(gaps, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "cut_tokens"
        ),
    )
    totals = spread(docs).select(
        "doc_id",
        F.size(tokens_col(_norm_text(F.col("text")))).cast("long").alias("n_tokens"),
    ).select(
        "doc_id", "n_tokens",
        F.greatest(F.col("n_tokens") - (n - 1), F.lit(0)).cast("long").alias(
            "n_windows"
        ),
    )
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id", "n_tokens", "n_windows",
        F.coalesce(F.col("n_rep"), F.lit(0)).cast("long").alias("n_rep"),
        F.coalesce(F.col("cut_tokens"), F.lit(0)).cast("long").alias("cut_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.coalesce(F.col("cut_tokens"), F.lit(0)) / F.col("n_tokens"), 6
            ),
        ).otherwise(F.lit(0.0)).alias("cut_frac"),
    )


LINE_LEN = 6  # tokens per line-block when the corpus carries no newlines


def line_dedup(
    docs: DataFrame,
    line_len: int = LINE_LEN,
    max_df: int = 1,
    delimiter: str | None = None,
) -> DataFrame:
    """C4-style line-level deduplication (Raffel et al. 2020 drop any
    line that occurs verbatim in more than one document; reference
    analog: the corpus-hygiene role of the dedup family): documents are
    segmented into lines, every line whose distinct-document frequency
    exceeds ``max_df`` is cut from EVERY document holding it, and the
    surviving lines are re-joined into the cleaned text.

    With ``delimiter`` set (e.g. ``"\\n"`` — C4's actual rule), lines
    are the VERBATIM delimiter-separated segments of ``text`` and the
    survivors re-join with the same delimiter. With ``delimiter=None``
    (default, for corpora that carry no newlines like the synthetic
    documents table) consecutive ``line_len``-token blocks of the
    normalized token stream stand in for line boundaries and survivors
    re-join with single spaces — the same pipeline either way.

    Returns (doc_id, clean_text, n_lines, n_kept, n_dropped) — one row
    per input document that produced at least one line/block,
    clean_text == '' when everything was cut (the caller decides
    whether empty docs survive, mirroring C4's drop-empty follow-up).
    A token-less document under ``delimiter=None`` segments into zero
    blocks and is absent from the output — there is nothing to clean
    (r18 review: with a delimiter, splitting '' yields one empty line,
    so such docs DO surface in that mode).

    100 TB posture:
      * block construction is a pure projection over the token array
        (slice + array_join inside codegen) — no explode-regroup
        round-trip, no shuffle until the frequency aggregate;
      * the duplicate test shuffles each block row once by its 64-bit
        line hash and attaches the distinct-document frequency with
        whole-partition windows (the same cardinality-preserving,
        single-shuffle shape as duplicated_spans — a boilerplate line
        repeated a million times spills one window group, it cannot
        blow up a join);
      * reassembly is one groupBy(doc_id) whose state is the document
        itself — bounded by the longest document, not the corpus.
    """
    if delimiter is not None:
        import re as _re

        joiner = delimiter
        blocks = (
            spread(docs)
            .select(
                "doc_id",
                F.posexplode(
                    F.split(F.col("text"), _re.escape(delimiter), -1)
                ).alias("blk", "line"),
            )
            .withColumn("lh", h64(F.col("line")))
        )
    else:
        joiner = " "
        toks = F.col("toks")
        n_blocks = F.ceil(F.size(toks) / F.lit(line_len)).cast("int")
        blocks_col = F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_blocks - 1, F.lit(0))),
                lambda b: F.array_join(F.slice(toks, b * line_len + 1, line_len), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        blocks = (
            spread(docs)
            .select("doc_id", tokens_col(_norm_text(F.col("text"))).alias("toks"))
            .select("doc_id", F.posexplode(blocks_col).alias("blk", "line"))
            .withColumn("lh", h64(F.col("line")))
        )
    # r19 (guide §2.4): the distinct-document frequency is computed as
    # two windows over ONE explicit lh exchange instead of a two-level
    # aggregate joined back onto its own input (which computed the
    # segment pipeline twice and shuffled blocks twice). Window 1 flags
    # one row per (lh, doc_id) pair; window 2 sums the flags per lh —
    # hashpartitioning(lh) satisfies both, and the (lh, doc_id, blk)
    # sort serves both frames, so the plan is one Exchange + one Sort.
    flagged = (
        blocks.repartition("lh")
        .withColumn(
            "df_first",
            (
                F.row_number().over(
                    Window.partitionBy("lh", "doc_id").orderBy("blk")
                )
                == 1
            ).cast("long"),
        )
        .withColumn(
            "line_df", F.sum("df_first").over(Window.partitionBy("lh"))
        )
        .withColumn("keep", F.col("line_df") <= max_df)
    )
    kept_struct = F.when(F.col("keep"), F.struct("blk", "line"))
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            joiner,
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).cast("long").alias("n_dropped"),
    )


CONTAM_N = 13  # GPT-3's decontamination match length (13-grams)


def contamination_scan(docs: DataFrame, bench: DataFrame, n: int = CONTAM_N) -> DataFrame:
    """Benchmark decontamination scan (Brown et al. 2020 Appendix C —
    the 13-gram rule; the train/test-overlap audit every pretraining
    corpus needs): flag each training document that shares at least one
    verbatim normalized n-gram with a held-out benchmark set, and
    report how much of it overlaps.

    Returns (doc_id, n_grams, n_hit, hit_frac, dirty) — one row per
    training document; ``n_hit`` counts corpus gram POSITIONS matching
    any benchmark gram, ``dirty`` = 1 when any position matched.

    100 TB posture:
      * the benchmark gram set is benchmark-sized (few MB for any real
        eval suite): distinct 64-bit hashes BROADCAST to every task —
        the corpus never shuffles for the membership test;
      * the corpus side is one projection + posexplode to (doc, gh) and
        one per-doc aggregate; the broadcast join is cardinality-
        preserving (the bench set is distinct, each position matches at
        most once) — a boilerplate gram shared by millions of documents
        multiplies nothing;
      * text never leaves its scan: only 64-bit hashes move.
    """
    # r19 audited, kept composed (guide §1.2): a fused one-pass variant
    # (gram rows carrying the per-doc total through a left join into a
    # single aggregate) measured ~40% SLOWER solo — it pushes EVERY
    # gram row through the per-doc aggregate, where this shape's inner
    # broadcast join drops non-hits before any aggregation and totals
    # is a tokenize-only projection with no explode. Two cheap passes
    # beat one expensive one here.
    hits = contamination_hits(docs, bench, n)
    return compose_contamination(contamination_totals(docs, n), hits)


def contamination_hits(docs: DataFrame, bench: DataFrame, n: int = CONTAM_N) -> DataFrame:
    """(doc_id, n_hit) for documents with ≥1 benchmark-gram position —
    the stateful half of the scan (the streaming twin folds exactly
    this aggregate across micro-batches)."""
    bg = _positioned_grams(bench, n).select("gh").distinct()
    return (
        _positioned_grams(docs, n)
        .join(F.broadcast(bg), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )


def contamination_totals(docs: DataFrame, n: int = CONTAM_N) -> DataFrame:
    """(doc_id, n_grams): per-doc gram-position counts — a stateless
    projection."""
    return spread(docs).select(
        "doc_id",
        F.greatest(
            F.size(tokens_col(_norm_text(F.col("text")))) - (n - 1), F.lit(0)
        ).cast("long").alias("n_grams"),
    )


def compose_contamination(totals: DataFrame, hits: DataFrame) -> DataFrame:
    """totals ⟕ hits → the scan's public row shape."""
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.when(
            F.col("n_grams") > 0,
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_grams"), 6),
        ).otherwise(F.lit(0.0)).alias("hit_frac"),
        (F.coalesce(F.col("n_hit"), F.lit(0)) > 0).cast("long").alias("dirty"),
    )
