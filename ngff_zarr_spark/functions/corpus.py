"""End-to-end corpus filtering: the C4/Gopher-style keep/drop decision.

A real pretraining pipeline composes its signals into ONE verdict per
document; this operator chains the engine's own stages — exact dedup
(keep the representative of each content group), language filter, and
the Gopher quality rules — into a labeled decision with the standard
precedence (dedup first: a duplicate is dropped as 'duplicate' even if
it would also fail quality, matching how pipeline stages short-circuit).

100 TB posture: one md5-keyed aggregate for the dedup groups, the two
Gopher hash aggregates, and two joins on doc_id/content_md5 — every
intermediate carries ids and small signals, never text. The reason
column makes the drop-funnel report (`groupBy("reason").count()`) a
free follow-up aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _norm_text
from .text import gopher_quality


def filter_pipeline(docs: DataFrame, keep_lang: str = "en") -> DataFrame:
    """doc_id, reason ('duplicate' | 'lang' | 'quality' | 'kept'),
    keep — the composed filter decision per document."""
    # keyed carries (doc_id, lang, md5) — no text. r19 second pass
    # (the multimodal-verdict shape, guide §2.4): the representative
    # test is a whole-partition min WINDOW over content_md5 instead of
    # a min-aggregate joined back — one shuffle of the key table
    # instead of two, a single consumer for the md5 pass (so the
    # call-scoped persist and its checkpoint job go away), and the
    # md5 key is non-null by construction so the old inner join never
    # dropped rows either.
    from pyspark.sql import Window

    keyed = docs.select(
        "doc_id", "lang", F.md5(_norm_text(F.col("text"))).alias("content_md5")
    )
    dup = keyed.withColumn(
        "representative",
        F.min("doc_id").over(Window.partitionBy("content_md5")),
    )
    gq = gopher_quality(docs).select("doc_id", F.col("passes").alias("gopher_passes"))
    j = dup.join(gq, "doc_id")
    reason = (
        F.when(F.col("doc_id") != F.col("representative"), F.lit("duplicate"))
        .when(F.col("lang") != keep_lang, F.lit("lang"))
        .when(~F.col("gopher_passes"), F.lit("quality"))
        .otherwise(F.lit("kept"))
    )
    return j.select(
        "doc_id", reason.alias("reason")
    ).withColumn("keep", F.col("reason") == "kept")


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Overlapping token-window chunking (the RAG/pretraining splitter):
    chunks start at 0, stride, 2*stride, … while the start is inside
    the document; each spans up to ``chunk_tokens`` tokens (the last
    one may be shorter). Returns (doc_id, chunk_idx, start_tok,
    n_tokens, chunk_md5) — the md5 digests the space-joined token
    slice, so content is value-checked without hauling text.

    100 TB posture: pure per-row array expressions (sequence/slice/
    concat) inside codegen + one explode — no shuffle at all; the
    chunk table partitions exactly like its source."""
    from .text import spread, tokens_col

    toksed = spread(docs).select("doc_id", tokens_col(F.col("text")).alias("toks"))
    n = F.size("toks")
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = toksed.select(
        "doc_id", "toks", F.posexplode(starts).alias("chunk_idx", "start_tok")
    )
    length = F.least(F.lit(chunk_tokens), F.size("toks") - F.col("start_tok"))
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        length.cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("start_tok") + 1, length))
        ).alias("chunk_md5"),
    )


REBALANCE_BUCKETS = 1_000_000


def rebalance_by_lang(docs: DataFrame, salt: str = "mix") -> DataFrame:
    """Deterministic language rebalancing (data mixing): downsample
    every language to the SMALLEST language's volume by hash threshold
    — doc kept iff h64(salt:doc_id) mod 10^6 < floor(10^6 * min_count /
    lang_count). The decision is a pure function of the doc id, so
    reruns and engines agree exactly, and enlarging the corpus only
    re-rolls the affected language's threshold (no RNG state, no
    global sort). Returns the per-language mixing report
    (lang, n_total, threshold, n_kept).

    100 TB posture: one tiny per-lang count aggregate broadcast back
    onto the corpus, then a per-row hash comparison — the same
    shuffle-free decision shape as hash_split."""
    from .text import h64

    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    m = counts.agg(F.min("n_total").alias("m"))
    thr = (
        counts.crossJoin(F.broadcast(m))
        .select(
            "lang",
            "n_total",
            F.expr(f"({REBALANCE_BUCKETS} * m) div n_total").alias("threshold"),
        )
    )
    keyed = docs.select(
        "doc_id", "lang",
        (h64(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string")))
         % REBALANCE_BUCKETS).alias("bucket"),
    )
    return (
        keyed.join(F.broadcast(thr), "lang")
        .groupBy("lang", "n_total", "threshold")
        .agg(
            F.sum(F.when(F.col("bucket") < F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept")
        )
        .select("lang", F.col("n_total").cast("long").alias("n_total"),
                F.col("threshold").cast("long").alias("threshold"), "n_kept")
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    any lowercase whitespace n-gram with an evaluation set — the
    standard pre-training hygiene pass (GPT-3 appendix C / PaLM-style
    13-gram overlap; ``n`` defaults to a stricter 8).

    Returns (doc_id, n_grams, n_hits, contaminated): distinct n-grams
    in the doc, how many also occur anywhere in ``benchmark``, and the
    any-overlap verdict.

    100 TB posture: the benchmark side (eval sets — thousands of docs)
    collapses to a DISTINCT gram-hash table and BROADCASTS; the train
    side computes its gram hashes per row (array_distinct inside the
    projection — per-doc dedup costs no shuffle), explodes, and
    broadcast-semi-joins. The only exchange is the per-doc hit count
    over the (tiny) surviving hit rows. Gram text never shuffles —
    only 8-byte hashes."""

    def grams(src: DataFrame) -> DataFrame:
        # lowered whitespace tokens -> h64 of each n consecutive tokens
        # joined by ' '; array_distinct BEFORE explode (no shuffle).
        # projection boundary: tokenize once per row
        toked = src.selectExpr(
            "doc_id",
            "filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '),"
            " t -> t != '') AS toks",
        )
        return toked.selectExpr(
            "doc_id",
            f"""array_distinct(CASE WHEN size(toks) >= {n}
              THEN transform(sequence(0, size(toks) - {n}),
                i -> CAST(conv(substring(md5(
                       concat_ws(' ', slice(toks, i+1, {n}))
                     ), 1, 15), 16, 10) AS BIGINT))
              ELSE array() END) AS grams""",
        )

    bench_grams = (
        grams(benchmark)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    train = grams(docs).select(
        "doc_id", "grams", F.size("grams").cast("long").alias("n_grams")
    )
    hits = (
        train.select("doc_id", F.explode("grams").alias("g"))
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        train.select("doc_id", "n_grams")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


MIX_BUCKETS = 1_000_000


def _rate_micro_expr(budget: int | None):
    """rate_micro = (10^6 · B · w_micro) div (s_micro · n_total), exact.

    DECIMAL(38,0) intermediates, not BIGINT (r18 corpus review): at
    production corpus sizes the numerator overflows a long — w_micro ~
    n^alpha·10^6 is ~10^12 at 10^12 docs with alpha=0.5, so the triple
    product reaches ~10^30 vs the 9.2·10^18 long ceiling. Under ANSI
    mode (Spark 4 default) that raised ARITHMETIC_OVERFLOW at scale;
    non-ANSI deployments would wrap silently and corrupt every rate.
    Each binary product stays far under DECIMAL(38,0)'s 10^38 ceiling
    (numerator ≤ ~10^30, denominator ≤ ~10^25) and decimal DIV on
    scale-0 operands is exact integer division, so values are
    bit-identical to the BIGINT form wherever that form didn't
    overflow (pytest-pinned against Python bigints at overflow-regime
    magnitudes)."""
    b = (
        f"CAST({int(budget)} AS DECIMAL(38,0))"
        if budget is not None
        else "CAST(n_corpus AS DECIMAL(38,0))"
    )
    return F.expr(
        f"CAST((CAST({MIX_BUCKETS} AS DECIMAL(38,0)) * {b} * "
        "CAST(w_micro AS DECIMAL(38,0))) DIV "
        "(CAST(s_micro AS DECIMAL(38,0)) * CAST(n_total AS DECIMAL(38,0))) "
        "AS BIGINT)"
    )


def temperature_mixture(
    docs: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    budget: int | None = None,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture resampling — the multilingual-LM data
    mix (XLM-R / mT5 style): target share of group i is
    q_i = n_i^alpha / sum_j n_j^alpha, so alpha < 1 upweights
    low-resource groups and alpha = 1 keeps natural proportions. The
    realized sample hits a total ``budget`` (default: corpus size) —
    groups whose target EXCEEDS their volume are upsampled with whole
    repetition epochs plus a fractional remainder, groups below volume
    are downsampled; both by the engine's deterministic hash-threshold
    rule, so reruns and engines agree row-for-row.

    Returns (doc_id, <group_col>, epoch): epoch e means the e-th
    repetition of the doc in the mixed corpus (0-based); a document
    appears floor(rate) times plus once more iff
    h64(salt:doc_id) mod 10^6 < the fractional threshold.

    Cross-engine exactness: the only float op is n^alpha, immediately
    rounded half-up to integer micro-units (floor(x*10^6 + 0.5)) —
    every downstream quantity (share, rate, epoch count, threshold) is
    INTEGER arithmetic: rate_micro = (10^6 * B * w_i) div (S * n_i)
    with S = sum of micro-weights (an integer sum, order-independent,
    unlike a double sum). The DuckDB oracle recomputes the identical
    table. A libm ulp difference in pow() only matters within 1e-6 of
    a rounding boundary — and alpha = 0.5 (the gate) is sqrt, which
    IEEE 754 requires correctly rounded in both engines.

    100 TB posture: one tiny per-group count aggregate, the weight
    table broadcast back, one per-row hash compare, and an epoch
    explode bounded by ceil(rate) <= budget/n_smallest — no shuffle of
    text, no RNG state, no global sort (same decision shape as
    hash_split / rebalance_by_lang)."""
    from .text import h64

    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_total"))
    w = counts.select(
        group_col,
        "n_total",
        F.floor(
            F.pow(F.col("n_total").cast("double"), F.lit(float(alpha)))
            * MIX_BUCKETS
            + F.lit(0.5)
        ).cast("long").alias("w_micro"),
    )
    tot = w.agg(
        F.sum("w_micro").alias("s_micro"),
        F.sum("n_total").alias("n_corpus"),
    )
    # integer DIV keeps the rate exact — no double divide anywhere
    # (decimal-typed: see _rate_micro_expr for the overflow analysis)
    plan = w.crossJoin(F.broadcast(tot)).withColumn(
        "rate_micro", _rate_micro_expr(budget)
    ).select(
        group_col,
        "n_total",
        "w_micro",
        "rate_micro",
        F.expr(f"rate_micro div {MIX_BUCKETS}").alias("n_full"),
        F.expr(f"rate_micro % {MIX_BUCKETS}").alias("frac_thr"),
    )
    keyed = docs.select(
        "doc_id",
        group_col,
        (
            h64(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string")))
            % MIX_BUCKETS
        ).alias("bucket"),
    )
    return (
        keyed.join(F.broadcast(plan), group_col)
        .select(
            "doc_id",
            group_col,
            "bucket",
            "n_full",
            "frac_thr",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_full"))).alias(
                "epoch"
            ),
        )
        .filter(
            (F.col("epoch") < F.col("n_full"))
            | (F.col("bucket") < F.col("frac_thr"))
        )
        .select("doc_id", group_col, F.col("epoch").cast("long").alias("epoch"))
    )


def temperature_mixture_report(
    docs: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    budget: int | None = None,
    salt: str = "temp",
) -> DataFrame:
    """Per-group mixing report over :func:`temperature_mixture`:
    (group, n_total, w_micro, rate_micro, n_emitted) — the realized
    volume next to the integer-exact plan quantities, so a mix
    regression shows up as a value diff, not a vibe."""
    mix = temperature_mixture(docs, group_col, alpha, budget, salt)
    counts = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    emitted = mix.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_emitted")
    )
    w = counts.select(
        group_col,
        "n_total",
        F.floor(
            F.pow(F.col("n_total").cast("double"), F.lit(float(alpha)))
            * MIX_BUCKETS
            + F.lit(0.5)
        ).cast("long").alias("w_micro"),
    )
    tot = w.agg(F.sum("w_micro").alias("s_micro"), F.sum("n_total").alias("n_corpus"))
    plan = w.crossJoin(F.broadcast(tot)).withColumn(
        "rate_micro", _rate_micro_expr(budget)
    ).select(group_col, "n_total", "w_micro", "rate_micro")
    return plan.join(emitted, group_col, "left").select(
        group_col,
        "n_total",
        "w_micro",
        "rate_micro",
        F.coalesce(F.col("n_emitted"), F.lit(0)).cast("long").alias("n_emitted"),
    )
