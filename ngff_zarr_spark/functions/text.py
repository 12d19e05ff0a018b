"""Text-analysis operators for large-scale training-data pipelines.

All run over the ``documents`` table ``(doc_id, text, lang, source,
n_chars)`` with JVM-side built-ins only (no Python UDFs): per-row string
expressions + hash aggregates, so they scale linearly and shuffle only
on the final aggregate (if any).

Portable-hash note: every hash used here is
``h64(s) = int(md5(s)[:15 hex], 16)`` — a 60-bit value both Spark
(``conv``) and DuckDB (``CAST('0x…' AS BIGINT)``) produce identically,
which is what makes the DuckDB oracle exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the n-gram/stopword heuristic
# language id. Deliberately small and embedded as literals so the oracle
# SQL carries the identical lists.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}

EN_STOPWORDS = LANG_STOPWORDS["en"]
PUNCT_CLASS = "[.,!?;:]"


def h64(col: Column) -> Column:
    """Portable 60-bit hash of a string column (md5-derived)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least default-parallelism partitions before per-row
    heavy work (regex/shingling/vector math). A small single-file
    parquet scan arrives as ONE partition, serializing everything
    downstream onto one core; at production scale inputs already have
    many partitions and this is a no-op (the guard avoids a gratuitous
    shuffle).

    Deliberately RDD-free (``df.rdd`` raises under Spark Connect and
    triggers a needless job on some sources): the no-op decision uses
    ``df.inputFiles()`` — a file-backed scan with at least ``target``
    files already fans out, so the repartition is skipped. Inputs the
    heuristic can't size (in-memory DataFrames, few-file scans) get the
    explicit repartition; that shuffle is what spread() exists to
    insert, and it is bounded by the input it fans out. Callers with a
    pre-partitioned non-file input that must not reshuffle should skip
    spread() or pass an explicit ``min_partitions``."""
    spark = df.sparkSession
    if min_partitions is not None:
        target = min_partitions
    else:
        try:
            target = spark.sparkContext.defaultParallelism
        except Exception:  # Spark Connect: no SparkContext handle
            target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization, identical in both engines: split on a
    single space after whitespace-normalizing. Empty strings removed."""
    norm = F.trim(F.regexp_replace(text, r"\s+", " "))
    return F.filter(F.split(norm, " "), lambda t: t != "")


def token_count(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish sub-word proxy —
    runs of letters, runs of digits, or single other non-space chars
    (``[a-z]+|[0-9]+|[^a-z0-9\\s]`` on the lowercased text)."""
    lower = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(lower, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
        .cast("long")
        .alias("n_subtokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality: mean token length, punctuation density,
    stopword ratio, and a composite score. All ratios are exact-integer
    divisions evaluated once → deterministic doubles cross-engine."""
    # projection boundary: tokenize ONCE per row (multiple references to
    # an expensive expression would otherwise re-run the regex+split)
    base = docs.select(
        "doc_id",
        tokens_col(F.col("text")).alias("toks"),
        F.length("text").cast("long").alias("n_char"),
        (F.length("text") - F.length(F.regexp_replace("text", PUNCT_CLASS, "")))
        .cast("long")
        .alias("n_punct"),
    )
    toks = F.col("toks")
    n_tok = F.size(toks).cast("long")
    n_char = F.col("n_char")
    n_punct = F.col("n_punct")
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(EN_STOPWORDS))).cast("long")
    mean_tok_len = (n_char - (n_tok - 1)) / n_tok
    punct_ratio = n_punct / n_char
    stop_ratio = n_stop / n_tok
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.2
    )
    return base.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID: per language, count tokens in that
    language's function-word list; argmax with lexicographic tie-break.
    Implemented as one pass of array intersections per language — no
    explode, no shuffle."""
    base = docs.select("doc_id", tokens_col(F.lower(F.col("text"))).alias("toks"))
    toks = F.col("toks")
    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, lambda t: t.isin(words))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_STOPWORDS.items())
        ]
    )
    # argmax: max score, ties → lexicographically first lang. Sorting the
    # struct array ascending puts (max score, max lang) last; to get the
    # smallest lang among max scores, negate... simpler: reduce with a
    # comparator via array_sort on (score desc => use -score asc, lang asc).
    best = F.array_sort(
        F.transform(
            scored,
            lambda s: F.struct((-s["score"]).alias("neg"), s["lang"].alias("lang")),
        )
    )[0]
    return base.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        (-best["neg"]).cast("long").alias("votes"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of the case-folded, whitespace-collapsed
    text (the exact-dedup key), plus its 60-bit integer form."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        h64(norm).alias("fp64"),
    )


def winnow_fingerprints(docs: DataFrame, window: int = 5) -> DataFrame:
    """Winnowing-style rolling fingerprints (Schleimer et al., SIGMOD'03):
    hash every token, take the min hash of each sliding window of
    ``window`` tokens, keep the distinct mins per document. Returns the
    per-doc fingerprint-set summary (count, min, max) — the full set is
    the intermediate ``explode`` relation.

    Scale: explode(tokens) is linear; the sliding min is a bounded
    window frame per doc — partitions by doc_id, no global sort."""
    from pyspark.sql import Window as W

    toks = docs.select("doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok"))
    hashed = toks.select("doc_id", "pos", h64(F.col("tok")).alias("h"))
    frame = (
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    )
    mins = hashed.select("doc_id", F.min("h").over(frame).alias("fp")).distinct()
    return mins.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
    )


def top_tokens(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-level top-k token frequencies: (token, n), the vocabulary
    profile every corpus-analysis pass starts from (and the input to
    stopword-list induction). Deterministic total order — count
    descending, then token ascending — so the k-th boundary never
    depends on partitioning.

    100 TB posture: explode → hash aggregate with map-side combine
    (shuffle is |vocabulary| partial counts, not token instances);
    Catalyst turns orderBy+limit into TakeOrderedAndProject — per-
    partition top-k heaps, no global sort of the vocabulary."""
    toks = spread(docs).select(
        F.explode(tokens_col(F.lower(F.col("text")))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


# Gopher-style quality-rule thresholds (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", §A1.1.2 — published filter rules). The
# line-based rules are omitted (this corpus is single-line); the word
# and repetition rules below are the exact SQL-expressible subset.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_DISTINCT_STOPWORDS = 2
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.18


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Gopher-rule quality signals per document: word count, mean word
    length, distinct-stopword count, duplicate-word fraction, and the
    top-bigram repetition fraction, plus the combined ``passes`` flag.
    These are the standard pretraining-corpus filter rules — the
    repetition signals catch boilerplate/spam that length and stopword
    checks miss.

    100 TB posture: two hash aggregates over exploded words/bigrams
    (map-side combine; shuffle carries per-doc partial counts, never
    text) joined on doc_id; all expressions are JVM built-ins. The
    thresholds test the ROUNDED values so the oracle comparison can
    never straddle a rounding boundary."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    toksed = spread(docs).select("doc_id", tokens_col(norm).alias("toks"))
    w = toksed.select("doc_id", F.explode("toks").alias("tok"))
    one = F.count(F.lit(1))
    words = w.groupBy("doc_id").agg(
        one.cast("long").alias("n_words"),
        F.round(F.sum(F.length("tok")) / one, 6).alias("mean_word_len"),
        F.countDistinct("tok").alias("n_distinct"),
        F.countDistinct(
            F.when(F.col("tok").isin(EN_STOPWORDS), F.col("tok"))
        ).alias("n_distinct_stopwords"),
    )
    toks = F.col("toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, (i + 1).cast("int")),
                F.element_at(toks, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array())
    bg = toksed.select("doc_id", F.explode(bigrams).alias("bigram"))
    bg_stats = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("total_c"))
    )
    joined = words.join(bg_stats, "doc_id", "left")
    top_bigram_frac = F.coalesce(
        F.round(F.col("top_c") / F.col("total_c"), 6), F.lit(0.0)
    )
    out = joined.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        F.col("n_distinct_stopwords").cast("long").alias("n_distinct_stopwords"),
        F.round(F.lit(1.0) - F.col("n_distinct") / F.col("n_words"), 6).alias(
            "dup_word_frac"
        ),
        top_bigram_frac.alias("top_bigram_frac"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("n_distinct_stopwords") >= GOPHER_MIN_DISTINCT_STOPWORDS)
        & (F.col("top_bigram_frac") <= GOPHER_MAX_TOP_BIGRAM_FRAC),
    )


QC_N_FEAT = 1024     # hashed feature buckets
QC_KEEP_FRAC = 0.7   # calibrated corpus keep rate


def hashed_quality_classifier(
    docs: DataFrame,
    n_feat: int = QC_N_FEAT,
    keep_frac: float = QC_KEEP_FRAC,
) -> DataFrame:
    """fastText-style hashed linear scorer with DISTRIBUTED threshold
    calibration — the inference+calibration half of the quality-filter
    stage every pretraining pipeline runs (the trained weights of a
    real classifier drop into the same plan; here they are
    deterministic hash-derived integers so the DuckDB twin re-derives
    every score from md5 alone).

    Feature = token hash bucket: b(tok) = h64('qc:'||tok) % n_feat.
    Weight  = hash of the bucket:  w(b) = h64('qcw:'||b) % 2001 − 1000
    (integers in [−1000, 1000] — the weight "table" is a pure function,
    so scoring is ONE projection: no weight broadcast, no join, no UDF,
    zero shuffles until the aggregate).

    score = Σ_tokens w(b(tok))  (exact BIGINT);
    score_per_tok = round(score / n_tokens, 6);
    keep  = score_per_tok ≥ the corpus (1−keep_frac) quantile of
    score_per_tok — an exact distributed percentile (one tiny 1-row
    aggregate broadcast back), so the filter keeps the TOP keep_frac
    of the corpus by construction rather than trusting a hand-set
    threshold. Returns (doc_id, n_tokens, score, score_per_tok, keep)."""
    scored = quality_score_projection(spread(docs), n_feat)
    cut = scored.agg(
        F.round(
            F.expr(f"percentile(score_per_tok, {1.0 - float(keep_frac)})"), 6
        ).alias("cutoff")
    )
    return (
        scored.crossJoin(F.broadcast(cut))
        .select(
            "doc_id",
            "n_tokens",
            "score",
            "score_per_tok",
            (F.col("score_per_tok") >= F.col("cutoff")).alias("keep"),
        )
    )


def quality_score_projection(docs: DataFrame, n_feat: int = QC_N_FEAT) -> DataFrame:
    """The classifier's STATELESS half: (doc_id, n_tokens, score,
    score_per_tok) — one projection, no aggregate, so it runs unchanged
    in a streaming plan (the calibration half is inherently batch; a
    stream applies a batch-calibrated cutoff)."""
    toks = tokens_col(F.lower(F.col("text")))
    w_of = lambda t: (
        F.pmod(
            h64(
                F.concat(
                    F.lit("qcw:"),
                    F.pmod(h64(F.concat(F.lit("qc:"), t)), F.lit(n_feat)).cast("string"),
                )
            ),
            F.lit(2001),
        )
        - F.lit(1000)
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + w_of(t)
        ).alias("score"),
    ).filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        "score",
        F.round(F.col("score") / F.col("n_tokens"), 6).alias("score_per_tok"),
    )


VOCAB_COVERAGE_FRACTIONS = [(1, 2), (9, 10), (99, 100)]


def vocab_coverage(
    docs: DataFrame,
    fractions: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Vocabulary coverage curve — for each target fraction num/den,
    how many distinct tokens (taken most-frequent-first) cover at
    least that share of all token occurrences. The planning number
    behind vocabulary-size choices for tokenizers and embedding
    tables ("50k types cover 99 % of the stream"). Returns one row per
    fraction: (cov_num, cov_den, threshold_tokens, n_vocab_needed,
    vocab_size, total_tokens) — all BIGINT, fully integer-exact
    (threshold = ceil(total*num/den); within a tied-frequency group
    tokens are interchangeable, so the answer needs
    ceil(remaining/freq) of them, no tie-break ambiguity).

    100 TB posture — NO vocab-sized sort or window anywhere: the token
    counts collapse to the FREQUENCY SUMMARY (freq -> how many tokens
    have it, via two hash aggregates with map-side combining), and a
    corpus with T total occurrences has at most sqrt(2T) distinct
    frequency values (k distinct frequencies are >= 1+2+...+k = k(k+1)/2
    occurrences) — 10^13 tokens bound the summary at ~4.5M rows. The
    prefix-sum window runs over THAT bounded table (non-foldable
    constant-zero partition spec, the seeded_shuffle convention), and
    the per-fraction answer is one broadcast-crossjoin arithmetic pick
    over it."""
    fractions = VOCAB_COVERAGE_FRACTIONS if fractions is None else fractions
    from pyspark.sql import Window

    counts = (
        spread(docs)
        .select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    fsum = counts.groupBy("freq").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks")
    )
    one_group = F.col("freq") - F.col("freq")
    w_prev = (
        Window.partitionBy(one_group)
        .orderBy(F.col("freq").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = fsum.select(
        "freq",
        "n_toks",
        F.coalesce(F.sum(F.col("freq") * F.col("n_toks")).over(w_prev), F.lit(0))
        .cast("long")
        .alias("cum_before"),
        F.coalesce(F.sum("n_toks").over(w_prev), F.lit(0))
        .cast("long")
        .alias("vocab_before"),
    )
    totals = fsum.agg(
        F.sum(F.col("freq") * F.col("n_toks")).cast("long").alias("total_tokens"),
        F.sum("n_toks").cast("long").alias("vocab_size"),
    )
    spark = docs.sparkSession
    fr = spark.createDataFrame(
        [(int(n), int(d)) for n, d in fractions], "cov_num long, cov_den long"
    )
    # threshold = ceil(total*num/den); the covering group is the one
    # whose cumulative range contains it; inside the group take
    # ceil(remaining/freq) interchangeable tokens
    joined = (
        pref.crossJoin(F.broadcast(fr))
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "threshold",
            F.expr("CAST((total_tokens * cov_num + cov_den - 1) div cov_den AS BIGINT)"),
        )
        .filter(
            (F.col("cum_before") < F.col("threshold"))
            & (F.col("cum_before") + F.col("freq") * F.col("n_toks")
               >= F.col("threshold"))
        )
        .select(
            "cov_num",
            "cov_den",
            F.col("threshold").alias("threshold_tokens"),
            F.expr(
                "CAST(vocab_before + (threshold - cum_before + freq - 1) div freq"
                " AS BIGINT)"
            ).alias("n_vocab_needed"),
            "vocab_size",
            "total_tokens",
        )
    )
    return joined
