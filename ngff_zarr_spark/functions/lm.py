"""Hashed n-gram language-model scoring for corpus curation: CCNet-style
perplexity filtering and DSIR-style importance weighting.

Both operators score documents against bigram statistics of a reference
corpus — the standard cheap LM the big pretraining pipelines use where a
neural scorer is too expensive to run over 100 TB:

* ``lm_perplexity`` — CCNet (Wenzek et al. 2020) ranks documents by the
  perplexity of a small LM trained on a high-quality reference; low
  perplexity ≈ reference-like text. Here the LM is add-one-smoothed
  hashed bigrams (KenLM's role, sans backoff) and the score is the
  average log2 probability per bigram.
* ``dsir_importance`` — DSIR (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling") weights each document by
  the log ratio of hashed n-gram likelihoods under a TARGET distribution
  vs the RAW corpus distribution; resampling by that weight shifts the
  mix toward the target domain. The hashed-feature collision behavior is
  part of the method's definition, not an approximation we add.

Cross-engine exactness (the engine's oracle bar): every probability is a
RATIONAL number of integer counts — p = (c₁₂ + 1)/(c₁ + V) — and the
only float op is log2 of that rational, immediately rounded half-up to
integer micro-units (floor(log2(p)·10⁶ + 0.5)). Per-document scores are
BIGINT sums of those micro-units — order-independent, unlike a double
sum — and the reported average is BIGINT division, so every output
column is integer: the oracle comparison has no float rounding surface
at all. A libm ulp difference in log2 only matters within 10⁻⁶ of a
per-term rounding boundary.

100 TB posture: token text never shuffles — documents reduce to hashed
gram ids immediately; the LM is two hash aggregates over gram ids
(map-side combine absorbs hot grams); scoring is cardinality-preserving
joins on the gram id (each doc-gram row matches exactly one count row)
followed by one per-doc sum. No RNG, no driver-side state beyond the
scalar vocabulary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _norm_text
from .text import h64, spread, tokens_col

LM_BUCKETS = 1 << 20  # hashed gram space (DSIR uses 10k; more = fewer collisions)
MICRO = 1_000_000


def _doc_bigrams(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, g2, g1): hashed bigram id and hashed context (first
    token) id for every adjacent token pair, duplicates kept — one
    positional transform inside codegen, no shuffle."""
    toksed = spread(docs).select(
        "doc_id", tokens_col(_norm_text(F.col("text"))).alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0)))
    pairs = F.when(
        n >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                (
                    h64(
                        F.concat_ws(
                            " ",
                            F.element_at(toks, (i + 1).cast("int")),
                            F.element_at(toks, (i + 2).cast("int")),
                        )
                    )
                    % n_buckets
                ).alias("g2"),
                (h64(F.element_at(toks, (i + 1).cast("int"))) % n_buckets).alias(
                    "g1"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<g2:long,g1:long>>"))
    return toksed.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.g2").alias("g2"), F.col("p.g1").alias("g1")
    )


def lm_perplexity(
    docs: DataFrame,
    ref: DataFrame | None = None,
    n_buckets: int = LM_BUCKETS,
) -> DataFrame:
    """Average bigram log2-probability per document under an add-one-
    smoothed hashed-bigram LM built from ``ref`` (default: the corpus
    itself — self-scoring, the boilerplate-vs-outlier signal).

    p(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V), V = distinct hashed
    bigram types in ref (add-one over the observed bigram vocabulary).
    Returns (doc_id, n_bigrams, logprob_micro, avg_micro):
    logprob_micro = Σ floor(log2(p)·10⁶ + 0.5) as BIGINT, avg_micro =
    logprob_micro div n_bigrams (BIGINT division, truncation toward
    zero in BOTH engines — the row is all-integer, so the oracle hash
    has zero float surface). Perplexity is 2^(−avg_micro/10⁶),
    monotone in the score, so filters threshold avg_micro directly.
    Documents with < 2 tokens score NULL."""
    # persist the reduced (doc_id, g2, g1) form — it feeds two count
    # aggregates (and doc scoring when self-referenced); re-deriving it
    # means re-reading and re-tokenizing the corpus per consumer, and
    # 24 B/row of hashed longs is far cheaper to spill than that (the
    # same trade dup_shingle_frac makes for its shingle table)
    self_ref = ref is None
    ref_grams = _doc_bigrams(docs if self_ref else ref, n_buckets).persist()
    c2 = ref_grams.groupBy("g2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = ref_grams.groupBy("g1").agg(F.count(F.lit(1)).alias("c1"))
    vdf = c2.agg(F.count(F.lit(1)).alias("v"))
    dg = ref_grams if self_ref else _doc_bigrams(docs, n_buckets)
    term = (
        dg.join(c2, "g2", "left")
        .join(c1, "g1", "left")
        .crossJoin(F.broadcast(vdf))
        .select(
            "doc_id",
            F.floor(
                F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast(
                        "double"
                    )
                )
                * MICRO
                + F.lit(0.5)
            ).cast("long").alias("lp_micro"),
        )
    )
    scored = term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lp_micro").cast("long").alias("logprob_micro"),
    )
    ids = spread(docs).select("doc_id")
    from ._scope import checkpointed

    # avg_micro = per-bigram average in micro-units via BIGINT division
    # (both engines truncate toward zero) — the whole row is integer,
    # so the oracle hash has no float rounding surface at all.
    # ref_grams' cache is scoped to this call (functions/_scope.py).
    return checkpointed(
        ids.join(scored, "doc_id", "left").select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            "logprob_micro",
            F.expr("logprob_micro div n_bigrams").cast("long").alias("avg_micro"),
        ),
        ref_grams,
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = LM_BUCKETS,
) -> DataFrame:
    """DSIR importance weight per document: the average hashed-bigram
    log2-likelihood ratio between the TARGET distribution (the domain
    to select toward) and the RAW corpus distribution,

        w(doc) = (1/n) Σ_g [log2 p_t(g) − log2 p_r(g)],
        p(g) = (c(g) + 1) / (N + B)   (add-one over the hash space B),

    so w > 0 means the doc's grams look more target-like than
    corpus-average; resampling/top-k by w realizes the selection.
    Returns (doc_id, n_bigrams, weight_micro, weight_avg_micro):
    weight_micro the BIGINT micro-unit sum (exact), weight_avg_micro
    its per-gram BIGINT average — all-integer rows, like
    lm_perplexity. Docs with < 2 tokens get NULLs."""
    # the corpus bigram table feeds the raw-count aggregate AND the
    # per-doc scoring join — persist the reduced form (see
    # lm_perplexity for the trade)
    dg = _doc_bigrams(docs, n_buckets).persist()
    tg = _doc_bigrams(target, n_buckets).groupBy("g2").agg(
        F.count(F.lit(1)).alias("ct")
    )
    rg = dg.groupBy("g2").agg(F.count(F.lit(1)).alias("cr"))
    nt = tg.agg(F.sum("ct").alias("n_t"))
    nr = rg.agg(F.sum("cr").alias("n_r"))
    term = (
        dg.join(tg, "g2", "left")
        .join(rg, "g2", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "doc_id",
            (
                F.floor(
                    F.log2(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        / (F.col("n_t") + n_buckets).cast("double")
                    )
                    * MICRO
                    + F.lit(0.5)
                )
                - F.floor(
                    F.log2(
                        (F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double")
                        / (F.col("n_r") + n_buckets).cast("double")
                    )
                    * MICRO
                    + F.lit(0.5)
                )
            ).cast("long").alias("lr_micro"),
        )
    )
    scored = term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lr_micro").cast("long").alias("weight_micro"),
    )
    ids = spread(docs).select("doc_id")
    from ._scope import checkpointed

    return checkpointed(
        ids.join(scored, "doc_id", "left").select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            "weight_micro",
            F.expr("weight_micro div n_bigrams").cast("long").alias("weight_avg_micro"),
        ),
        dg,
    )
