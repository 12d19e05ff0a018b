"""Within-document repetition signals (Gopher Appendix A1, the
dup-n-gram tier).

``gopher_quality`` (text.py) carries the top-bigram fraction; this
module adds the duplicated-n-gram char fractions for n in {2, 3, 4}:
the fraction of n-gram character mass belonging to n-grams that occur
more than once INSIDE the document — the signal that catches looping
boilerplate ("click here click here …") that corpus-level dedup never
sees. Definition (exact, oracle-twinned): for each n,

    frac_n = SUM(count * length(gram)  WHERE count >= 2)
           / SUM(count * length(gram))          over the doc's n-grams

rounded to 6 decimals, 0.0 for docs shorter than n tokens.

100 TB posture: one explode over (doc_id, n, gram) → two hash
aggregates with map-side combine; the shuffle carries per-(doc, n)
partial sums, never text. All expressions are JVM built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import spread, tokens_col

REP_NS = (2, 3, 4)


def ngrams_col(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of an already-tokenized array."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(docs: DataFrame, ns: tuple[int, ...] = REP_NS) -> DataFrame:
    """doc_id, dup{n}_frac for each n — duplicated-n-gram char
    fractions as defined in the module docstring."""
    norm = F.lower(F.col("text"))
    toksed = spread(docs).select("doc_id", tokens_col(norm).alias("toks"))
    grams = None
    for n in ns:
        g = toksed.select(
            "doc_id",
            F.lit(n).alias("n"),
            F.explode(ngrams_col(F.col("toks"), n)).alias("gram"),
        )
        grams = g if grams is None else grams.unionByName(g)
    per_gram = grams.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("c"), F.first(F.length("gram")).alias("glen")
    )
    mass = F.col("c") * F.col("glen")
    per_doc = per_gram.groupBy("doc_id", "n").agg(
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("c") >= 2, mass)) / F.sum(mass), F.lit(0.0)
            ),
            6,
        ).alias("frac")
    )
    agg = [
        F.round(
            F.coalesce(F.max(F.when(F.col("n") == n, F.col("frac"))), F.lit(0.0)), 6
        ).alias(f"dup{n}_frac")
        for n in ns
    ]
    # left-join back onto the full doc list so gram-free docs keep 0.0
    base = docs.select("doc_id")
    return base.join(per_doc.groupBy("doc_id").agg(*agg), "doc_id", "left").select(
        "doc_id",
        *[F.coalesce(F.col(f"dup{n}_frac"), F.lit(0.0)).alias(f"dup{n}_frac") for n in ns],
    )
