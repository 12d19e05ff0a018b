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

from .dedup import _norm_text, exact_dedup
from .text import gopher_quality


def filter_pipeline(docs: DataFrame, keep_lang: str = "en") -> DataFrame:
    """doc_id, reason ('duplicate' | 'lang' | 'quality' | 'kept'),
    keep — the composed filter decision per document."""
    keyed = docs.select(
        "doc_id", "lang", F.md5(_norm_text(F.col("text"))).alias("content_md5")
    )
    reps = exact_dedup(docs).select("content_md5", "representative")
    gq = gopher_quality(docs).select("doc_id", F.col("passes").alias("gopher_passes"))
    j = keyed.join(reps, "content_md5").join(gq, "doc_id")
    reason = (
        F.when(F.col("doc_id") != F.col("representative"), F.lit("duplicate"))
        .when(F.col("lang") != keep_lang, F.lit("lang"))
        .when(~F.col("gopher_passes"), F.lit("quality"))
        .otherwise(F.lit("kept"))
    )
    return j.select(
        "doc_id", reason.alias("reason")
    ).withColumn("keep", F.col("reason") == "kept")
