"""End-to-end training-corpus pipeline on the engine's operators.

Run:  python examples/corpus_pipeline.py [sf_dir]

Chains the stages a real pretraining data pipeline runs — quality
signals, PII scrub, dedup (exact + near + substring spans), benchmark
decontamination, incremental ingest screening, language mixing,
train/val split, sequence packing — and prints the funnel report.
Every operator here is oracle-checked in the gate registry; this
script is the user-facing composition.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.corpus import filter_pipeline, rebalance_by_lang
from ngff_zarr_spark.functions.packing import pack_stats
from ngff_zarr_spark.functions.pii import pii_signals
from ngff_zarr_spark.functions.sampling import split_counts
from ngff_zarr_spark.functions.spans import duplicated_token_fraction
from ngff_zarr_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("corpus_pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== keep/drop funnel (dedup -> lang -> quality) ==")
    decisions = filter_pipeline(docs)
    decisions.groupBy("reason").count().orderBy("reason").show()

    print("== PII census ==")
    pii = pii_signals(docs)
    pii.agg(
        F.sum("n_pii").alias("total_pii"),
        F.sum((F.col("n_pii") > 0).cast("long")).alias("docs_with_pii"),
    ).show()

    print("== duplicated-substring contamination (top 5 docs) ==")
    duplicated_token_fraction(docs).orderBy(F.col("dup_frac").desc()).show(5)

    print("== benchmark decontamination (13-gram rule) ==")
    # the 'benchmark' here is an excerpt slice of the corpus itself, so
    # the scan visibly fires; in production pass the real eval suites
    from ngff_zarr_spark.functions.dedup import _norm_text
    from ngff_zarr_spark.functions.spans import contamination_scan
    from ngff_zarr_spark.functions.text import tokens_col

    toks = tokens_col(_norm_text(F.col("text")))
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(toks, 5, 40), " ").alias("text"),
    )
    contamination_scan(docs, bench).agg(
        F.sum("dirty").alias("dirty_docs"),
        F.round(F.avg("hit_frac"), 4).alias("mean_hit_frac"),
    ).show()

    print("== incremental ingest screening (new crawl vs corpus) ==")
    # simulate a re-crawl batch: half verbatim duplicates, half fresh
    from ngff_zarr_spark.functions.dedup import incremental_dedup

    new_batch = docs.filter(F.col("doc_id") % 25 < 2).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 25 == 0, F.col("text")).otherwise(
            F.array_join(F.reverse(toks), " ")
        ).alias("text"),
    )
    incremental_dedup(new_batch, docs).groupBy("keep").count().orderBy("keep").show()

    print("== language mixing report ==")
    rebalance_by_lang(docs).orderBy("lang").show()

    print("== train/val/test split ==")
    split_counts(docs, val_frac=0.1, test_frac=0.05).orderBy("split", "lang").show()

    kept = docs.join(decisions.filter("keep").select("doc_id"), "doc_id")
    print("== packing fill over the kept set ==")
    pack_stats(kept, budget=2048, n_buckets=8).agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.round(F.avg("n_tokens_packed"), 1).alias("avg_fill"),
    ).show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
