"""Persisted dedup-index lifecycle: the continuously-growing-corpus story.

Run:  python examples/dedup_index_lifecycle.py [sf_dir]

A 100 TB corpus is never re-deduplicated from scratch: the MinHash
signature index lives on storage, every daily crawl batch is (1) judged
against it by the ingest gatekeeper and (2) admitted into it, and the
standard maintenance verbs keep the layout healthy. This script walks
the full cycle on a corpus slice:

  build   write_ref_index           — base index from the initial corpus
  refresh refresh_ref_index         — admit a day's batch (append-only,
                                      crash-safe batch staging, ≡ rebuild)
  judge   incremental_dedup         — gatekeeper verdicts for a probe
                                      crawl vs the STORED index (the
                                      corpus is never re-scanned)
  compact compact_ref_index_inplace — fold N batch dirs back to one at
                                      the SAME path (gen=G+1 publish +
                                      meta commit; readers pin their gen)
  vacuum  vacuum_ref_index          — reclaim superseded generations
                                      once in-flight readers drain

Every verb is oracle-checked in the gate registry (dedup_index_refresh,
dedup_incremental); this script is the user-facing composition.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.dedup import (
    compact_ref_index_inplace,
    incremental_dedup,
    read_ref_index,
    read_ref_index_meta,
    refresh_ref_index,
    vacuum_ref_index,
    write_ref_index,
)
from ngff_zarr_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("dedup_index_lifecycle")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="ref_index_"), "index")

    # 1. base build: corpus as of day 0
    base = docs.filter(F.col("doc_id") % 3 != 2)
    write_ref_index(base, path)
    print(f"built index at {path}: high-water {read_ref_index_meta(path)['max_doc_id']}")

    # 2. two daily refreshes (monotonic ids — each batch above the
    # mark). The batch predicate is DETERMINISTIC (a filter, never an
    # unordered limit): refresh executes its input twice — once for the
    # high-water agg, once for the signature write — and a
    # nondeterministic subset could admit rows above the committed mark
    hi = read_ref_index_meta(path)["max_doc_id"]
    for day in (1, 2):
        batch = docs.filter(
            (F.col("doc_id") % 3 == 2) & (F.col("doc_id") % 17 == 2)
        ).select((F.col("doc_id") + day * (hi + 1)).alias("doc_id"), "text")
        refresh_ref_index(spark, path, batch)
        print(f"day {day}: admitted batch, high-water now "
              f"{read_ref_index_meta(path)['max_doc_id']}")
    n_batch_dirs = len(os.listdir(os.path.join(path, "wide")))
    print(f"index now carries {n_batch_dirs} batch directories per table")

    # 3. gatekeeper: a probe crawl (half re-crawls, half novel) judged
    # against the stored index — batch-sized work + index lookups only
    probe = docs.filter(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + 10 * (hi + 1)).alias("doc_id"), "text"
    )
    wide, bands = read_ref_index(spark, path)
    verdicts = incremental_dedup(probe, None, ref_wide=wide, ref_bands=bands)
    # one aggregate pass — keep is a 0/1 BIGINT, so both counts fold
    # into a single job instead of executing the gatekeeper plan twice
    stats = verdicts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(1 - F.col("keep")).alias("dups"),
    ).collect()[0]
    print(f"gatekeeper: {stats['dups']} of {stats['n']} probe docs are "
          "near-duplicates of the stored corpus")

    # 4. in-place compaction: N batch dirs -> one, SAME path (the index
    # path is configuration — no alias repoint needed). Readers opened
    # before the commit keep scanning their pinned generation.
    compact_ref_index_inplace(spark, path)
    meta = read_ref_index_meta(path)
    gen_root = os.path.join(path, f"gen={meta['gen']}")
    print(f"compacted in place: gen={meta['gen']}, "
          f"{len(os.listdir(os.path.join(gen_root, 'wide')))} batch dir per table")

    # 5. vacuum once in-flight readers drain (Delta-VACUUM semantics)
    vacuum_ref_index(path)
    print(f"vacuumed: {sorted(os.listdir(path))}")

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    print("index lifecycle complete")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
