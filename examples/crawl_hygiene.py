"""Crawl-ingest hygiene on the engine's operators.

Run:  python examples/crawl_hygiene.py [sf_dir]

Chains the normalization/profiling stages a web-crawl pipeline runs
BEFORE content-based dedup: URL canonicalization (the same page
arrives under dozens of spellings), URL-level dedup clusters, per-host
mirror detection, and exact heavy-hitter token profiling (the
frequent-items table vocabulary pruning and boilerplate detection
read). Every operator is oracle-checked in the gate registry; this
script is the user-facing composition.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.sketch import heavy_hitters
from ngff_zarr_spark.functions.web import host_stats, url_dedup
from ngff_zarr_spark.gate import _doc_urls, _hh_tokens
from ngff_zarr_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("crawl_hygiene")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = _doc_urls(docs)  # stand-in: synthesize noisy URLs per doc

    # 1. URL-level dedup: canonicalize spellings, cluster, keep one rep
    clusters = url_dedup(urls)
    n_urls = urls.count()
    n_canon = clusters.count()
    multi = clusters.where(F.col("n_docs") >= 2).count()
    print(f"url dedup: {n_urls} raw urls -> {n_canon} canonical "
          f"({multi} clusters with 2+ members)")

    # 2. mirror-host profile: pages per distinct canonical URL
    worst = host_stats(urls).orderBy(F.col("dup_factor").desc()).first()
    print(f"hottest host: {worst.host} dup_factor={worst.dup_factor}")

    # 3. exact heavy hitters over the (lang, token) stream — bounded
    # per-task state, never a distinct-key-sized shuffle
    hh = heavy_hitters(_hh_tokens(docs), ("lang", "token"), 1, 100, 100)
    top = hh.orderBy(F.col("n").desc()).limit(5).collect()
    for r in top:
        print(f"heavy hitter: ({r.lang}, {r.token}) n={r.n} frac={r.frac}")
    print(f"crawl hygiene complete: {hh.count()} heavy hitters at phi=1%")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
