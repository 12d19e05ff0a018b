"""r16: the three ADVICE r15 hardening items, each pinned.

1. Persisted dedup index — crash-then-SKIP safety: an orphan batch
   left by a crashed refresh must not resurrect when a *different*
   batch later raises the high-water mark past it (its rows were never
   occupancy-counted; a partial crash can leave wide rows with no band
   rows). refresh_ref_index garbage-collects orphans at admission.
2. Streaming URL ledger — replay idempotency: foreachBatch is
   at-least-once; a re-executed micro-batch must overwrite its own
   batch-scoped directory, never append a duplicate copy.
3. web.py tracking constants are authoritative: extending/shrinking
   TRACKING_PREFIXES / TRACKING_EXACT changes the canonicalizer
   (previously only the first tuple elements were consulted).
"""

from __future__ import annotations

import json
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.dedup import (
    _index_meta_path,
    read_ref_index,
    read_ref_index_meta,
    refresh_ref_index,
    write_ref_index,
)


def _mkdocs(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, text string")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


BOILER = "the quick brown fox jumps over the lazy dog again and again"


def test_orphan_skip_not_resurrected(spark, tmp_path):
    """Crash batch B before its meta commit, then admit a DIFFERENT
    batch C whose ids are higher: C's commit raises the high-water mark
    past B's orphan directories, which under the pre-r16 batch<=hi
    filter would suddenly expose rows that were never counted in C's
    occupancy scan. The admission-time GC must leave the index equal to
    a from-scratch rebuild over (base ∪ C) — B fully absent."""
    base = [(i, f"unique document number {i} with words {i * 7}")
            for i in range(12)]
    a = _mkdocs(spark, base)
    b = _mkdocs(spark, [(100 + i, BOILER) for i in range(6)])
    c = _mkdocs(spark, [(200 + i, f"later crawl doc {i} fresh tokens {i*13}")
                        for i in range(4)])

    path = str(tmp_path / "idx")
    write_ref_index(a, path, max_bucket=3)
    meta_before = read_ref_index_meta(path)

    # batch B refreshes fully, then its COMMIT is lost
    refresh_ref_index(spark, path, b)
    with open(_index_meta_path(path), "w") as fh:
        json.dump(meta_before, fh)

    # the crash-then-skip: admit C instead of retrying B
    refresh_ref_index(spark, path, c)
    w_r, b_r = read_ref_index(spark, path)
    assert w_r.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)).count() == 0
    assert b_r.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)).count() == 0

    # refresh == rebuild over exactly the committed corpus
    path2 = str(tmp_path / "idx2")
    write_ref_index(a.unionByName(c), path2, max_bucket=3)
    w_s, b_s = read_ref_index(spark, path2)
    wide_cols = sorted(w_r.columns)
    assert _rows(w_r, wide_cols) == _rows(w_s, wide_cols)
    band_cols = ["doc_id", "band", "band_key"]
    assert _rows(b_r, band_cols) == _rows(b_s, band_cols)


def test_url_ledger_replay_idempotent(spark, sf_dir):
    """Replaying the SAME micro-batches (checkpoint lost, stream
    re-drained from scratch) leaves the ledger byte-count unchanged:
    each batch overwrites its own batch=<id> directory. Under the old
    flat append, the replay doubled every row and inflated
    n_docs/n_raw_forms at drain."""
    from ngff_zarr_spark.functions.web import url_dedup
    from ngff_zarr_spark.gate import _doc_urls, _docs
    from ngff_zarr_spark.streaming.pipeline import (
        streaming_url_dedup,
        url_dedup_from_ledger,
    )

    base = f"/tmp/url_replay_{uuid.uuid4().hex[:8]}"
    docs_dir, ckpt, ledger = f"{base}/docs", f"{base}/ckpt", f"{base}/led"
    docs = _docs(spark, sf_dir).where(F.col("doc_id") % 7 == 0)
    docs.coalesce(2).write.parquet(docs_dir)

    def drain():
        _, start = streaming_url_dedup(
            spark, docs_dir, ckpt, ledger, _doc_urls, max_files_per_trigger=1
        )
        q = start()
        assert q.awaitTermination(180)

    drain()
    n_first = spark.read.parquet(ledger).count()
    assert n_first == docs.count()

    # simulate the at-least-once replay: lose the checkpoint, re-drain —
    # every micro-batch re-executes with the same batch ids
    shutil.rmtree(ckpt, ignore_errors=True)
    drain()
    assert spark.read.parquet(ledger).count() == n_first

    got = {tuple(r) for r in url_dedup_from_ledger(spark, ledger).collect()}
    want = {tuple(r) for r in url_dedup(_doc_urls(docs)).collect()}
    assert got == want
    shutil.rmtree(base, ignore_errors=True)


def _canon(spark, url):
    from ngff_zarr_spark.functions.web import canonicalize_url

    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonicalize_url(F.col("u")).alias("c")).collect()[0]["c"]


def test_tracking_constants_are_authoritative(spark, monkeypatch):
    """Extending the module-level constants changes the canonicalizer;
    shrinking them to one element no longer raises IndexError."""
    import ngff_zarr_spark.functions.web as web

    # stock behavior: msclkid is NOT tracked
    assert _canon(spark, "https://s.com/x?msclkid=7&a=1") == (
        "https://s.com/x?a=1&msclkid=7"
    )
    monkeypatch.setattr(web, "TRACKING_EXACT", ("gclid", "fbclid", "msclkid"))
    assert _canon(spark, "https://s.com/x?msclkid=7&a=1") == "https://s.com/x?a=1"

    # a new prefix takes effect too
    monkeypatch.setattr(web, "TRACKING_PREFIXES", ("utm_", "mc_"))
    assert _canon(spark, "https://s.com/x?mc_eid=9&a=1") == "https://s.com/x?a=1"

    # shrunken tuples: behavior degrades gracefully, no IndexError
    monkeypatch.setattr(web, "TRACKING_EXACT", ("gclid",))
    assert _canon(spark, "https://s.com/x?fbclid=1&a=1") == (
        "https://s.com/x?a=1&fbclid=1"
    )
    assert _canon(spark, "https://s.com/x?gclid=1&a=1") == "https://s.com/x?a=1"


def test_compact_ref_index_equals_source(spark, tmp_path):
    """Compaction folds N batch directories into one per table, loses
    nothing, invents nothing, and stays refreshable (monotonic guard
    carries over via the copied meta)."""
    import os

    from ngff_zarr_spark.functions.dedup import (
        compact_ref_index,
        incremental_dedup,
    )

    base = [(i, f"unique document number {i} with words {i * 7}")
            for i in range(12)]
    a = _mkdocs(spark, base)
    b = _mkdocs(spark, [(100 + i, BOILER) for i in range(6)])
    c = _mkdocs(spark, [(200 + i, f"later crawl doc {i} tokens {i * 13}")
                        for i in range(4)])
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_ref_index(a, src, max_bucket=3)
    refresh_ref_index(spark, src, b)
    refresh_ref_index(spark, src, c)
    assert len(os.listdir(os.path.join(src, "wide"))) == 3

    compact_ref_index(spark, src, dst)
    # one batch directory per table
    assert os.listdir(os.path.join(dst, "wide")) == ["batch=203"]
    assert os.listdir(os.path.join(dst, "bands")) == ["batch=203"]
    # identical meta + identical row sets
    assert read_ref_index_meta(dst) == read_ref_index_meta(src)
    ws, bs = read_ref_index(spark, src)
    wd, bd = read_ref_index(spark, dst)
    cols = sorted(ws.columns)
    assert _rows(ws, cols) == _rows(wd, cols)
    bc = ["doc_id", "band", "band_key"]
    assert _rows(bs, bc) == _rows(bd, bc)

    # identical probe verdicts through the gatekeeper
    probe = _mkdocs(spark, [(500, BOILER), (501, "novel fresh words here")])
    vs = {tuple(r) for r in incremental_dedup(probe, None, ref_wide=ws, ref_bands=bs).collect()}
    vd = {tuple(r) for r in incremental_dedup(probe, None, ref_wide=wd, ref_bands=bd).collect()}
    assert vs == vd

    # compacted index keeps accepting batches
    d = _mkdocs(spark, [(300, "yet another later document entirely")])
    refresh_ref_index(spark, dst, d)
    assert read_ref_index_meta(dst)["max_doc_id"] == 300
