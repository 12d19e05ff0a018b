"""r15: streaming heavy hitters (streaming/pipeline.
streaming_heavy_hitters) — candidate-ledger + drain-time recount.

Pins the two claims the gate's single drain can't: (1) stream == batch
under ANY file split (1, 2, 4 micro-batches), and (2) the INCREMENTAL
story — after a drain, new files arriving in the source re-drain from
the same checkpoint, only the NEW batches run the candidate pass, and
the recount over the accumulated corpus equals a from-scratch batch
run. That's the continuously-growing-corpus shape: per-ingest work is
batch-sized, exactness is preserved."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.sketch import heavy_hitters, hh_recount
from ngff_zarr_spark.streaming.pipeline import streaming_heavy_hitters

PHI = (1, 10)  # 10% — small synthetic corpora
K = 20


def _toks(df):
    return df.select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("token"),
    )


def _mkdocs(spark, seed, n=40):
    # deterministic skew: token 'hot' dominates; tail tokens unique-ish
    rows = [
        (seed * 1000 + i,
         "hot hot hot filler" if i % 2 == 0 else f"tail{i % 7} hot misc{i}",
         "en" if i % 3 else "de")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _drain(spark, docs_dir, ckpt, cand_dir, n_files=None):
    _, start = streaming_heavy_hitters(
        spark, docs_dir, ckpt, cand_dir, _toks, ("lang", "token"), K,
        max_files_per_trigger=n_files,
    )
    q = start()
    assert q.awaitTermination(180)


def _result(spark, docs_dir, cand_dir):
    return {
        tuple(r)
        for r in hh_recount(
            _toks(spark.read.parquet(docs_dir)),
            spark.read.parquet(cand_dir),
            ("lang", "token"),
            *PHI,
        ).collect()
    }


def _batch(spark, docs_dir):
    return {
        tuple(r)
        for r in heavy_hitters(
            _toks(spark.read.parquet(docs_dir)), ("lang", "token"), *PHI, k=K
        ).collect()
    }


def _dirs(tag):
    base = f"/tmp/hh_stream_{tag}_{uuid.uuid4().hex[:8]}"
    d = (f"{base}/docs", f"{base}/ckpt", f"{base}/cand")
    for p in d:
        shutil.rmtree(p, ignore_errors=True)
    return d


def test_stream_equals_batch_any_split(spark):
    docs = _mkdocs(spark, 1)
    for n_parts, per_trigger in ((1, None), (2, 1), (4, 1)):
        docs_dir, ckpt, cand_dir = _dirs(f"split{n_parts}")
        docs.repartition(n_parts, "doc_id").write.parquet(docs_dir)
        _drain(spark, docs_dir, ckpt, cand_dir, per_trigger)
        assert _result(spark, docs_dir, cand_dir) == _batch(spark, docs_dir), n_parts


def test_incremental_redrain_from_checkpoint(spark):
    docs_dir, ckpt, cand_dir = _dirs("incr")
    _mkdocs(spark, 1).coalesce(1).write.parquet(docs_dir)
    _drain(spark, docs_dir, ckpt, cand_dir, 1)
    first = _result(spark, docs_dir, cand_dir)
    n_cand_first = spark.read.parquet(cand_dir).count()

    # a new crawl batch lands as a new file; re-drain SAME checkpoint
    _mkdocs(spark, 2, n=60).coalesce(1).write.mode("append").parquet(docs_dir)
    _drain(spark, docs_dir, ckpt, cand_dir, 1)
    n_cand_second = spark.read.parquet(cand_dir).count()
    # only the new batch appended candidates (≤ K per its partitions);
    # the old files were NOT re-processed
    assert 0 < n_cand_second - n_cand_first <= K

    # the recount over the grown corpus equals a from-scratch batch run
    combined = _result(spark, docs_dir, cand_dir)
    assert combined == _batch(spark, docs_dir)
    # and the answer genuinely changed with the new data (the second
    # batch shifts the 10% threshold): sanity that this isn't vacuous
    assert combined != first or spark.read.parquet(docs_dir).count() == 40
