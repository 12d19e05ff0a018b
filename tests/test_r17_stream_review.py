"""r17 streaming self-review fixes, each pinned.

1. streaming_asof_attribution: with OUT-OF-ORDER micro-batches, a
   purchase must attribute to the NEWEST valid click among the in-batch
   ffill candidate and the state carry — the old code preferred any
   in-batch click, so a stale click arriving late beat the carried
   newer one.
2. write_manifest appears atomically in the watched directory (write to
   a hidden temp, then rename) — a continuous stream can never list a
   half-written manifest.
3. The foreachBatch parquet sinks (incremental-dedup verdicts,
   heavy-hitter candidate ledger, streaming IVF index) are
   replay-idempotent by layout: checkpoint loss + full re-drain leaves
   the sink row-identical (batch=<id> + mode=overwrite, the ADVICE r15
   URL-ledger pattern).
4. docs_stream_source starts over an EMPTY directory (schema fallback).
"""

import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F


def _write_file(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path + ".tmp")
    part = [f for f in os.listdir(path + ".tmp") if f.endswith(".parquet")][0]
    os.replace(os.path.join(path + ".tmp", part), path)
    shutil.rmtree(path + ".tmp", ignore_errors=True)


def test_asof_out_of_order_batch_prefers_newest_valid_click(spark, tmp_path):
    """Batch 1 delivers click ts=100; batch 2 (late data) delivers an
    OLDER click ts=50 plus the purchase ts=150. The correct as-of match
    is the carried ts=100 click; preferring the in-batch ffill match
    unconditionally yields the stale ts=50 click."""
    from ngff_zarr_spark.streaming.pipeline import streaming_asof_attribution

    d = str(tmp_path / "events")
    os.makedirs(d, exist_ok=True)
    _write_file(spark, os.path.join(d, "f0.parquet"),
                [(10, 100, 1, "click", 0.0)])
    time.sleep(0.05)
    _write_file(spark, os.path.join(d, "f1.parquet"),
                [(11, 50, 1, "click", 0.0),
                 (12, 150, 1, "purchase", 0.0),
                 # carry newer than THIS purchase -> in-batch click wins
                 (13, 60, 1, "purchase", 0.0)])

    table = f"asof_ooo_{uuid.uuid4().hex[:8]}"
    _, start = streaming_asof_attribution(
        spark, d, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q = start(table)
    assert q.awaitTermination(180)
    got = {r.event_id: (r.event_id_click, r.ts_click)
           for r in spark.sql(f"select * from {table}").collect()}
    assert got[12] == (10, 100), got  # newest valid: the carry
    assert got[13] == (11, 50), got   # carry (ts=100) invalid here


def test_write_manifest_atomic(tmp_path, monkeypatch):
    """No half-written manifest is ever visible under its final name,
    and no visible temp remains (hidden dot-temp during the write)."""
    from ngff_zarr_spark.streaming import pipeline as sp

    d = str(tmp_path / "manifests")
    seen = []
    real_replace = os.replace

    def spying_replace(src, dst):
        # at the rename instant the temp is fully written and hidden
        assert os.path.basename(src).startswith(".")
        with open(src) as fh:
            seen.append(fh.read())
        real_replace(src, dst)

    monkeypatch.setattr(os, "replace", spying_replace)
    sp.write_manifest(d, "A", "1", 0)
    files = os.listdir(d)
    assert len(files) == 1 and files[0].startswith("acq-")
    assert not [f for f in files if f.endswith(".tmp")]
    import json

    assert json.loads(seen[0])["row_name"] == "A"


def _mkdocs_file(spark, path, ids):
    spark.createDataFrame(
        [(i, f"doc {i} words {i * 7} tokens {i * 13}", "en", "web", 20)
         for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_incremental_dedup_sink_replay_idempotent(spark, tmp_path):
    """Checkpoint loss + full re-drain leaves the verdict sink
    row-identical (the pre-fix append sink doubled every row)."""
    from ngff_zarr_spark.functions.dedup import build_ref_index
    from ngff_zarr_spark.streaming.pipeline import streaming_incremental_dedup

    docs_dir = str(tmp_path / "docs")
    _mkdocs_file(spark, docs_dir, range(40))
    ref = build_ref_index(
        spark.createDataFrame(
            [(i, f"doc {i} words {i * 7} tokens {i * 13}") for i in range(0, 40, 2)],
            "doc_id long, text string",
        )
    )
    sink = str(tmp_path / "sink")

    def drain(ck):
        _, start = streaming_incremental_dedup(
            spark, docs_dir, ck, ref, sink, max_files_per_trigger=1
        )
        q = start()
        assert q.awaitTermination(180)
        return sorted(
            map(tuple, spark.read.parquet(sink).drop("batch").collect())
        )

    first = drain(str(tmp_path / "ck1"))
    # lose the checkpoint, replay the whole stream into the same sink
    second = drain(str(tmp_path / "ck2"))
    assert first == second and len(first) == 40


def test_hh_candidate_ledger_replay_idempotent(spark, tmp_path):
    from ngff_zarr_spark.streaming.pipeline import streaming_heavy_hitters

    docs_dir = str(tmp_path / "docs")
    _mkdocs_file(spark, docs_dir, range(60))
    cand_dir = str(tmp_path / "cand")

    def keyed(df):
        return df.select("lang", F.explode(F.split(F.col("text"), " ")).alias("token"))

    def drain(ck):
        _, start = streaming_heavy_hitters(
            spark, docs_dir, ck, cand_dir, keyed, ("lang", "token"), 5,
            max_files_per_trigger=1,
        )
        q = start()
        assert q.awaitTermination(180)
        return sorted(
            map(tuple, spark.read.parquet(cand_dir).drop("batch").collect())
        )

    assert drain(str(tmp_path / "ck1")) == drain(str(tmp_path / "ck2"))


def test_ivf_index_replay_idempotent_and_probeable(spark, tmp_path):
    import numpy as np

    from ngff_zarr_spark.functions.similarity import ivf_topk_partitioned
    from ngff_zarr_spark.streaming.pipeline import streaming_ivf_index_build

    dim = 4
    emb_dir = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(dim)]) for i in range(32)],
        "vec_id long, embedding array<double>",
    ).coalesce(2).write.mode("overwrite").parquet(emb_dir)
    C = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])
    Cn = np.sqrt((C * C).sum(axis=1))
    index = str(tmp_path / "index")

    def drain(ck):
        q = streaming_ivf_index_build(spark, emb_dir, index, ck, (C, Cn), dim=dim)
        assert q.awaitTermination(180)
        return sorted(
            map(tuple, spark.read.parquet(index)
                .select("vec_id", "cell").collect())
        )

    first = drain(str(tmp_path / "ck1"))
    assert len(first) == 32  # every vector exactly once
    assert drain(str(tmp_path / "ck2")) == first
    # the batch-layout probe reads the batch=<id>/cell=N layout fine
    top = ivf_topk_partitioned(spark, index, [0, 1], k=2, n_probe=2)
    assert top.count() == 4


def test_docs_stream_source_starts_on_empty_dir(spark, tmp_path):
    from ngff_zarr_spark.streaming.pipeline import docs_stream_source

    d = str(tmp_path / "empty_docs")
    os.makedirs(d, exist_ok=True)
    src = docs_stream_source(spark, d)
    assert src.isStreaming
    assert [f.name for f in src.schema.fields][:2] == ["doc_id", "text"]
