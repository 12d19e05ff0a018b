"""r13 streaming twin of priority sampling (streaming/pipeline.
streaming_priority_sample): cross-batch top-(k+1) merge semantics and
stream == batch equality."""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.sampling import priority_sample
from ngff_zarr_spark.streaming.pipeline import streaming_priority_sample


def _drain(spark, tmpdir, batches, k=2):
    d = os.path.join(tmpdir, "docs")
    ckpt = os.path.join(tmpdir, "ckpt")
    for p in (d, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(d, f"part{i}.parquet"))
    _, start = streaming_priority_sample(
        spark, d, ckpt, k=k, max_files_per_trigger=1
    )
    sink = f"prio_test_{uuid.uuid4().hex[:8]}"
    q = start(sink)
    assert q.awaitTermination(120)
    t = spark.table(sink)
    w = Window.partitionBy("stratum")
    return (
        t.withColumn("_mx", F.max("batch_seq").over(w))
        .filter(F.col("batch_seq") == F.col("_mx"))
        .select(
            "doc_id", "stratum", "weight", "sample_rank",
            F.round("est_w", 6).alias("est_w"),
        )
    )


def test_stream_equals_batch_across_batches(spark, tmp_path):
    rows = [(i, f"s{i % 2}", 10 + 13 * i) for i in range(40)]
    batches = [rows[:15], rows[15:28], rows[28:]]
    got = sorted(
        tuple(r) for r in _drain(spark, str(tmp_path), batches, k=3).collect()
    )
    batch_df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    want = sorted(tuple(r) for r in priority_sample(batch_df, k=3).collect())
    assert got == want


def test_late_heavy_arrival_displaces_early_picks(spark, tmp_path):
    # batch 1: light docs; batch 2: one enormous weight — it must take
    # rank 1 in the final emission even though it arrived last
    batches = [
        [(i, "s", 5) for i in range(10)],
        [(99, "s", 50_000)],
    ]
    got = _drain(spark, str(tmp_path), batches, k=2).collect()
    by_rank = {r.sample_rank: r.doc_id for r in got}
    assert by_rank[1] == 99


def test_emissions_are_versioned_per_batch(spark, tmp_path):
    # the sink holds one emission per (stratum, batch) — the upsert
    # contract the production sink needs; the max-seq read is what the
    # gate consumes
    batches = [[(i, "s", 10 + i) for i in range(5)], [(i, "s", 10 + i) for i in range(5, 10)]]
    d = os.path.join(str(tmp_path), "docs2")
    ckpt = os.path.join(str(tmp_path), "ckpt2")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(d, f"part{i}.parquet"))
    _, start = streaming_priority_sample(
        spark, d, ckpt, k=2, max_files_per_trigger=1
    )
    sink = f"prio_ver_{uuid.uuid4().hex[:8]}"
    q = start(sink)
    assert q.awaitTermination(120)
    seqs = sorted(
        r.batch_seq
        for r in spark.table(sink).select("batch_seq").distinct().collect()
    )
    assert seqs == [1, 2]
