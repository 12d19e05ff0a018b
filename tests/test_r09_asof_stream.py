"""Stateful streaming as-of (streaming/pipeline.py
streaming_asof_attribution): the per-user last-known-click state must
carry matches ACROSS micro-batches, and a full drain must equal the
batch asof_join.

The gate proves the single-batch drain against the native DuckDB ASOF
oracle; this test drives maxFilesPerTrigger=1 over TIME-ORDERED files
so clicks and the purchases they attribute land in different
micro-batches — every cross-file match rides the two-long state.
"""

import os
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
    import shutil

    shutil.rmtree(path + ".tmp", ignore_errors=True)


@pytest.fixture()
def ordered_events_dir(spark, tmp_path):
    """3 files, strictly increasing ts ranges; every purchase in file N
    matches a click from file N-1 (cross-batch by construction), plus
    same-ts tie and no-match cases inside file 1."""
    d = str(tmp_path / "events")
    os.makedirs(d, exist_ok=True)
    f1 = [
        # user 1: two same-ts clicks (tiebreak: greater event_id wins)
        (100, 1000, 1, "click", 0.0),
        (101, 1000, 1, "click", 0.0),
        # user 1 purchase at the same ts: inclusive match -> click 101
        (102, 1000, 1, "purchase", 0.0),
        # user 2: purchase with NO prior click -> NULL match
        (103, 1500, 2, "purchase", 0.0),
        # user 3: click that will be matched two batches later
        (104, 1800, 3, "click", 0.0),
    ]
    f2 = [
        # user 1: purchase matched by file-1 click via STATE
        (200, 2000, 1, "purchase", 0.0),
        # user 2: first click
        (201, 2500, 2, "click", 0.0),
    ]
    f3 = [
        # user 2: purchase matched by file-2 click via state
        (300, 3000, 2, "purchase", 0.0),
        # user 3: purchase matched by the file-1 click (state held
        # through an interleaving batch with no user-3 rows)
        (301, 3500, 3, "purchase", 0.0),
    ]
    for i, rows in enumerate((f1, f2, f3)):
        _write_file(spark, os.path.join(d, f"f{i}.parquet"), rows)
        time.sleep(0.05)  # distinct mtimes: files drain oldest-first
    return d


def test_cross_batch_state_matches(spark, ordered_events_dir, tmp_path):
    from ngff_zarr_spark.streaming.pipeline import streaming_asof_attribution

    table = f"asof_stream_{uuid.uuid4().hex[:8]}"
    _, start = streaming_asof_attribution(
        spark, ordered_events_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q = start(table)
    assert q.awaitTermination(180)
    got = {
        r.event_id: (r.event_id_click, r.ts_click)
        for r in spark.sql(f"select * from {table}").collect()
    }
    assert got == {
        102: (101, 1000),   # same-ts inclusive, greater-id tiebreak
        103: (None, None),  # no prior click
        200: (101, 1000),   # cross-batch via state
        300: (201, 2500),   # cross-batch via state
        301: (104, 1800),   # state held across an idle batch
    }


def test_multi_batch_drain_equals_batch_asof(spark, ordered_events_dir, tmp_path):
    from ngff_zarr_spark.functions.events import asof_join
    from ngff_zarr_spark.streaming.pipeline import streaming_asof_attribution

    table = f"asof_stream_{uuid.uuid4().hex[:8]}"
    _, start = streaming_asof_attribution(
        spark, ordered_events_dir, str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    q = start(table)
    assert q.awaitTermination(180)
    got = sorted(
        map(tuple, spark.sql(f"select * from {table}").collect())
    )
    ev = spark.read.parquet(ordered_events_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    want = sorted(
        map(
            tuple,
            asof_join(
                purchases, clicks, key="user_id", ts_col="ts",
                value_cols=("event_id",), suffix="_click",
            )
            .select("user_id", "ts", "event_id", "event_id_click", "ts_click")
            .collect(),
        )
    )
    assert got == want
