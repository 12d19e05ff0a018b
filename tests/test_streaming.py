"""Streaming (T1): incremental HCS acquisition equals the batch-written
store; streaming hourly aggregate equals the batch aggregate.
"""

from __future__ import annotations

import json

import pytest

from ngff_zarr_spark.fixtures import ImageSpec, pixel_df
from ngff_zarr_spark.hcs import (
    Plate,
    PlateColumn,
    PlateRow,
    PlateWell,
    from_hcs_zarr,
    to_hcs_zarr,
    write_hcs_well_image,
)
from ngff_zarr_spark.model import NgffImage
from ngff_zarr_spark.ome_zarr_api import to_multiscales
from ngff_zarr_spark.sources.zarr_store import ZarrStore
from ngff_zarr_spark.streaming.pipeline import (
    incremental_well_write_stream,
    streaming_events_hourly,
    write_manifest,
)


def _plate():
    return Plate(
        columns=[PlateColumn("1"), PlateColumn("2")],
        rows=[PlateRow("A")],
        wells=[PlateWell("A/1", 0, 0), PlateWell("A/2", 0, 1)],
        name="Stream Plate",
    )


def _field_ms(spark, seed: int):
    spec = ImageSpec(f"f{seed}", z=2, y=4, x=4)
    img = NgffImage(
        data=pixel_df(spark, spec).select("t", "c", "z", "y", "x", "v"),
        dims=["z", "y", "x"],
        shape={"z": 2, "y": 4, "x": 4},
        scale={"z": 1.0, "y": 1.0, "x": 1.0},
        translation={"z": 0.0, "y": 0.0, "x": 0.0},
    )
    return to_multiscales(img, scale_factors=[], chunks={"z": 2, "y": 4, "x": 4})


def _store_state(root) -> dict:
    """Store content key → bytes (JSON docs parsed for order-insensitive
    comparison)."""
    store = ZarrStore(str(root))
    out = {}
    for key in store.list_keys():
        data = store.get(key)
        if key.endswith((".zattrs", ".zgroup", ".zarray", "zarr.json", ".zmetadata")):
            out[key] = json.loads(data)
        else:
            out[key] = data
    return out


def test_incremental_stream_equals_batch(spark, tmp_path):
    plate = _plate()
    fields = [("A", "1", 0), ("A", "1", 1), ("A", "2", 0)]

    # batch-written reference store
    batch_store = str(tmp_path / "batch.ome.zarr")
    to_hcs_zarr(plate, batch_store)
    for row, col, fi in fields:
        write_hcs_well_image(
            spark, batch_store, _field_ms(spark, fi), plate, row, col, field_index=fi
        )

    # streaming store: manifests dropped one at a time, drained by a
    # foreachBatch availableNow pass each time (incremental acquisition)
    stream_store = str(tmp_path / "stream.ome.zarr")
    to_hcs_zarr(plate, stream_store)
    manifest_dir = str(tmp_path / "manifests")
    ckpt = str(tmp_path / "ckpt")
    for i, (row, col, fi) in enumerate(fields):
        write_manifest(manifest_dir, row, col, fi)
        q = incremental_well_write_stream(
            spark,
            manifest_dir,
            stream_store,
            plate,
            lambda r, c, f: _field_ms(spark, f),
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    assert _store_state(tmp_path / "stream.ome.zarr") == _store_state(
        tmp_path / "batch.ome.zarr"
    )
    cat = from_hcs_zarr(spark, stream_store)
    got = {(r.well_path, r.field_index) for r in cat["well_images"].collect()}
    assert got == {("A/1", 0), ("A/1", 1), ("A/2", 0)}


def test_streaming_hourly_matches_batch(spark, tmp_path):
    import shutil

    from ngff_zarr_spark import gate

    sf_dir = "/root/testdata/sf0.001"
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "events.parquet")

    agg, start = streaming_events_hourly(
        spark, str(events_dir), str(tmp_path / "ckpt2")
    )
    q = start("stream_hourly")
    q.awaitTermination(120)
    got = {
        (r.hour_epoch, r.event_type): (r.n, round(r.sum_value, 6))
        for r in spark.sql("select * from stream_hourly").collect()
    }
    want = {
        (r.hour_epoch, r.event_type): (r.n, round(r.sum_value, 6))
        for r in gate.q_events_hourly(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Incremental arrival: documents drained in TWO micro-batch rounds
    (two availableNow runs over a shared checkpoint) fold into the same
    dedup ledger the one-shot batch aggregate produces."""
    import shutil

    import pyarrow.parquet as pq

    from ngff_zarr_spark.functions.dedup import exact_dedup
    from ngff_zarr_spark.streaming.pipeline import streaming_exact_dedup

    sf_dir = "/root/testdata/sf0.001"
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    # split the table into two files so the second drain sees new data
    table = pq.read_table(f"{sf_dir}/documents.parquet")
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), docs_dir / "part-0.parquet")

    ckpt = str(tmp_path / "ckpt_dedup")
    _, start = streaming_exact_dedup(spark, str(docs_dir), ckpt)
    q = start("stream_dedup_a")
    q.awaitTermination(120)
    n_first = spark.sql("select count(*) n from stream_dedup_a").first().n
    assert 0 < n_first  # first increment produced groups

    pq.write_table(table.slice(half), docs_dir / "part-1.parquet")
    _, start2 = streaming_exact_dedup(spark, str(docs_dir), ckpt)
    q2 = start2("stream_dedup_b")
    q2.awaitTermination(120)

    got = {
        r.content_md5: (r.n_docs, r.representative)
        for r in spark.sql("select * from stream_dedup_b").collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r.content_md5: (r.n_docs, r.representative)
        for r in exact_dedup(docs).collect()
    }
    assert got == want


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Native session_window under readStream: append-mode output equals
    the batch sessions whose end precedes the final watermark."""
    import shutil

    from ngff_zarr_spark import gate
    from ngff_zarr_spark.streaming.pipeline import streaming_sessionize

    sf_dir = "/root/testdata/sf0.001"
    events_dir = tmp_path / "events_sw"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "events.parquet")

    agg, start = streaming_sessionize(
        spark, str(events_dir), str(tmp_path / "ckpt_sw")
    )
    q = start("stream_sessions")
    q.awaitTermination(120)
    got = {
        (r.user_id, r.start_us, r.end_us): r.n_events
        for r in spark.sql("select * from stream_sessions").collect()
    }

    batch = gate.q_events_session_window(spark, sf_dir).collect()
    # final watermark = max event time - 1 hour delay
    max_us = max(r.end_us - 1800 * 1_000_000 for r in batch)
    want = {
        (r.user_id, r.start_us, r.end_us): r.n_events
        for r in batch
        if r.end_us <= max_us - 3600 * 1_000_000
    }
    assert want, "fixture must close at least one session before the watermark"
    assert got == want


def test_incremental_stream_recovers_from_checkpoint(spark, tmp_path):
    """VERDICT r4 ask #9 — kill-and-restart recovery: the stream dies
    mid-manifest-batch (a field's pyramid build raises after two wells
    were already written), restarts from the same checkpoint, and the
    replayed batch converges to EXACTLY the batch-written store —
    idempotent well upserts give effective exactly-once even though
    foreachBatch is at-least-once under failure. A post-recovery
    manifest is then processed without re-running the recovered batch."""
    from pyspark.errors import StreamingQueryException

    plate = _plate()
    fields = [("A", "1", 0), ("A", "1", 1), ("A", "2", 0)]

    # batch-written reference store
    batch_store = str(tmp_path / "batch.ome.zarr")
    to_hcs_zarr(plate, batch_store)
    for row, col, fi in fields:
        write_hcs_well_image(
            spark, batch_store, _field_ms(spark, fi), plate, row, col, field_index=fi
        )

    stream_store = str(tmp_path / "stream.ome.zarr")
    to_hcs_zarr(plate, stream_store)
    manifest_dir = str(tmp_path / "manifests")
    ckpt = str(tmp_path / "ckpt")
    for row, col, fi in fields:
        write_manifest(manifest_dir, row, col, fi)

    calls: list[tuple] = []
    crashed = {"done": False}

    def flaky_ms(r, c, f):
        calls.append((r, c, f))
        # fields sort (A,1,0),(A,1,1),(A,2,0): the first two wells are
        # already written when the third raises — a mid-batch crash
        if (r, c, f) == ("A", "2", 0) and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected acquisition failure")
        return _field_ms(spark, f)

    q = incremental_well_write_stream(
        spark, manifest_dir, stream_store, plate, flaky_ms, checkpoint_dir=ckpt
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    assert crashed["done"]

    # restart from the same checkpoint: the failed batch replays fully
    q2 = incremental_well_write_stream(
        spark, manifest_dir, stream_store, plate, flaky_ms, checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)

    assert _store_state(tmp_path / "stream.ome.zarr") == _store_state(
        tmp_path / "batch.ome.zarr"
    )
    cat = from_hcs_zarr(spark, stream_store)
    rows = [(r.well_path, r.field_index) for r in cat["well_images"].collect()]
    assert sorted(rows) == [("A/1", 0), ("A/1", 1), ("A/2", 0)]  # no dupes
    # replay reprocessed the whole failed batch (at-least-once): 3
    # attempts before the crash would have been 3 calls; replay adds 3
    assert len(calls) == 6

    # a NEW manifest after recovery is processed exactly once, without
    # re-running the recovered batch
    calls.clear()
    write_manifest(manifest_dir, "A", "2", 1)
    write_hcs_well_image(
        spark, batch_store, _field_ms(spark, 1), plate, "A", "2", field_index=1
    )
    q3 = incremental_well_write_stream(
        spark, manifest_dir, stream_store, plate, flaky_ms, checkpoint_dir=ckpt
    )
    q3.awaitTermination(120)
    assert calls == [("A", "2", 1)]
    assert _store_state(tmp_path / "stream.ome.zarr") == _store_state(
        tmp_path / "batch.ome.zarr"
    )


def test_streaming_replay_dedup_exactly_once(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a doubled (redelivered) events
    directory drains to each event exactly once."""
    import shutil

    from ngff_zarr_spark.streaming.pipeline import streaming_dedup_events

    sf_dir = "/root/testdata/sf0.001"
    events_dir = tmp_path / "dup_events"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "b.parquet")

    _, start = streaming_dedup_events(
        spark, str(events_dir), str(tmp_path / "ckpt_dup")
    )
    q = start("stream_replay_dedup")
    q.awaitTermination(120)
    got = spark.sql(
        "select count(*) n, count(distinct event_id) d from stream_replay_dedup"
    ).first()
    want = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert got.n == got.d == want


def test_count_sessions_cross_batch_state(spark, tmp_path):
    """applyInPandasWithState count-based sessions: a partial chunk
    buffered in batch 1 completes in batch 2 with members from BOTH
    batches — start/end span the batches (min/max over the real chunk
    members, including out-of-order arrivals), proving the state
    machine carries and merges across micro-batches."""
    import os
    import time
    import uuid

    from ngff_zarr_spark.streaming.pipeline import streaming_count_sessions

    events_dir = tmp_path / "ev"
    events_dir.mkdir()

    def _write(name, ts_vals, first_event_id, mtime):
        rows = [
            (first_event_id + i, int(t), 1, "click", 1.0, "{}")
            for i, t in enumerate(ts_vals)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts long, user_id long, event_type string, value double, props string",
        )
        sub = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(sub))
        part = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        dst = events_dir / f"{name}.parquet"
        os.rename(sub / part, dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    # batch 1: 8 events at ts 100..107; batch 2: 7 events at ts 50..56
    # (EARLIER than batch 1 — arrival order, not time order, chunks)
    _write("a", range(100, 108), 0, now - 100)
    _write("b", range(50, 57), 100, now - 50)

    table = f"cs_{uuid.uuid4().hex[:8]}"
    _, start = streaming_count_sessions(
        spark, str(events_dir), str(tmp_path / "ckpt"), k=10,
        max_files_per_trigger=1,
    )
    q = start(table)
    assert q.awaitTermination(120)
    rows = spark.sql(f"select * from {table}").collect()
    assert len(rows) == 1  # 15 events -> one complete chunk of 10
    r = rows[0]
    assert (r.user_id, r.chunk, r.n_events) == (1, 0, 10)
    # chunk members: 8 from batch1 (ts 100..107) + first 2 of batch2
    # in sorted order (ts 50, 51)
    assert (r.start_ts, r.end_ts) == (50, 107)
