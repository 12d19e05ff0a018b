"""events.ts physical-type normalization (functions/events.py).

The driver's testdata has shipped ``ts`` as TIMESTAMP(NANOS)-read-as-long
and as timestamp[us]; every events operator assumes long nanoseconds.
These tests pin that the normalizer is exact (integer expressions, no
timezone dependence) for each reader outcome and that the streaming
source derives its schema from the files instead of hardcoding one.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ngff_zarr_spark.functions.events import (
    events_stream_source,
    normalize_events_ts,
)

US = [0, 1, 1_700_000_000_000_000, 1_700_000_123_456_789]


def _write_events(path, ts_array):
    table = pa.table(
        {
            "event_id": pa.array(range(len(US)), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * len(US), pa.int64()),
            "event_type": pa.array(["click"] * len(US)),
            "value": pa.array([1.5] * len(US)),
        }
    )
    pq.write_table(table, path)


def test_normalize_long_is_noop(spark):
    df = spark.createDataFrame([(u * 1000,) for u in US], "ts long")
    out = normalize_events_ts(df)
    assert out is df  # identical plan, not merely equal values
    assert [r.ts for r in out.orderBy("ts").collect()] == sorted(u * 1000 for u in US)


def test_normalize_timestamp_us_exact(spark, tmp_path):
    """timestamp[us] parquet → TIMESTAMP_NTZ → exact long nanoseconds,
    independent of the session timezone (wall-clock integer math)."""
    p = str(tmp_path / "events.parquet")
    _write_events(p, pa.array(US, pa.timestamp("us")))
    out = normalize_events_ts(spark.read.parquet(p))
    assert dict(out.dtypes)["ts"] == "bigint"
    got = sorted(r.ts for r in out.collect())
    assert got == sorted(u * 1000 for u in US)


def test_normalize_timestamp_us_timezone_independent(spark, tmp_path):
    """Same file, a non-UTC session timezone: identical longs (the
    conversion must never route through the session zone)."""
    p = str(tmp_path / "events.parquet")
    _write_events(p, pa.array(US, pa.timestamp("us")))
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        got = sorted(r.ts for r in normalize_events_ts(spark.read.parquet(p)).collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    assert got == sorted(u * 1000 for u in US)


def test_normalize_rejects_unexpected_type(spark):
    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unsupported"):
        normalize_events_ts(df)


def test_stream_source_derives_schema(spark, tmp_path):
    """readStream schema comes from the live footers: a timestamp[us]
    directory streams the same long-ns rows the batch path produces
    (the hardcoded-long schema silently misread these bytes)."""
    events_dir = str(tmp_path / "events_stream")
    import os

    os.makedirs(events_dir)
    _write_events(os.path.join(events_dir, "part-0.parquet"),
                  pa.array(US, pa.timestamp("us")))
    ev = events_stream_source(spark, events_dir)
    assert ev.isStreaming
    assert dict(ev.dtypes)["ts"] == "bigint"
    sink = "events_schema_sink"
    q = (
        ev.writeStream.outputMode("append").format("memory").queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(r.ts for r in spark.table(sink).collect())
    assert got == sorted(u * 1000 for u in US)
