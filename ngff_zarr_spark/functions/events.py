"""Events-table schema normalization.

The synthetic ``events.parquet`` testdata has shipped with two physical
types for ``ts`` across driver regenerations:

* ``TIMESTAMP(NANOS)`` — Spark's parquet reader only accepts it with
  ``spark.sql.legacy.parquet.nanosAsLong=true``, arriving as a long of
  nanoseconds-since-epoch.
* ``timestamp[us]`` (no timezone) — arrives as ``TIMESTAMP_NTZ``
  (``spark.sql.parquet.inferTimestampNTZ.enabled`` default) or
  ``TIMESTAMP`` if NTZ inference is off.

Every events operator in this repo (hourly windows, sessionization,
count-min) is written against one contract: **``ts`` is a long of
nanoseconds since the epoch**, because nanosecond arithmetic must stay
in exact integer space (ns longs exceed double's 2^53 exact range; see
the ``div`` comments at the call sites). :func:`normalize_events_ts`
adapts whatever the reader produced to that contract with exact integer
expressions — no floats, no timezone dependence.

The DuckDB oracle side needs no twin: ``epoch_ns(ts)`` is type-agnostic
there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

__all__ = ["normalize_events_ts", "events_stream_source"]


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Return ``df`` with ``ts`` as long nanoseconds-since-epoch.

    Handles the three reader outcomes exactly:

    * long (TIMESTAMP(NANOS) via ``nanosAsLong``) — already ns, no-op;
    * TIMESTAMP_NTZ (``timestamp[us]`` files) — ``timestampdiff`` in
      MICROSECOND against the NTZ epoch literal: pure wall-clock
      integer arithmetic, independent of the session timezone;
    * TIMESTAMP — ``unix_micros``, exact for µs-precision data.

    Both timestamp paths stay in JVM codegen (no UDFs) and multiply by
    1000 as a long, so values are bit-identical to what a NANOS file
    would have delivered for µs-precision data.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df
    if isinstance(ts_type, TimestampNTZType):
        micros = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    elif isinstance(ts_type, TimestampType):
        micros = F.unix_micros("ts")
    else:  # pragma: no cover - future driver schema drift
        raise TypeError(
            f"events.ts has unsupported type {ts_type!s}; expected long, "
            "timestamp, or timestamp_ntz"
        )
    return df.withColumn("ts", (micros * F.lit(1000)).cast("long"))


def events_stream_source(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` source for an events parquet directory with ``ts``
    normalized to long nanoseconds.

    ``readStream`` needs an explicit schema; hardcoding one is how the
    timestamp[us] regeneration silently corrupted the round-5 streaming
    twin (a ``ts long`` schema reinterprets µs-timestamp bytes with no
    error). Instead the schema is derived from the live file footers by
    a driver-side batch read (footer-only, cheap), so the stream always
    reads what is actually on disk, then normalizes through the same
    expression as the batch path.
    """
    # NANOS-format files need the legacy conf or the schema-deriving
    # batch read itself fails analysis — same defensive set as the
    # batch path (gate._events), static reader option, never unset
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        batch_schema = spark.read.parquet(events_dir).schema
    except Exception:
        # empty/not-yet-created source dir: no footers to derive from.
        # Fall back to the documented long-ns layout (TESTDATA.md) so
        # the stream can START before data arrives — matching the
        # behavior of a hardcoded-schema readStream. If files later
        # land with a different physical ts type, normalize_events_ts
        # handles long; a timestamp re-generation would need a restart
        # (at which point footers exist and the derivation path wins).
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        batch_schema = StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", LongType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ]
        )
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger is not None:
        # split the drain into one-file micro-batches (oldest mtime
        # first) — lets tests drive cross-batch stateful operators
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    ev = reader.parquet(events_dir)
    return normalize_events_ts(ev)
