"""Structured Streaming pipelines (SURVEY §2.7, T1-T3).

The reference has no streaming engine; its streaming-shaped capability
is incremental HCS acquisition — fields written one at a time as the
instrument acquires, with the well's image list upserted on every write
(/root/reference py/ngff_zarr/hcs.py:538-765, attr merge :655-716).
Spark shape: a file-source stream of acquisition manifests driving a
``foreachBatch`` sink that batch-writes the micro-batch's fields — each
micro-batch appends ``{row}/{col}/{field}`` data and upserts metadata,
so the store after N increments equals the batch-written store (the
equality tests/test_streaming.py proves).

Also here: the streaming twins of the batch operators — tumbling-window
aggregates (complete mode, drain == batch), watermarked session windows
(append mode — the bounded-state late-data shape), stateful as-of /
count-sessions, and the stateless-ingest ledger family (each micro-batch
writes a batch=<id> directory with mode=overwrite, so at-least-once
replays overwrite their own rows — replay-idempotent by layout).
"""

from __future__ import annotations

import json
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "row_name string, column_name string, field_index long, acquisition_id long"


from ngff_zarr_spark._io_errors import (
    is_missing_or_empty_source as _is_missing_or_empty_source,
)


def docs_stream_source(
    spark: SparkSession, docs_dir: str, max_files_per_trigger=None
):
    """Shared documents file-stream source (code-review r17 — this
    boilerplate had been copy-pasted into eight functions and the
    copies had drifted: falsy-zero vs is-None trigger guards, str vs
    int option values, and none had the empty-directory fallback).
    Schema derives from the live batch footers, exactly like
    functions/events.events_stream_source; an empty or not-yet-created
    directory falls back to the documented documents layout
    (TESTDATA.md) so a stream can START before its producer writes the
    first file. The fallback is NARROW (ADVICE r17): only the
    missing-path / cannot-infer-schema cases fall back — any other
    read failure (corrupt footer, permission, transient FS error) on
    an EXISTING docs dir re-raises, because silently substituting a
    hardcoded 5-column schema there would start the stream reading
    all-null columns instead of surfacing the error."""
    try:
        batch_schema = spark.read.parquet(docs_dir).schema
    except Exception as exc:
        if not _is_missing_or_empty_source(exc):
            raise
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        batch_schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
                StructField("lang", StringType()),
                StructField("source", StringType()),
                StructField("n_chars", LongType()),
            ]
        )
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(int(max_files_per_trigger)))
    return reader.parquet(docs_dir)


def incremental_well_write_stream(
    spark: SparkSession,
    manifest_dir: str,
    store_path: str,
    plate,
    multiscales_for_field: Callable,
    version: str = "0.4",
    checkpoint_dir: Optional[str] = None,
    available_now: bool = True,
    **to_zarr_kwargs,
):
    """T1: stream acquisition manifests (one JSON per acquired field)
    into incremental well writes.

    ``multiscales_for_field(row_name, column_name, field_index)`` builds
    the field's Multiscales (in production: reads the instrument's
    staging area). Returns the StreamingQuery. ``available_now=True``
    (default) drains the existing manifests and stops — the gate/test
    shape; pass False for a continuous stream that keeps ingesting as
    the instrument acquires.

    Each micro-batch is collected to the driver ONLY as the manifest
    rows (a handful of field descriptors, not pixels) — the pixel
    writes inside write_hcs_well_image are normal distributed jobs.
    """
    from ..sources.ome_zarr import register

    # The micro-batch clone copies the session's data-source registry at
    # stream start; registering inside the batch callback is too late
    # (the foreachBatch write then fails DATA_SOURCE_NOT_FOUND), so the
    # ome_zarr source must be on the session BEFORE .start().
    register(spark)

    manifests = (
        spark.readStream.schema(MANIFEST_SCHEMA).json(manifest_dir)
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # per-phase accounting (ngff_zarr_spark.phases) so bench/ops
        # can attribute wall time to manifest collect vs plan build vs
        # the distributed field writes — the variance of this path is
        # scheduling-dominated and needs attribution, not guessing
        from ..phases import phase

        with phase("manifest_collect"):
            rows = batch_df.collect()
        # deterministic order within a batch (manifests may arrive
        # together): well path then field
        rows.sort(key=lambda r: (r.row_name, r.column_name, r.field_index))
        # batched plate ingestion: the whole micro-batch's pixels go
        # through write_hcs_fields, which groups same-geometry
        # single-level fields into ONE multi-array Spark job per
        # max_fields_per_job (pyramidal/mixed fields fall back to the
        # per-field writer inside). Store bytes identical to the
        # field-at-a-time loop; job count per micro-batch drops from
        # O(fields) to O(fields / 64).
        from ..hcs import write_hcs_fields

        with phase("build_multiscales"):
            fields = [
                (
                    r.row_name,
                    r.column_name,
                    int(r.field_index),
                    multiscales_for_field(
                        r.row_name, r.column_name, int(r.field_index)
                    ),
                    int(r.acquisition_id or 0),
                )
                for r in rows
            ]
        with phase("write_fields"):
            write_hcs_fields(
                spark,
                store_path,
                fields,
                plate,
                version=version,
                **to_zarr_kwargs,
            )

    writer = manifests.writeStream.foreachBatch(write_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def write_manifest(manifest_dir: str, row_name: str, column_name: str,
                   field_index: int, acquisition_id: int = 0) -> None:
    """Drop one acquisition manifest (the instrument-side producer).

    ATOMIC into the watched directory (code-review r17): Spark's file
    stream source lists whatever exists — a continuous stream can list
    a half-written JSON, parse it PERMISSIVE into an all-null row, and
    crash the write batch. Write-then-rename makes the file appear
    complete or not at all (rename is atomic on the same filesystem;
    the temp name is dot-prefixed so even a pre-rename listing skips
    it — Spark ignores hidden files)."""
    import os
    import uuid

    os.makedirs(manifest_dir, exist_ok=True)
    doc = {
        "row_name": row_name,
        "column_name": column_name,
        "field_index": field_index,
        "acquisition_id": acquisition_id,
    }
    name = f"acq-{uuid.uuid4().hex}.json"
    tmp = os.path.join(manifest_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write(json.dumps(doc))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(manifest_dir, name))


def streaming_events_hourly(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",  # kept for API compat; unused (see doc)
):
    """Streaming twin of the events_hourly batch aggregate: tumbling
    1-hour event-time windows in COMPLETE output mode — every window
    stays live and re-emits, which is what makes a one-shot drain equal
    the batch aggregate row-for-row (the gate's claim). Complete mode
    deliberately has NO watermark semantics (Spark ignores watermarks
    there: late rows always update their window, state is retained for
    the stream's lifetime) — an earlier version piped a no-op
    withWatermark through and the docstring oversold it as "the
    late-data shape" (code-review r17). The honest bounded-state
    late-data twins are streaming_sessionize / the session_window gate
    (append mode + watermark, rows final once closed). Events arrive as
    parquet files; the source schema is derived from the live file
    footers and ``ts`` normalized to long ns (see functions/events.py —
    a hardcoded schema silently misreads when the physical timestamp
    type changes). Returns (stream_df, start_fn) — start_fn(sink_table)
    runs availableNow into an in-memory table for tests; production
    swaps the sink for kafka/delta."""
    from ..functions.events import events_stream_source

    ev = events_stream_source(spark, events_dir)
    with_time = ev.withColumn(
        # exact integer `div`: ns longs exceed double's 2^53 range, so
        # `/`+cast can land ±1 µs off (breaks session identity equality)
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    agg = (
        with_time
        .groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )

    def start(sink_table: str):
        return (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return agg, start


def streaming_sessionize(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
    watermark: str = "1 hour",
):
    """Streaming sessionization with Spark's native ``session_window``:
    per-user sessions split by ``gap_s`` inactivity, watermarked for
    late data. Append mode — a session row is emitted once the
    watermark passes its end (the only correct streaming semantics for
    sessions: they must be CLOSED before they are final). The batch
    twin (gate events_session_window) runs the identical expression;
    tests prove stream output == batch sessions closed before the
    final watermark. Source schema derived from file footers, ``ts``
    normalized to long ns (functions/events.py)."""
    from ..functions.events import events_stream_source

    ev = events_stream_source(spark, events_dir)
    with_time = ev.withColumn(
        # exact integer `div`: ns longs exceed double's 2^53 range, so
        # `/`+cast can land ±1 µs off (breaks session identity equality)
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    agg = (
        with_time.withWatermark("event_time", watermark)
        .groupBy("user_id", F.session_window("event_time", f"{gap_s} seconds"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            "n_events",
        )
    )

    def start(sink_table: str):
        return (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return agg, start


def streaming_exact_dedup(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
):
    """Streaming twin of exact deduplication (functions/dedup.exact_dedup):
    documents arrive as parquet files; each micro-batch folds into
    running per-content groups (md5 of normalized text → count +
    smallest doc_id as the deterministic representative). Complete-mode
    aggregate — the dedup ledger a continuously-ingesting training
    pipeline maintains; after draining all files the table equals the
    batch exact_dedup result exactly (the correctness claim the gate
    verifies against the batch SQL oracle).

    Source schema is derived from the live footers (see
    functions/events.py for why hardcoding one is a silent-corruption
    hazard). 100 TB posture: state is one row per DISTINCT content
    (bounded by corpus content diversity, not stream length), partial
    aggregation is map-side, and the stream shuffles only
    (md5, partial-count, partial-min) triples per batch. At unbounded
    retention swap complete mode for update mode + an idempotent-upsert
    sink; content-hash state then lives in the sink, not the query.

    Returns (stream_df, start_fn) like the other streaming twins.
    """
    from ..functions.dedup import _norm_text

    docs = docs_stream_source(spark, docs_dir)
    agg = (
        docs.select(
            F.md5(_norm_text(F.col("text"))).alias("content_md5"), "doc_id"
        )
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("representative"),
        )
    )

    def start(sink_table: str):
        return (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return agg, start


def streaming_dedup_events(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """Streaming ingestion replay-dedup with Spark's native
    ``dropDuplicatesWithinWatermark``: events arriving more than once
    (at-least-once sources redeliver on retry) are emitted exactly
    once, keyed by ``event_id``, with state bounded by the watermark —
    the operator a training-data ingestion front-door runs before
    anything downstream counts or aggregates.

    State holds one key per DISTINCT event inside the watermark horizon
    (dropped once event-time passes key-time + watermark), so memory is
    rate × horizon, not stream length — the property that
    distinguishes this from a naive ``dropDuplicates`` whose state
    grows forever. Source schema derives from the live footers; ``ts``
    normalized to long ns (functions/events.py).

    Returns (stream_df, start_fn) like the other streaming twins; the
    gate drains a deliberately DOUBLED copy of events.parquet and must
    emit each event exactly once (oracle: the plain table).
    """
    from ..functions.events import events_stream_source

    ev = events_stream_source(spark, events_dir)
    with_time = ev.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    dedup = (
        with_time.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts", "user_id", "event_type", "value")
    )

    def start(sink_table: str):
        return (
            dedup.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return dedup, start


def streaming_count_sessions(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    max_files_per_trigger: int | None = None,
):
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``
    (the brief's escape hatch for semantics the built-in operators
    can't express): COUNT-based sessionization — a per-user session
    chunk closes after exactly ``k`` events, regardless of time.
    ``session_window``/``window`` are time-based and cannot express
    this; the per-group state machine (events buffered toward the next
    chunk boundary) is the canonical applyInPandasWithState shape.

    Emitted rows: (user_id, chunk, n_events, start_ts, end_ts) for
    COMPLETE chunks only (n_events == k, start/end = min/max member
    ts); the in-progress partial chunk stays in state across
    micro-batches — exactly what makes this stateful rather than a
    windowed aggregate. Within each micro-batch the user's events are
    processed in (ts, event_id) order, so a single-batch drain equals
    the batch oracle (row_number ordered by (ts, event_id), grouped by
    rn // k, complete groups only); across batches chunk membership
    follows arrival order, like any count-triggered stream operator.

    State per user is FOUR longs (buffered count, buffer min/max ts,
    next chunk index) — O(users), not O(events); production streams
    with abandonable users add a ProcessingTimeTimeout to flush idle
    partial buffers. The per-batch work is vectorized numpy over the
    Arrow batch except one short loop over COMPLETE CHUNKS (len/k
    iterations, not per-event)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    from ..functions.events import events_stream_source

    ev = events_stream_source(spark, events_dir, max_files_per_trigger).select(
        "user_id", "ts", "event_id"
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("chunk", LongType()),
            StructField("n_events", LongType()),
            StructField("start_ts", LongType()),
            StructField("end_ts", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("buf_n", LongType()),
            StructField("buf_min", LongType()),
            StructField("buf_max", LongType()),
            StructField("next_chunk", LongType()),
        ]
    )

    def chunker(key, pdfs, state: GroupState):
        (user_id,) = key
        buf_n, buf_min, buf_max, next_chunk = (
            state.get if state.exists else (0, None, None, 0)
        )
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            batch = pd.concat(parts, ignore_index=True).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            ts = batch["ts"].to_numpy(dtype=np.int64)
        else:
            ts = np.empty(0, dtype=np.int64)
        total = buf_n + ts.size
        n_complete = total // k
        out = []
        for j in range(n_complete):
            lo = j * k - buf_n  # index into ts; negative -> leftover members
            hi = (j + 1) * k - 1 - buf_n
            start = int(ts[max(lo, 0)])
            end = int(ts[hi])
            if lo < 0:  # chunk includes buffered members from prior batches
                start = min(start, int(buf_min)) if ts.size else int(buf_min)
                end = max(end, int(buf_max))
            out.append((int(user_id), next_chunk + j, k, start, end))
        next_chunk += n_complete
        rem = total - n_complete * k
        if rem > 0:
            lo = n_complete * k - buf_n
            if lo < 0:  # leftover survives untouched (no chunk closed)
                new_min, new_max = int(buf_min), int(buf_max)
                if ts.size:
                    new_min = min(new_min, int(ts[0]))
                    new_max = max(new_max, int(ts[-1]))
            else:
                new_min, new_max = int(ts[lo]), int(ts[-1])
            state.update((rem, new_min, new_max, next_chunk))
        else:
            state.update((0, None, None, next_chunk))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "chunk", "n_events", "start_ts", "end_ts"]
            )

    chunks = ev.groupBy("user_id").applyInPandasWithState(
        chunker, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )

    def start(sink_table: str):
        return (
            chunks.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return chunks, start


def streaming_ivf_index_build(
    spark,
    emb_dir: str,
    index_path: str,
    checkpoint_dir: str,
    centroids,
    dim: int = 64,
):
    """Incremental ANN index maintenance: embedding batches arrive as
    parquet files; each micro-batch is assigned to its IVF cell with a
    FIXED quantizer (trained offline — the production split: centroids
    move slowly, the corpus grows constantly) and APPENDED to the
    partitioned ``cell=N/`` layout that :func:`similarity.
    ivf_topk_partitioned` probes with partition pruning. The index
    grows file-by-file with no rebuild; after a drain, a probe over the
    streamed index equals the batch-built index exactly (the gate's
    oracle is the very same batch IVF SQL).

    foreachBatch (the assignment needs the centroid ndarrays), append
    mode, availableNow trigger. State is zero — every batch is
    independent map work; the only cross-batch artifact is the growing
    parquet layout itself."""
    from ..functions.similarity import ivf_cells

    C, Cn = centroids
    schema = spark.read.parquet(emb_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(emb_dir)
    )

    def sink(batch, bid):
        # batch-scoped + overwrite: an at-least-once replay overwrites
        # its own vectors instead of appending duplicates (a duplicated
        # vector would surface twice in every probe top-k — breaking
        # the streamed-index == batch-index claim; code-review r17).
        # Layout becomes batch=<id>/cell=N/ — cell stays a partition
        # column, so the probe's cell-IN pruning is unchanged.
        import os

        assigned = ivf_cells(batch, dim=dim, centroids=(C, Cn))
        (
            batch.join(assigned, "vec_id")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(index_path, f"batch={int(bid)}"))
        )

    spark.createDataFrame(
        [(i, [float(v) for v in C[i]]) for i in range(C.shape[0])],
        "vec_id long, embedding array<double>",
    ).write.mode("overwrite").parquet(f"{index_path}_centroids")
    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_asof_attribution(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Stateful streaming AS-OF join (backward) via
    ``applyInPandasWithState`` — the last-known-value / attribution
    join as a STREAM operator: for every purchase event, the user's
    latest click at ts <= purchase ts, where "latest" may live in a
    PRIOR micro-batch.

    State per user is TWO longs — the (ts, event_id) of the newest
    click seen so far — O(users), not O(events): exactly the state a
    kdb-style realtime as-of keeps. Per batch the group's rows are
    sorted (ts, side, event_id) with clicks before same-ts purchases
    (inclusive-boundary semantics) and greatest-event_id clicks last
    (the tiebreak), then one vectorized maximum-accumulate ffill maps
    every purchase to its in-batch click; purchases with none fall
    back to the state carry-in.

    A single availableNow drain therefore equals batch
    ``asof_join(purchases, clicks)`` exactly (the gate shares the
    native DuckDB ASOF oracle verbatim); across micro-batches the
    match follows arrival order like any stream join — the pytest
    drives time-ordered files and pins stream == batch with the match
    crossing the batch boundary through state."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    from ..functions.events import events_stream_source

    ev = (
        events_stream_source(spark, events_dir, max_files_per_trigger)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", LongType()),
            StructField("event_id", LongType()),
            StructField("event_id_click", LongType()),
            StructField("ts_click", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_ts", LongType()), StructField("last_id", LongType())]
    )

    def attribute(key, pdfs, state: GroupState):
        (user_id,) = key
        last_ts, last_id = state.get if state.exists else (None, None)
        parts = [p for p in pdfs if len(p)]
        if parts:
            batch = pd.concat(parts, ignore_index=True)
            side = (batch["event_type"] == "purchase").astype(np.int64)
            batch = batch.assign(_side=side).sort_values(
                ["ts", "_side", "event_id"], kind="mergesort"
            )
            ts = batch["ts"].to_numpy(dtype=np.int64)
            eid = batch["event_id"].to_numpy(dtype=np.int64)
            is_click = batch["_side"].to_numpy() == 0
            n = ts.size
            idx = np.where(is_click, np.arange(n), -1)
            np.maximum.accumulate(idx, out=idx)
            purch = ~is_click
            if purch.any():
                # fully vectorized match resolution: the BEST of the
                # in-batch ffill candidate and the state carry by
                # (ts, event_id), else NULL. Taking the max matters
                # when micro-batches arrive out of time order: an
                # in-batch click can be OLDER than the carried one
                # (batch 1 delivers ts=100, batch 2 delivers ts=50 and
                # the purchase) — preferring in-batch unconditionally
                # would mis-attribute to the stale click
                # (code-review r17).
                m = idx[purch]
                safe = np.where(m >= 0, m, 0)
                has_carry = last_ts is not None
                p_ts = ts[purch]
                ib_ok = m >= 0
                ib_ts = np.where(ib_ok, ts[safe], np.int64(-1))
                ib_id = np.where(ib_ok, eid[safe], np.int64(-1))
                # elementwise carry validity: a carried click newer
                # than the purchase is a physically impossible backward
                # match — the carry is no candidate for those rows
                carry_ok = (
                    (np.int64(last_ts) <= p_ts)
                    if has_carry
                    else np.zeros(p_ts.size, dtype=bool)
                )
                c_ts = np.int64(last_ts if has_carry else 0)
                c_id = np.int64(last_id if has_carry else 0)
                use_carry = carry_ok & (
                    ~ib_ok
                    | (c_ts > ib_ts)
                    | ((c_ts == ib_ts) & (c_id > ib_id))
                )
                mk_id = np.where(use_carry, c_id, ib_id)
                mk_ts = np.where(use_carry, c_ts, ib_ts)
                valid = ib_ok | carry_ok
                out = pd.DataFrame(
                    {
                        "user_id": np.full(int(purch.sum()), int(user_id),
                                           dtype=np.int64),
                        "ts": ts[purch],
                        "event_id": eid[purch],
                        "event_id_click": pd.array(mk_id, dtype="Int64"),
                        "ts_click": pd.array(mk_ts, dtype="Int64"),
                    }
                )
                out.loc[~valid, ["event_id_click", "ts_click"]] = pd.NA
                yield out
            if is_click.any():
                ci = np.flatnonzero(is_click)[-1]  # newest (ts, id) click
                c_ts, c_id = int(ts[ci]), int(eid[ci])
                if last_ts is None or (c_ts, c_id) >= (last_ts, last_id):
                    last_ts, last_id = c_ts, c_id
        if last_ts is not None:
            state.update((last_ts, last_id))

    matched = ev.groupBy("user_id").applyInPandasWithState(
        attribute, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )

    def start(sink_table: str):
        return (
            matched.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return matched, start


def streaming_substring_ledger(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    n: int = 4,
):
    """Streaming twin of keep-one substring dedup (functions/spans.
    duplicated_span_removal): documents arrive as parquet files; each
    micro-batch folds its positional n-gram window fingerprints into
    the running GRAM LEDGER — per gram hash, the global occurrence
    count and the lexicographically smallest (doc_id, pos) witness.
    The ledger (filtered to n_occ ≥ 2) is exactly the decision table
    the batch removal pass derives: an ingesting pipeline labels each
    incoming occurrence against it (keep iff it IS the witness) with a
    stateless per-batch join, so the correctness claim to pin is
    ledger == batch, which the gate verifies against the batch SQL
    oracle after draining every file.

    Same complete-mode aggregate shape as streaming_exact_dedup —
    state is one row per DISTINCT window content (bounded by corpus
    n-gram diversity, not stream length), min(struct) folds the
    witness with the same map-side partial aggregation as the count,
    and only (gh, count, witness) triples shuffle per batch. At
    unbounded retention swap complete mode for update mode + an
    idempotent min/sum-merge upsert sink.

    Returns (stream_df, start_fn) like the other streaming twins."""
    from ..functions.spans import _positioned_grams

    docs = docs_stream_source(spark, docs_dir)
    ledger = (
        _positioned_grams(docs, n)
        .groupBy("gh")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("wit"),
        )
        .select(
            "gh",
            "n_occ",
            F.col("wit.doc_id").alias("rep_doc"),
            F.col("wit.pos").cast("long").alias("rep_pos"),
        )
    )

    def start(sink_table: str):
        return (
            ledger.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return ledger, start


def streaming_contamination(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    bench,
    n: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Streaming twin of the 13-gram benchmark decontamination scan
    (functions/spans.contamination_scan): documents arrive as parquet
    files; each micro-batch's positional gram hashes broadcast-join the
    STATIC benchmark gram set (eval suites change offline, exactly like
    the quality cutoff in streaming_quality_filter) and fold into the
    running per-document hit count. Streaming state is one row per
    CONTAMINATED document — bounded by the corpus's dirty set, which a
    functioning decontamination pipeline keeps tiny; the clean corpus
    never enters state. The gate composes the drained hit table with
    the stateless per-doc totals projection and must equal the batch
    operator row-for-row (shared oracle).

    Returns (stream_df, start_fn) like the other streaming twins."""
    from ..functions.spans import CONTAM_N, contamination_hits

    docs = docs_stream_source(spark, docs_dir, max_files_per_trigger)
    hits = contamination_hits(docs, bench, n or CONTAM_N)

    def start(sink_table: str):
        return (
            hits.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return hits, start


def streaming_incremental_dedup(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    ref_index,
    sink_dir: str,
    min_est_jaccard: float = 0.5,
    max_files_per_trigger: int | None = None,
):
    """Streaming ingest gatekeeper (functions/dedup.incremental_dedup):
    new-crawl documents arrive as parquet files; each micro-batch is
    judged against the OFFLINE corpus index (``ref_index`` =
    dedup.build_ref_index's (wide signatures, witness-capped bands) —
    maintained out-of-band exactly like the quality cutoff and the
    benchmark gram set in the sibling twins) and appends its keep/drop
    verdicts to a parquet sink.

    foreachBatch, deliberately: a verdict depends only on (new doc,
    reference corpus) — never on other new docs — so each micro-batch
    runs the IDENTICAL batch operator and the drained sink equals the
    batch output under any file split. Zero streaming state; per-batch
    work is the batch-sized signature build plus index hash lookups —
    the corpus is never re-scanned, re-banded or re-windowed per batch.

    Returns (stream_df, start_fn); start() drains with availableNow."""
    from ..functions.dedup import incremental_dedup

    ref_wide, ref_bands = ref_index
    docs = docs_stream_source(spark, docs_dir, max_files_per_trigger)

    def handle(batch_df, batch_id):
        # batch-scoped directory + overwrite = replay-idempotent append
        # (foreachBatch is at-least-once; a re-executed micro-batch
        # must overwrite ITS OWN verdict rows, not append a duplicate
        # copy — same pattern as the URL ledger / ref-index staging;
        # code-review r17). Readers drop the staging `batch` column.
        import os

        incremental_dedup(
            batch_df,
            None,
            min_est_jaccard=min_est_jaccard,
            ref_wide=ref_wide,
            ref_bands=ref_bands,
        ).write.mode("overwrite").parquet(
            os.path.join(sink_dir, f"batch={int(batch_id)}")
        )

    def start():
        return (
            docs.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return docs, start


def streaming_heavy_hitters(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    cand_dir: str,
    transform,
    key_cols: tuple[str, ...],
    k: int,
    max_files_per_trigger: int | None = None,
):
    """Streaming twin of exact heavy hitters (functions/sketch.
    heavy_hitters): the corpus streams in as parquet files; each
    micro-batch runs the Misra-Gries CANDIDATE pass only
    (sketch.mg_candidates — bounded k-entry state per task, ≤ k×P
    output rows) and appends its survivors to a parquet candidate
    ledger. Zero streaming state; the superset guarantee composes
    across micro-batches (a key missed by every batch summary has
    global count ≤ N/(k+1) — see mg_candidates), so at drain the
    ledger is a superset of the stream's true heavy hitters and ONE
    exact recount over the accumulated corpus (the same files the
    stream ingested — ingest pipelines persist their batches anyway)
    finishes the job. stream == batch is the gate's claim; shared
    GROUP BY + HAVING oracle.

    ``transform`` maps a raw micro-batch DataFrame to the keyed frame
    carrying ``key_cols`` (e.g. docs → (lang, token) explode); it must
    be stateless/per-row, like the quality projection in
    streaming_quality_filter.

    Returns (stream_df, start_fn); start() drains with availableNow."""
    from ..functions.sketch import mg_candidates

    docs = docs_stream_source(spark, docs_dir, max_files_per_trigger)

    def handle(batch_df, batch_id):
        # batch-scoped + overwrite: an at-least-once replay overwrites
        # its own candidate rows. A duplicated candidate copy would not
        # break the superset ARGUMENT, but it inflates the ledger and
        # breaks the drained-ledger == deterministic-run equality the
        # restart pytest pins (code-review r17).
        import os

        mg_candidates(transform(batch_df), key_cols, k).write.mode(
            "overwrite"
        ).parquet(os.path.join(cand_dir, f"batch={int(batch_id)}"))

    def start():
        return (
            docs.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return docs, start


def streaming_url_dedup(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    ledger_dir: str,
    url_builder,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
):
    """Streaming twin of URL-level dedup (functions/web.url_dedup):
    documents arrive as parquet files; each micro-batch canonicalizes
    its URLs (pure JVM projection — zero streaming state, the same
    stateless-ingest split as streaming_quality_filter) and appends
    (canonical_url, raw, id) rows to a batch-scoped parquet ledger
    directory (``batch=<id>``, mode=overwrite — so an at-least-once
    replay overwrites its own rows instead of appending a duplicate
    copy; ADVICE r15). The clustering
    aggregate — representative, member count, distinct raw spellings —
    runs ONCE at drain over the accumulated ledger. Structured
    Streaming cannot run the countDistinct(raw) aggregate statefully
    (distinct aggregations are unsupported on streams), and a crawl
    pipeline persists its canonical table anyway, so the ledger IS the
    production shape: per-batch work is a narrow map + append; the
    cluster table refresh is a normal batch job over the table.

    ``url_builder`` maps a raw micro-batch DataFrame to a frame with
    (id_col, url_col); stateless/per-row.

    Returns (stream_df, start_fn); start() drains with availableNow."""
    from ..functions.web import canonicalize_url

    docs = docs_stream_source(spark, docs_dir, max_files_per_trigger)

    def handle(batch_df, batch_id):
        # batch_id-scoped directory + overwrite = replay-idempotent
        # append: foreachBatch is at-least-once, and a micro-batch
        # re-executed after a crash between the parquet write and the
        # checkpoint commit must overwrite ITS OWN rows, not append a
        # second copy that inflates n_docs/n_raw_forms at drain
        # (ADVICE r15; same staging shape as the r15 ref-index commit)
        import os

        (
            url_builder(batch_df)
            .select(
                canonicalize_url(F.col(url_col)).alias("canonical_url"),
                F.col(url_col).alias("_raw"),
                F.col(id_col).alias("_id"),
            )
            .where(F.col("canonical_url").isNotNull())
            .write.mode("overwrite")
            .parquet(os.path.join(ledger_dir, f"batch={int(batch_id)}"))
        )

    def start():
        return (
            docs.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return docs, start


def url_dedup_from_ledger(spark: SparkSession, ledger_dir: str):
    """The drain-time clustering aggregate over the canonical ledger —
    identical to the tail of functions/web.url_dedup, so stream ==
    batch is exact by construction."""
    return (
        # partition discovery adds the staging `batch` column; drop it
        spark.read.parquet(ledger_dir)
        .select("canonical_url", "_raw", "_id")
        .groupBy("canonical_url")
        .agg(
            F.min("_id").cast("long").alias("rep_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("_raw").cast("long").alias("n_raw_forms"),
        )
    )


def streaming_quality_filter(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    cutoff: float,
):
    """Streaming corpus quality filter: documents arrive as parquet
    files; each is scored by the STATELESS hashed-linear projection
    (functions/text.quality_score_projection — hash-derived weights,
    no state, no aggregate) and labeled against a BATCH-CALIBRATED
    cutoff. This is the production split of the classifier: the
    exact-quantile calibration is inherently a corpus aggregate run
    offline (or per retention window), while the ingest path applies
    it as a pure append-mode projection — zero streaming state, so it
    scales to any ingest rate. stream == batch is the gate's claim:
    with the batch-calibrated cutoff, the drained sink equals
    hashed_quality_classifier's full output row-for-row.

    Returns (stream_df, start_fn) like the other streaming twins."""
    from ..functions.text import quality_score_projection

    docs = docs_stream_source(spark, docs_dir)
    scored = quality_score_projection(docs).select(
        "doc_id",
        "n_tokens",
        "score",
        "score_per_tok",
        (F.col("score_per_tok") >= F.lit(float(cutoff))).alias("keep"),
    )

    def start(sink_table: str):
        return (
            scored.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return scored, start


def streaming_priority_sample(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    salt: str = "prio",
    max_files_per_trigger: int | None = None,
):
    """Streaming twin of weighted priority sampling (functions/
    sampling.priority_sample): documents arrive as parquet files; each
    micro-batch folds its arrivals into a per-stratum TOP-(k+1)
    priority buffer held in applyInPandasWithState state, and every
    update emits the stratum's CURRENT sample (rank 1..k plus the
    Horvitz-Thompson est_w against the buffered (k+1)-th priority,
    tagged with a per-stratum ``batch_seq``). A production sink
    upserts on (stratum, sample_rank); the memory-sink gate reads the
    max-batch_seq emission per stratum — after draining every file
    that emission equals the batch sampler row-for-row (priorities are
    deterministic content hashes, so merge order cannot change the
    top-k), which is why stream and batch SHARE one oracle.

    State per stratum is three (k+1)-length arrays — bounded by the
    sample size, never by stream length. The priority projection runs
    JVM-side BEFORE the stateful op (the same priority_scored
    expression tree as batch — the pandas worker never hashes);
    per-batch work is one numpy argsort over buffered+arrived rows,
    truncated straight back to k+1. est_w is emitted UNROUNDED — the
    gate applies the same F.round(.., 6) as the batch sampler, so both
    sides share one (JVM HALF_UP) rounding rule instead of mixing in
    Python's bankers rounding."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..functions.sampling import priority_scored

    docs = docs_stream_source(spark, docs_dir, max_files_per_trigger)
    scored = priority_scored(docs, salt=salt).drop("pre")

    out_schema = StructType(
        [
            StructField("stratum", StringType()),
            StructField("batch_seq", LongType()),
            StructField("doc_id", LongType()),
            StructField("weight", LongType()),
            StructField("sample_rank", LongType()),
            StructField("est_w", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("seq", LongType()),
            StructField("doc_ids", ArrayType(LongType())),
            StructField("weights", ArrayType(LongType())),
            StructField("prios", ArrayType(DoubleType())),
        ]
    )

    def sampler(key, pdfs, state: GroupState):
        (stratum,) = key
        seq, ids, ws, ps = state.get if state.exists else (0, [], [], [])
        ids, ws, ps = list(ids), list(ws), list(ps)
        for pdf in pdfs:
            if len(pdf):
                ids += [int(x) for x in pdf["doc_id"]]
                ws += [int(x) for x in pdf["weight"]]
                ps += [float(x) for x in pdf["prio"]]
        # top-(k+1) under (prio desc, doc_id asc); lexsort keys are
        # applied last-key-primary
        order = np.lexsort((np.asarray(ids), -np.asarray(ps)))[: k + 1]
        ids = [ids[i] for i in order]
        ws = [ws[i] for i in order]
        ps = [ps[i] for i in order]
        seq += 1
        state.update((seq, ids, ws, ps))
        tau = ps[k] if len(ps) == k + 1 else 0.0
        rows = [
            (
                stratum,
                seq,
                ids[r],
                ws[r],
                r + 1,
                max(float(ws[r]), tau),
            )
            for r in range(min(k, len(ids)))
        ]
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "stratum", "batch_seq", "doc_id", "weight",
                    "sample_rank", "est_w",
                ],
            )

    sample = scored.groupBy("stratum").applyInPandasWithState(
        sampler, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )

    def start(sink_table: str):
        return (
            sample.writeStream.outputMode("update")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    return sample, start
