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

__all__ = ["normalize_events_ts", "events_stream_source", "asof_join", "range_join"]


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
    except Exception as exc:
        from ngff_zarr_spark._io_errors import is_missing_or_empty_source

        if not is_missing_or_empty_source(exc):
            # corrupt footer / permission / transient FS fault on an
            # EXISTING dir: surface it — a hardcoded fallback schema
            # here reads all-null columns (ADVICE r17)
            raise
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


#: default time-segment width for the skew-safe window twins (6 h of
#: nanoseconds) — a cost knob, never a correctness one: the segmented
#: forms are exactly equal to the plain forms at ANY width >= 1
DEFAULT_SEGMENT_NS = 6 * 3600 * 1_000_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("event_id",),
    suffix: str = "_asof",
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    skew_safe: bool = True,
    segment_ns: int = DEFAULT_SEGMENT_NS,
) -> DataFrame:
    """AS-OF JOIN: for every left row, the matching right row per
    ``key`` by timestamp — the attribution / last-known-value join the
    brief names as an operator Spark lacks.

    PRODUCTION DEFAULT (r10): ``skew_safe=True`` dispatches to
    :func:`asof_join_segmented` — the plan whose per-task sort state is
    bounded by ``(key, segment)`` occupancy instead of key occupancy,
    so a hot key (one instrument carrying most of a 100 TB tape) can't
    serialize into a single straggler task. The two forms are exactly
    equal for every direction/tolerance (hypothesis-pinned against a
    brute-force third implementation); ``skew_safe=False`` is the
    explicit escape to the single-window plan described below (one
    fewer summary exchange — fine when keys are known to be balanced).

    ``direction`` picks the match:

    * ``"backward"`` (default) — the right row with the LARGEST
      ``ts_col`` <= the left row's (last-known-value / attribution);
    * ``"forward"`` — the right row with the SMALLEST ``ts_col`` >=
      the left row's (next-event / time-to-response);
    * ``"nearest"`` — whichever of the two is closer in absolute time;
      on an exact distance tie the BACKWARD match wins (deterministic).

    ``tolerance`` (same units as ``ts_col``, e.g. nanoseconds) bounds
    the match distance: a matched row farther than ``tolerance`` is
    dropped and the left row keeps NULLs — the attribution-window form
    ("credit a click only within 7 days before the purchase").

    Implemented as a composition of existing DataFrame ops — the
    union-and-window form, with NO join operator at all: tag both
    sides, union, and fill each left row from the nearest right row in
    a (key)-partitioned window ordered by (ts, side, tiebreak). One
    shuffle on ``key`` + one sort per direction; per-key cost is a
    single sorted pass, where the naive inequality join is quadratic
    per key and a join-then-filter can't early-out. This is the plan an
    as-of over two 100 TB streams needs (it is also exactly how
    kdb/QuestDB-style engines schedule it: co-partition, merge-sort).
    ``nearest`` runs the backward and forward fills as two windows over
    the SAME union and exchange (one extra sort, no extra shuffle).

    All output columns come from ONE matched right row: the fill is a
    single ``last``/``first(ignorenulls=True)`` over a STRUCT of
    (value_cols…, ts), so a NULL inside a matched right row's value
    column stays NULL in the output (it is never papered over by an
    older row's value) and ``<ts_col><suffix>`` always belongs to the
    row the values came from.

    Tie semantics: a right row at the SAME ts as a left row matches in
    every direction (inclusive comparison); among multiple right rows
    at the same (key, ts) the one with the greatest ``tiebreak``
    (default: first value col) wins — a deterministic total order,
    which an oracle can mirror with a max_by pre-dedup. Unmatched left
    rows keep NULL right values (left-outer semantics).

    Returns every left column plus ``<value_col><suffix>`` columns and
    ``<ts_col><suffix>`` (the matched right timestamp)."""
    from pyspark.sql import Window

    if skew_safe:
        return asof_join_segmented(
            left, right, key=key, ts_col=ts_col, value_cols=value_cols,
            suffix=suffix, tiebreak=tiebreak, direction=direction,
            tolerance=tolerance, segment_ns=segment_ns,
        )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction={direction!r}: expected backward, forward, or nearest"
        )
    u, rv, left_rest = _asof_union(
        left, right, key, ts_col, value_cols, suffix, tiebreak
    )
    # backward: right rows sort BEFORE a same-ts left row (side 0 < 1)
    # and last() takes the latest right at-or-before it; among same-ts
    # right rows, _tb ascending puts the greatest tiebreak last.
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("_side"), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: left rows sort BEFORE same-ts right rows (side desc) so
    # the inclusive match still sees them; first() takes the earliest
    # right at-or-after; _tb descending puts the greatest tiebreak first.
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("_side").desc(), F.col("_tb").desc_nulls_last())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    back = F.last("_r", ignorenulls=True).over(w_back)
    fwd = F.first("_r", ignorenulls=True).over(w_fwd)
    matched = _asof_pick(back, fwd, direction, ts_col, suffix)
    return _asof_finish(
        u, matched, key, ts_col, left_rest, rv, suffix, tolerance
    )


def _asof_union(left, right, key, ts_col, value_cols, suffix, tiebreak):
    """Tagged union of both sides (the as-of building block): right
    rows carry their match payload as a struct ``_r`` plus the
    ``_tb`` tiebreak; left rows carry NULLs of the same types."""
    from pyspark.sql.types import StructField, StructType

    tiebreak = tiebreak or value_cols[0]
    rv = [f"{c}{suffix}" for c in value_cols] + [f"{ts_col}{suffix}"]
    m_type = StructType(
        [StructField(f"{c}{suffix}", right.schema[c].dataType) for c in value_cols]
        + [StructField(f"{ts_col}{suffix}", right.schema[ts_col].dataType)]
    )
    left_rest = [c for c in left.columns if c not in (key, ts_col)]
    r_side = right.select(
        F.col(key),
        F.col(ts_col),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
        ).alias("_r"),
        F.col(tiebreak).alias("_tb"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_rest
        ],
    )
    l_side = left.select(
        F.col(key),
        F.col(ts_col),
        F.lit(None).cast(m_type).alias("_r"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_rest],
    )
    return l_side.unionByName(r_side), rv, left_rest


def _asof_pick(back, fwd, direction, ts_col, suffix):
    if direction == "backward":
        return back
    if direction == "forward":
        return fwd
    b_dist = F.col(ts_col) - back[f"{ts_col}{suffix}"]
    f_dist = fwd[f"{ts_col}{suffix}"] - F.col(ts_col)
    return (
        F.when(back.isNull(), fwd)
        .when(fwd.isNull(), back)
        .when(b_dist <= f_dist, back)
        .otherwise(fwd)
    )


def _asof_finish(u, matched, key, ts_col, left_rest, rv, suffix, tolerance):
    filled = u.select(
        key, ts_col, "_side", *left_rest, matched.alias("_m")
    )
    if tolerance is not None:
        dist = F.abs(F.col(ts_col) - F.col("_m")[f"{ts_col}{suffix}"])
        filled = filled.withColumn(
            "_m", F.when(dist <= F.lit(tolerance), F.col("_m"))
        )
    return filled.filter(F.col("_side") == 1).select(
        key, ts_col, *left_rest, *[F.col("_m")[c].alias(c) for c in rv]
    )


def asof_join_segmented(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("event_id",),
    suffix: str = "_asof",
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    segment_ns: int = DEFAULT_SEGMENT_NS,
) -> DataFrame:
    """Skew-safe as-of join, exactly equal to :func:`asof_join` for
    every direction/tolerance (hypothesis-pinned against the same
    brute-force third implementation, tests/test_events_schema.py).

    :func:`asof_join` fills each left row inside ONE (key)-partitioned
    window — a hot key (one instrument carrying most of the tape, one
    bot user) serializes into a single sort task. Here the events-sized
    sort partitions by ``(key, ts DIV segment_ns)`` and the cross-
    segment information travels through per-(key, segment) CARRY rows:

    * within each segment, the usual union-window fill;
    * per (key, segment), the boundary candidates — latest and earliest
      right row (row_number over the same exchange);
    * a prefix/suffix scan over the TINY (key, segment) summary
      (rows ∝ active pairs, not events) yields each segment's carry-in
      from earlier/later segments, joined back on (key, segment);
    * a left row uses its within-segment fill, else the carry-in.

    Same-ts matches are always intra-segment (equal ts ⇒ equal
    segment), so the inclusive-boundary and tie semantics reduce to the
    plain form's. Cost: the one big exchange (finer key) + one
    summary-sized exchange + a co-partitioned join."""
    from pyspark.sql import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction={direction!r}: expected backward, forward, or nearest"
        )
    u, rv, left_rest = _asof_union(
        left, right, key, ts_col, value_cols, suffix, tiebreak
    )
    # integer DIV: epoch-ns exceeds 2^53 (see sessionize_counts_segmented)
    u = u.withColumn(
        "_seg", F.expr(f"CAST({ts_col} DIV {int(segment_ns)} AS LONG)")
    )

    # per-(key, segment) boundary candidates from right rows only
    r_rows = u.filter(F.col("_side") == 0).select(
        key, "_seg", ts_col, "_tb", "_r"
    )
    w_latest = Window.partitionBy(key, "_seg").orderBy(
        F.col(ts_col).desc(), F.col("_tb").desc_nulls_last()
    )
    w_earliest = Window.partitionBy(key, "_seg").orderBy(
        F.col(ts_col).asc(), F.col("_tb").desc_nulls_last()
    )
    seg_best = (
        r_rows.withColumn("_rnb", F.row_number().over(w_latest))
        .withColumn("_rnf", F.row_number().over(w_earliest))
        .groupBy(key, "_seg")
        .agg(
            F.first(F.when(F.col("_rnb") == 1, F.col("_r")), ignorenulls=True)
            .alias("_last_r"),
            F.first(F.when(F.col("_rnf") == 1, F.col("_r")), ignorenulls=True)
            .alias("_first_r"),
        )
    )
    # carry-in per (key, segment) over ALL active segments (left rows
    # in right-row-free segments still need the scan to pass through)
    seg_index = u.select(key, "_seg").distinct()
    w_before = (
        Window.partitionBy(key).orderBy("_seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_after = (
        Window.partitionBy(key).orderBy("_seg")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carry = seg_index.join(seg_best, [key, "_seg"], "left").select(
        key,
        "_seg",
        F.last("_last_r", ignorenulls=True).over(w_before).alias("_carry_back"),
        F.first("_first_r", ignorenulls=True).over(w_after).alias("_carry_fwd"),
    )

    u2 = u.join(carry, [key, "_seg"], "left")
    w_back = (
        Window.partitionBy(key, "_seg")
        .orderBy(F.col(ts_col), F.col("_side"), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(key, "_seg")
        .orderBy(F.col(ts_col), F.col("_side").desc(), F.col("_tb").desc_nulls_last())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    back = F.coalesce(
        F.last("_r", ignorenulls=True).over(w_back), F.col("_carry_back")
    )
    fwd = F.coalesce(
        F.first("_r", ignorenulls=True).over(w_fwd), F.col("_carry_fwd")
    )
    matched = _asof_pick(back, fwd, direction, ts_col, suffix)
    return _asof_finish(
        u2, matched, key, ts_col, left_rest, rv, suffix, tolerance
    )


def range_join(
    events: DataFrame,
    windows: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    strategy: str = "broadcast",
    bucket_width: int | None = None,
) -> DataFrame:
    """RANGE JOIN: events × interval table on ``start <= ts < end`` —
    the second operator family the brief names (band/interval joins).

    ``strategy="broadcast"`` (default): the windows side is BROADCAST
    (interval tables — incident windows, maintenance periods,
    experiment cohorts — are small by nature), so the plan is a
    broadcast nested-loop with the range predicate evaluated
    stream-side: one corpus scan, no shuffle of the events,
    scale-independent of the event count.

    ``strategy="bucketed"``: the large×large plan. Both sides are keyed
    to coarse time buckets of ``bucket_width`` ts-units — each event to
    the ONE bucket containing its ts, each interval EXPLODED to every
    bucket it overlaps — then EQUI-joined on the bucket and exact-
    filtered on the range predicate. Each (event, interval) pair meets
    in exactly one bucket (the event's), so no post-join dedup is
    needed. This is the standard interval-bucketing decomposition
    (DuckDB/Trino range-join optimizations use the same shape): one
    hash shuffle per side, collision cost bounded by events-per-bucket
    × intervals-overlapping-that-bucket, never |events| × |windows|.
    ``bucket_width=None`` derives the width as the LONGEST interval
    (one tiny aggregate over the windows side, driver-side scalar) so
    every interval explodes to at most 2 buckets; pass it explicitly
    when one outlier interval would make buckets too coarse — width W
    costs each interval ceil(len/W)+1 bucket rows."""
    if strategy == "broadcast":
        return events.join(
            F.broadcast(windows),
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)),
        )
    if strategy != "bucketed":
        raise ValueError(f"strategy={strategy!r}: expected broadcast or bucketed")
    if bucket_width is None:
        row = windows.select(
            F.max(F.col(end_col) - F.col(start_col)).alias("w")
        ).first()
        bucket_width = int(row["w"]) if row["w"] is not None else 1
    bucket_width = max(int(bucket_width), 1)
    # an empty interval (end <= start) matches nothing, and its
    # descending sequence() would emit wrong buckets — drop it up front
    windows = windows.filter(F.col(end_col) > F.col(start_col))
    wb = windows.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                # end is exclusive: last covered ts is end-1
                F.floor((F.col(end_col) - 1) / bucket_width),
            )
        ),
    )
    eb = events.withColumn("_bucket", F.floor(F.col(ts_col) / bucket_width))
    return (
        eb.join(wb, "_bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bucket")
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each user, step i counts only if
    an event of that type occurs AT OR AFTER the user's completion time
    of step i-1 (ties allowed — same-timestamp progression counts, the
    usual product-analytics convention). Returns one row per step:
    (step_index, step, n_users).

    100 TB posture: one min-aggregate per step over only that step's
    events, each joined on user_id to the previous stage's completion
    table — the stage tables shrink monotonically (funnel!), every
    shuffle is id-keyed, and nothing carries event payloads. Cost is
    O(steps) small joins, not a per-user sort of full history."""
    e = normalize_events_ts(events).select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), "ts"
    )
    rows = None
    stage = None  # (u, done_ts) for the previous step
    for i, step in enumerate(steps):
        this = e.filter(F.col("et") == step)
        if stage is None:
            stage = this.groupBy("u").agg(F.min("ts").alias("done_ts"))
        else:
            stage = (
                this.join(stage.select("u", F.col("done_ts").alias("prev_ts")), "u")
                .filter(F.col("ts") >= F.col("prev_ts"))
                .groupBy("u")
                .agg(F.min("ts").alias("done_ts"))
            )
        row = stage.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("long").alias("step_index"),
            F.lit(step).alias("step"),
            "n_users",
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def cohort_retention(
    events: DataFrame,
    signup_type: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly cohort retention: cohort = epoch-week of the user's first
    ``signup_type`` event; a user counts as retained at offset k if they
    have ANY event in cohort_week + k. Returns
    (cohort_week, week_offset, n_users) — the classic retention
    triangle. Weeks are epoch-based integer buckets (ts_ns div 7 days),
    not calendar-ISO weeks: exact integer arithmetic both engines
    compute identically.

    100 TB posture: one filtered min-aggregate for cohorts, one
    distinct (user, week) projection, an id-keyed join, and a count
    aggregate — all shuffles on user_id/cohort keys, no event payloads
    carried, no window over full history."""
    week_ns = 7 * 86400 * 1_000_000_000
    e = normalize_events_ts(events).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.expr(f"ts div {week_ns}").alias("week"),
    )
    cohorts = (
        e.filter(F.col("et") == signup_type)
        .groupBy("u")
        .agg(F.min("week").alias("cohort_week"))
    )
    activity = e.select("u", "week").distinct()
    return (
        activity.join(cohorts, "u")
        .filter(F.col("week") >= F.col("cohort_week"))
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            "n_users",
        )
    )


BLOOM_M_BITS = 1 << 13  # 1 KB of bits: fp ~0.2% at 500 keys, k=4
BLOOM_K = 4


def bloom_semi_join(
    events: DataFrame,
    keys: DataFrame,
    key_col: str = "user_id",
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
) -> DataFrame:
    """Semi-join of ``events`` against a small key set with a BLOOM
    PREFILTER: the key set is collapsed into an m-bit filter (k
    portable-h64 hashes per key), broadcast as an 8 KB literal, and
    applied to the big side BEFORE the exact semi-join — the pattern
    that turns "shuffle 100 TB to find 0.1% of rows" into "drop 99% of
    rows inside the scan's whole-stage codegen, then shuffle the
    survivors". Bloom false positives are removed by the exact join;
    false negatives are impossible, so the result EQUALS the plain
    semi-join (which is exactly what the oracle checks).

    The filter build is DISTRIBUTED (VERDICT r8 watch item): the k
    hashes per key run in whole-stage codegen and a distinct over bit
    POSITIONS collapses the result, so the driver collects at most
    ``m_bits`` longs — never the key set itself. At 10^7 keys the old
    per-key Python md5 loop was minutes of driver time; this is one
    scan plus a <=m_bits-value shuffle regardless of key count."""
    import numpy as np

    from .text import h64

    pos_rows = (
        keys.select(F.col(key_col).cast("string").alias("k"))
        .distinct()
        .select(
            F.explode(
                F.array(*[
                    (h64(F.concat(F.lit(f"{i}:"), F.col("k"))) % m_bits).cast("long")
                    for i in range(k_hashes)
                ])
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    bits = np.zeros(m_bits, dtype=bool)
    bits[[int(r["p"]) for r in pos_rows]] = True
    bitstr = "".join("1" if b else "0" for b in bits)

    # one array of k probe positions + one forall over it keeps the
    # bit-string literal in the plan exactly once (inlining it into k
    # separate substring expressions bloats codegen k-fold)
    positions = F.array(*[
        (h64(F.concat(F.lit(f"{i}:"), F.col(key_col).cast("string"))) % m_bits + 1)
        .cast("int")
        for i in range(k_hashes)
    ])
    member = F.forall(
        positions, lambda p: F.substring(F.lit(bitstr), p, 1) == "1"
    )
    prefiltered = events.filter(member)
    return prefiltered.join(
        F.broadcast(keys.select(F.col(key_col)).distinct()), key_col, "left_semi"
    )


def sessionize_counts(
    ev: DataFrame,
    gap_ns: int,
    user_col: str = "user_id",
    ts_col: str = "ns",
    skew_safe: bool = True,
    segment_ns: int = DEFAULT_SEGMENT_NS,
) -> DataFrame:
    """Per-user session/event counts (gate events_sessionize).

    PRODUCTION DEFAULT (r10): ``skew_safe=True`` dispatches to
    :func:`sessionize_counts_segmented`, whose big sort partitions by
    ``(user, ts // segment_ns)`` so a bot user with 10^8 events spreads
    over many tasks instead of one straggler window. Exactly equal at
    any segment width (pytest-pinned). ``skew_safe=False`` is the
    explicit escape to the classic single-window-per-user shape."""
    from pyspark.sql import Window as W

    if skew_safe:
        return sessionize_counts_segmented(
            ev, gap_ns, segment_ns, user_col=user_col, ts_col=ts_col
        )
    w = W.partitionBy(user_col).orderBy(ts_col)
    gaps = ev.withColumn(
        "new_session",
        (F.col(ts_col) - F.lag(ts_col).over(w) > gap_ns).cast("long"),
    ).fillna({"new_session": 1})
    return gaps.groupBy(user_col).agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def sessionize_counts_segmented(
    ev: DataFrame,
    gap_ns: int,
    segment_ns: int,
    user_col: str = "user_id",
    ts_col: str = "ns",
) -> DataFrame:
    """Skew-safe sessionization, EXACTLY equal to
    :func:`sessionize_counts` (pinned in tests/test_r09_sessionize_
    segmented.py at two segment widths plus an adversarial mega-user).

    The plain form sorts ALL of a user's events in ONE window task —
    a bot user with 10^8 events is a straggler (or OOM) at cluster
    scale. Here the big sort partitions by ``(user, ts // segment_ns)``
    so a mega-user's events spread over many tasks; per segment only a
    4-number summary survives (session starts, events, first/last ts),
    and the boundary fix-up — subtract one session start wherever a
    segment's first event is within ``gap_ns`` of the PREVIOUS
    segment's last event — runs on that tiny summary table (rows ∝
    active (user, segment) pairs, not events). Cost: the same single
    events exchange (keyed on (user, seg) instead of (user)) + one
    negligible summary exchange.

    Correct for any ``segment_ns`` ≥ 1 (segments need not be adjacent:
    the fix-up window ordering by segment id visits the user's
    non-empty segments in time order, and the boundary test compares
    actual timestamps, so an idle gap of many empty segments simply
    fails the ``<= gap_ns`` test)."""
    from pyspark.sql import Window as W

    # integer DIV: epoch-ns values exceed 2^53, float division would
    # misplace events near segment boundaries
    seg = ev.withColumn("_seg", F.expr(f"CAST({ts_col} DIV {int(segment_ns)} AS LONG)"))
    w = W.partitionBy(user_col, "_seg").orderBy(ts_col)
    gaps = seg.withColumn(
        "new_session",
        (F.col(ts_col) - F.lag(ts_col).over(w) > gap_ns).cast("long"),
    ).fillna({"new_session": 1})
    summary = gaps.groupBy(user_col, "_seg").agg(
        F.sum("new_session").cast("long").alias("starts"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(ts_col).alias("first_ns"),
        F.max(ts_col).alias("last_ns"),
    )
    ws = W.partitionBy(user_col).orderBy("_seg")
    merged = summary.withColumn(
        "spurious",
        (
            (F.col("first_ns") - F.lag("last_ns").over(ws)) <= gap_ns
        ).cast("long"),
    ).fillna({"spurious": 0})
    return merged.groupBy(user_col).agg(
        (F.sum("starts") - F.sum("spurious")).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


def exact_percentiles(
    ev: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    skew_safe: bool = True,
    n_buckets: int = 1024,
    occupancy_bound: int = 1 << 16,
    descent_rounds: int = 2,
) -> DataFrame:
    """Exact linear-interpolation percentiles per group — the
    default-named entry point.

    PRODUCTION DEFAULT (r10): ``skew_safe=True`` dispatches to
    :func:`exact_percentiles_bucketed` (histogram-descent rank
    selection — per-task state bounded by bucket occupancy, never
    group size). ``skew_safe=False`` is the explicit escape to Spark's
    ``percentile`` aggregate, which buffers every value of a group in
    one aggregation buffer — fine for bounded groups, an OOM risk on a
    10^9-row group. Both return (group, n=COUNT(*), p<xx>... rounded
    6dp) and are exactly equal (shared-oracle gates + pytest pins)."""
    if skew_safe:
        return exact_percentiles_bucketed(
            ev, group_col=group_col, value_col=value_col, ps=ps,
            n_buckets=n_buckets, occupancy_bound=occupancy_bound,
            descent_rounds=descent_rounds,
        )
    aggs = [
        F.round(F.expr(f"percentile({value_col}, {float(p)})"), 6).alias(
            f"p{int(round(p * 100))}"
        )
        for p in ps
    ]
    return ev.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"), *aggs
    )


def exact_percentiles_bucketed(
    ev: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_buckets: int = 1024,
    occupancy_bound: int = 1 << 16,
    descent_rounds: int = 2,
) -> DataFrame:
    """Exact linear-interpolation percentiles WITHOUT per-group value
    buffering — the 100 TB twin of Spark's ``percentile`` aggregate
    (which collects every distinct value of a group into one
    aggregation buffer: a billion-row group OOMs the executor).

    Histogram-descent rank selection, all set-level DataFrame ops:

    1. per-group count/min/max (one aggregate);
    2. every row maps to one of ``n_buckets`` uniform value buckets —
       a second aggregate yields the per-(group, bucket) histogram
       (rows ∝ groups × n_buckets, tiny);
    3. the interpolation positions k = (n−1)·p need global ranks
       ⌊k⌋/⌈k⌉; a prefix sum over the histogram locates the bucket
       holding each rank and its in-bucket offset;
    4. value-skew descent (r10): uniform boundaries concentrate a
       heavy-tailed group in ONE bucket, re-inheriting the group-sized
       sort the twin exists to avoid. Descent is ADAPTIVE, like AQE:
       the per-group stats and the histogram (both tiny — rows ∝
       groups × n_buckets) are persisted, and ONE scalar action
       (``limit(1).count()`` over the needed-bucket histogram rows)
       decides whether any rank-holding bucket exceeds
       ``occupancy_bound``. When none does — the overwhelmingly common
       layout — no descent stage is ever built and the query runs
       exactly three corpus scans (stats, histogram, final rank pass).
       Only when a needed bucket IS over-cap do up to
       ``descent_rounds`` rounds run, each splitting the over-cap
       buckets into ``n_buckets`` sub-buckets uniform over the
       bucket's OWN min/max (read from the persisted histogram — the
       corpus is never rescanned to size buckets), relocating the
       target rank through a sub-histogram prefix sum; the surviving
       needed-bucket rows are persisted (memory-and-disk) so each
       round scans only the data descent must touch, not the corpus.
       A bucket whose values are all identical (the layout uniform
       subdivision can never split) resolves immediately — any rank in
       it IS that value. Composite keys child = (b+1)·n_buckets + sb
       keep every depth's key space disjoint in one long.
    5. ONE final pass ranks only the rows of the surviving needed
       buckets (semi-join; per-task work bounded by bucket occupancy,
       not group size) and picks the two bounding values;
       lo + (k−⌊k⌋)·(hi−lo) is exactly Spark ``percentile`` /
       DuckDB ``quantile_cont`` semantics (gate events_percentiles_
       bucketed shares the plain gate's oracle verbatim).

    The sub-bucket function is monotone in v and ties (equal v) can
    never split across sub-buckets, so relocated ranks are exact —
    ``occupancy_bound``/``descent_rounds``/``n_buckets`` are cost
    knobs, never correctness knobs (pytest pins lognormal/pareto/
    mass-tie layouts at bound=32 against the buffering aggregate).

    Returns (group, n, p_<xx> ... rounded 6dp) like the plain gate."""
    from pyspark.sql import Window

    spark = ev.sparkSession
    src = ev.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    # n reports COUNT(*) (the gate's shape); rank positions use the
    # NON-NULL count, because `percentile` ignores NULLs — with any
    # null values present the two differ and k = (count(*)−1)·p would
    # select the wrong rank
    stats = src.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("v").alias("nv"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    ).persist()
    # every persist in this function is scoped to THIS call: the tiny
    # result is checkpointed at the end and the pinned frames released
    # (functions/_scope.py) — the descent loop re-persists `rows` per
    # round, so each generation is tracked
    pinned = [stats]
    bucket = F.when(
        F.col("vmax") == F.col("vmin"), F.lit(0)
    ).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col("v") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * n_buckets
            ).cast("int"),
        )
    )
    bucketed = src.filter(F.col("v").isNotNull()).join(
        F.broadcast(stats), "g"
    ).select("g", "v", bucket.alias("b"))
    # the histogram carries per-bucket min/max so descent rounds read
    # bucket stats from THIS tiny aggregate (and each round's
    # sub-histogram thereafter) — the corpus is never rescanned just
    # to size buckets
    hist = bucketed.groupBy("g", "b").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("v").alias("bmin"),
        F.max("v").alias("bmax"),
    ).persist()
    pinned.append(hist)
    w_cum = (
        Window.partitionBy("g").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0))
    )

    # one target row per (group, percentile, lo/hi bound)
    p_rows = [(float(p), w) for p in ps for w in (0, 1)]
    pdf = spark.createDataFrame(p_rows, "p double, hi int")
    targets = stats.crossJoin(F.broadcast(pdf)).select(
        "g",
        "p",
        "hi",
        (F.col("p") * (F.col("nv") - 1)).alias("k"),
    ).withColumn(
        "pos",
        F.when(F.col("hi") == 0, F.floor("k")).otherwise(F.ceil("k"))
        .cast("long"),
    )
    located = targets.join(hist, "g").filter(
        (F.col("pos") >= F.col("off"))
        & (F.col("pos") < F.col("off") + F.col("cnt"))
    ).select("g", "p", "hi", "k", "b", (F.col("pos") - F.col("off")).alias("lpos"))

    needed = located.select("g", "b").distinct()
    rows = bucketed.join(F.broadcast(needed), ["g", "b"], "left_semi")
    tgt = located.select("g", "b", "lpos", "p", "hi", "k")
    # needed-bucket stats straight off the histogram — no corpus scan
    bstats = hist.join(F.broadcast(needed), ["g", "b"], "left_semi").select(
        "g", "b", "cnt", "bmin", "bmax"
    )

    resolved = None  # targets answered without ranking: g,p,hi,k,v
    fin_rows = None  # (g,b,v) kept for the final bounded rank pass
    fin_tgt = None  # their targets

    def _union(a, bdf):
        return bdf if a is None else a.unionByName(bdf)

    for _ in range(max(0, int(descent_rounds))):
        # adaptive gate (the AQE move): ONE scalar action over the
        # tiny persisted histogram decides whether descent machinery
        # is built at all — a layout with every needed bucket under
        # the occupancy bound (the common case) never pays for a
        # single descent stage
        if (
            bstats.filter(F.col("cnt") > occupancy_bound)
            .limit(1).count() == 0
        ):
            break
        # descent WILL touch these rows repeatedly — persist the
        # needed-bucket restriction (memory-and-disk) so rounds scan
        # the data under descent, never the corpus again
        rows = rows.persist()
        pinned.append(rows)
        # constant-valued buckets: any rank selects bmin — resolve now
        # (this is the massive-ties layout subdivision cannot split)
        const = bstats.filter(F.col("bmin") == F.col("bmax"))
        resolved = _union(
            resolved,
            tgt.join(F.broadcast(const.select("g", "b", "bmin")), ["g", "b"])
            .select("g", "p", "hi", "k", F.col("bmin").alias("v")),
        )
        # small-enough buckets: bounded — leave for the final rank pass
        small = bstats.filter(
            (F.col("cnt") <= occupancy_bound) & (F.col("bmin") < F.col("bmax"))
        ).select("g", "b")
        fin_rows = _union(fin_rows, rows.join(F.broadcast(small), ["g", "b"], "left_semi"))
        fin_tgt = _union(fin_tgt, tgt.join(F.broadcast(small), ["g", "b"], "left_semi"))
        # over-cap buckets: subdivide uniformly over the bucket's OWN
        # value range; composite child key keeps depths disjoint
        big = bstats.filter(
            (F.col("cnt") > occupancy_bound) & (F.col("bmin") < F.col("bmax"))
        ).select("g", "b", "bmin", "bmax")
        sub = F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col("v") - F.col("bmin"))
                / (F.col("bmax") - F.col("bmin"))
                * n_buckets
            ).cast("int"),
        )
        rows = rows.join(F.broadcast(big), ["g", "b"]).select(
            "g",
            ((F.col("b") + 1) * n_buckets + sub).cast("long").alias("b"),
            "v",
        )
        sub_hist = rows.groupBy("g", "b").agg(
            F.count(F.lit(1)).alias("scnt"),
            F.min("v").alias("bmin"),
            F.max("v").alias("bmax"),
        )
        w_sub = (
            Window.partitionBy("g", F.expr(f"b div {n_buckets}"))
            .orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        sub_loc = sub_hist.select(
            "g",
            F.col("b").alias("cb"),
            F.expr(f"b div {n_buckets} - 1").alias("pb"),
            F.col("scnt"),
            F.coalesce(F.sum("scnt").over(w_sub), F.lit(0)).alias("soff"),
        )
        tgt = (
            tgt.join(F.broadcast(big.select("g", "b")), ["g", "b"], "left_semi")
            .withColumnRenamed("b", "pb")
            .join(sub_loc, ["g", "pb"])
            .filter(
                (F.col("lpos") >= F.col("soff"))
                & (F.col("lpos") < F.col("soff") + F.col("scnt"))
            )
            .select(
                "g",
                F.col("cb").alias("b"),
                (F.col("lpos") - F.col("soff")).alias("lpos"),
                "p",
                "hi",
                "k",
            )
        )
        # re-restrict to the children that actually HOLD a target rank
        # (≤ 2·|ps| per group) — non-target siblings drop out of every
        # later stage, and next round's stats come from the
        # sub-histogram, again without a corpus rescan
        needed = tgt.select("g", "b").distinct()
        rows = rows.join(F.broadcast(needed), ["g", "b"], "left_semi")
        bstats = sub_hist.join(
            F.broadcast(needed), ["g", "b"], "left_semi"
        ).select("g", "b", F.col("scnt").alias("cnt"), "bmin", "bmax")
    # beyond the unrolled rounds (pathological beyond design): still
    # exact, just degenerate-cost, like the pre-descent form
    fin_rows = _union(fin_rows, rows)
    fin_tgt = _union(fin_tgt, tgt)

    w_rank = Window.partitionBy("g", "b").orderBy("v")
    picked = (
        fin_rows
        .withColumn("lpos", F.row_number().over(w_rank).cast("long") - 1)
        .join(fin_tgt, ["g", "b", "lpos"])
        .select("g", "p", "hi", "k", "v")
    )
    if resolved is not None:
        picked = picked.unionByName(resolved)
    per_p = picked.groupBy("g", "p", "k").agg(
        F.first(F.when(F.col("hi") == 0, F.col("v")), ignorenulls=True).alias("lo_v"),
        F.first(F.when(F.col("hi") == 1, F.col("v")), ignorenulls=True).alias("hi_v"),
    ).select(
        "g",
        "p",
        F.round(
            F.col("lo_v")
            + (F.col("k") - F.floor("k")) * (F.col("hi_v") - F.col("lo_v")),
            6,
        ).alias("q"),
    )
    agg_cols = [
        F.round(
            F.first(F.when(F.col("p") == float(p), F.col("q")), ignorenulls=True), 6
        ).alias(f"p{int(round(p * 100))}")
        for p in ps
    ]
    # LEFT join from stats so an all-NULL group (per_p has no rows for
    # it) still surfaces with n=COUNT(*) and NULL quantiles — matching
    # the plain `percentile` aggregate the oracle runs
    from ._scope import checkpointed

    return checkpointed(
        stats.select("g", "n").join(per_p, "g", "left")
        .groupBy(F.col("g").alias(group_col), F.col("n").cast("long").alias("n"))
        .agg(*agg_cols),
        *pinned,
    )
