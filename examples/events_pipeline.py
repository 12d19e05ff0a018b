"""End-to-end events analytics on the engine's operators.

Run:  python examples/events_pipeline.py [sf_dir]

Chains the event-stream stages a product-analytics / feature-store
pipeline runs — sessionization, as-of attribution, funnel, cohort
retention, exact percentiles — using the SKEW-SAFE forms where one
hot key would otherwise serialize into a single task (the r9 twins:
segmented sessionize, carry-scan as-of, two-phase top-N,
histogram-descent percentiles). Every operator is oracle-checked in
the gate registry; this script is the user-facing composition.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.events import (
    asof_join_segmented,
    cohort_retention,
    exact_percentiles_bucketed,
    funnel,
    normalize_events_ts,
    sessionize_counts_segmented,
)
from ngff_zarr_spark.session import get_spark

GAP_NS = 1800 * 1_000_000_000
SEGMENT_NS = 6 * 3600 * 1_000_000_000


def main(sf_dir: str) -> None:
    spark = get_spark("events_pipeline")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))

    # 1. sessions per user — segmented: a bot user's history spreads
    # over many sort tasks instead of one
    sessions = sessionize_counts_segmented(
        ev.select("user_id", F.col("ts").alias("ns")), GAP_NS, SEGMENT_NS
    )
    n_users = sessions.count()
    busiest = sessions.orderBy(F.col("n_sessions").desc()).first()
    print(f"sessions: {n_users} users; busiest user "
          f"{busiest.user_id} -> {busiest.n_sessions} sessions")

    # 2. purchase attribution — carry-scan as-of join
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    attributed = asof_join_segmented(
        purchases, clicks, key="user_id", ts_col="ts",
        value_cols=("event_id",), suffix="_click", segment_ns=SEGMENT_NS,
    )
    n_p = attributed.count()
    n_matched = attributed.filter(F.col("event_id_click").isNotNull()).count()
    print(f"attribution: {n_matched}/{n_p} purchases have a prior click")

    # 3. conversion funnel (aggregate-only plan, no per-user sort)
    for r in funnel(ev).collect():
        print(f"funnel step {r.step_index} {r.step}: {r.n_users} users")

    # 4. weekly cohort retention triangle (first three cohorts)
    tri = cohort_retention(ev).orderBy("cohort_week", "week_offset").collect()
    for r in tri[:6]:
        print(f"cohort {r.cohort_week} +{r.week_offset}w: {r.n_users}")

    # 5. exact value percentiles without per-group buffering
    for r in exact_percentiles_bucketed(ev).orderBy("event_type").collect():
        print(f"{r.event_type}: n={r.n} p50={r.p50} p90={r.p90} p99={r.p99}")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
