"""r13 partitioned-write layout (functions/layout.write_partitioned):
pin BOTH pruning layers — directory-level partition pruning
(PartitionFilters in the scan, non-matching files never read) and
row-group min/max skipping on the Z-clustered column inside each
partition."""

from __future__ import annotations

import contextlib
import io
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.events import normalize_events_ts
from ngff_zarr_spark.functions.layout import write_partitioned


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _events(spark, sf_dir):
    return normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def test_partition_pruning_and_correctness(spark, sf_dir, tmp_path):
    out = os.path.join(str(tmp_path), "ev_part")
    ev = _events(spark, sf_dir).select("event_id", "event_type", "user_id", "value")
    write_partitioned(ev, out, ["event_type"], cluster_cols=["user_id", "value"])

    reread = spark.read.parquet(out)
    one_type = reread.filter(F.col("event_type") == "click")
    plan = _plan(one_type)
    # the categorical predicate is a PartitionFilter, not a data filter
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]
    # only the matching directory's files are read
    assert set(f.event_type for f in one_type.select("event_type").distinct().collect()) == {"click"}
    # (inputFiles() reports the relation's full file list pre-pruning,
    # so the pruning evidence is the PartitionFilters entry above plus
    # the directory layout below)
    assert any("event_type=click" in d for d in os.listdir(out))
    # nothing lost in the relayout
    assert reread.count() == ev.count()
    got = sorted(r.event_id for r in one_type.collect())
    want = sorted(
        r.event_id for r in ev.filter(F.col("event_type") == "click").collect()
    )
    assert got == want


def test_rowgroup_stats_cluster_within_partitions(spark, sf_dir, tmp_path):
    # within one partition directory, the Z-clustered layout must give
    # row groups with strictly narrower user_id ranges than a
    # round-robin write of the same rows
    out_c = os.path.join(str(tmp_path), "clustered")
    out_n = os.path.join(str(tmp_path), "natural")
    ev = _events(spark, sf_dir).select("event_id", "event_type", "user_id", "value")
    write_partitioned(ev, out_c, ["event_type"], cluster_cols=["user_id", "value"])
    write_partitioned(ev, out_n, ["event_type"])

    def spans(root):
        total_span = 0
        n_groups = 0
        for dirpath, _, files in os.walk(root):
            if "event_type=click" not in dirpath:
                continue
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(dirpath, fn)).metadata
                for g in range(md.num_row_groups):
                    col = next(
                        md.row_group(g).column(i)
                        for i in range(md.row_group(g).num_columns)
                        if md.row_group(g).column(i).path_in_schema == "user_id"
                    )
                    total_span += col.statistics.max - col.statistics.min
                    n_groups += 1
        return total_span / max(n_groups, 1)

    # clustered row groups cover a much narrower user_id range on
    # average -> a user_id range predicate skips most of them
    assert spans(out_c) < spans(out_n) * 0.7
