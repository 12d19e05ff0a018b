"""r13 Z-order layout (VERDICT r12 ask #2): N-dimensional Morton keys
and the PHYSICAL payoff pin — the clustered layout must let parquet
row-group min/max statistics (the exact stats Spark's reader uses for
row-group skipping once a filter is pushed) prune strictly more of a
two-column box scan than the natural layout."""

from __future__ import annotations

import contextlib
import io
import math
import os
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.layout import (
    ZORDER_BITS,
    cluster_by_zorder,
    with_zorder_key,
    zorder_keys,
    zorder_keys_nd,
)


def _events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _brute_keys(rows, cols, bits):
    """Independent float64 Morton reference: same single-operand-order
    bucket expression ((v-lo)*k/(hi-lo), floor, clamp) then interleave
    with bit i of dim j at position i*n + (n-1-j)."""
    n = len(cols)
    k = (1 << bits) - 1
    lo = {c: min(r[c] for r in rows) for c in cols}
    hi = {c: max(r[c] for r in rows) for c in cols}
    out = {}
    for r in rows:
        bs = []
        for c in cols:
            l, h = float(lo[c]), float(hi[c])
            if h == l:
                bs.append(0)
            else:
                b = int(math.floor((float(r[c]) - l) * float(k) / (h - l)))
                bs.append(max(0, min(k, b)))
        z = 0
        for j, b in enumerate(bs):
            for i in range(bits):
                z |= ((b >> i) & 1) << (i * n + (n - 1 - j))
        out[r["id"]] = (tuple(bs), z)
    return out


def test_nd_reduces_to_2d(spark, sf_dir):
    ev = _events(spark, sf_dir).limit(200)
    a = {
        r.event_id: (r.b1, r.b2, r.zkey)
        for r in zorder_keys(ev, "user_id", "value", "event_id").collect()
    }
    b = {
        r.event_id: (r.b1, r.b2, r.zkey)
        for r in zorder_keys_nd(ev, ["user_id", "value"], "event_id").collect()
    }
    assert a == b and len(a) == 200


@pytest.mark.parametrize("ncols", [3, 4])
def test_nd_matches_brute(spark, ncols):
    rows = [
        {"id": i, "a": (i * 37) % 101, "b": float((i * 53) % 89) / 7.0,
         "c": (i * 11) % 13, "d": (i * 29) % 997}
        for i in range(300)
    ]
    cols = ["a", "b", "c", "d"][:ncols]
    df = spark.createDataFrame(rows)
    bits = min(ZORDER_BITS, 62 // ncols)
    got = {
        r["id"]: (tuple(r[f"b{j + 1}"] for j in range(ncols)), r.zkey)
        for r in zorder_keys_nd(df, cols, "id", bits=bits).collect()
    }
    assert got == _brute_keys(rows, cols, bits)


def test_nd_constant_dimension_guard(spark):
    df = spark.createDataFrame(
        [(i, 5, i % 7, i % 3) for i in range(40)], "id long, a long, b long, c long"
    )
    out = zorder_keys_nd(df, ["a", "b", "c"], "id").collect()
    assert all(r.b1 == 0 for r in out)
    assert any(r.zkey > 0 for r in out)


def test_with_zorder_key_matches_projected_form(spark, sf_dir):
    # the join-free writer form computes the SAME key as the projected
    # (id, buckets, zkey) form, and keeps every original column
    ev = _events(spark, sf_dir).limit(300)
    a = {
        r.event_id: r.zkey
        for r in zorder_keys_nd(ev, ["user_id", "value"], "event_id").collect()
    }
    wk = with_zorder_key(ev, ["user_id", "value"])
    assert set(ev.columns) | {"zkey"} == set(wk.columns)
    b = {r.event_id: r.zkey for r in wk.select("event_id", "zkey").collect()}
    assert a == b


def test_nd_rejects_bit_overflow(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, a long, b long")
    with pytest.raises(ValueError, match="bits"):
        zorder_keys_nd(df, ["a", "b"], "id", bits=32)


def _surviving_row_groups(path, pred):
    """Count row groups whose [min,max] stats intersect the box
    predicate {col: (lo, hi)} — exactly the skip decision a parquet
    reader makes from footer stats with the filter pushed."""
    total = survive = 0
    for fn in os.listdir(path):
        if not fn.endswith(".parquet"):
            continue
        f = pq.ParquetFile(os.path.join(path, fn))
        schema_names = f.schema_arrow.names
        for rg in range(f.metadata.num_row_groups):
            total += 1
            meta = f.metadata.row_group(rg)
            hit = True
            for col, (lo, hi) in pred.items():
                ci = meta.column(schema_names.index(col))
                st = ci.statistics
                assert st is not None and st.has_min_max
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            if hit:
                survive += 1
    return survive, total


def test_zorder_layout_prunes_row_groups(spark):
    """The payoff pin: write the same events twice — natural
    (round-robin) vs zkey-range-partitioned + sorted — and assert the
    clustered layout's footer stats prune strictly more row groups for
    a two-column box filter, with the filter actually pushed to the
    scan on read-back."""
    ev = _events(spark, "/root/testdata/sf0.01").select(
        "event_id", "user_id", "value"
    )

    lo_u, hi_u = 100, 160          # user_id spans ~0..500 at sf0.01
    stats = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).collect()[0]
    span = stats.hi - stats.lo
    lo_v, hi_v = stats.lo + 0.40 * span, stats.lo + 0.55 * span

    base = tempfile.mkdtemp(prefix="zorder_prune_")
    try:
        natural = os.path.join(base, "natural")
        clustered = os.path.join(base, "clustered")
        ev.repartition(16).write.parquet(natural)
        # the production verb: join-free inline zkey + range partition
        cluster_by_zorder(ev, ["user_id", "value"], 16).write.parquet(clustered)
        pred = {"user_id": (lo_u, hi_u), "value": (lo_v, hi_v)}
        s_nat, t_nat = _surviving_row_groups(natural, pred)
        s_clu, t_clu = _surviving_row_groups(clustered, pred)
        # round-robin scatters: essentially every row group spans the
        # full range and survives; the Z-clustered layout confines the
        # box to a small zkey range
        assert t_nat >= 8 and t_clu >= 8
        assert s_nat == t_nat
        assert s_clu < s_nat
        assert s_clu <= t_clu // 2

        # and the filter reaches the scan: PushedFilters on BOTH columns
        back = spark.read.parquet(clustered).filter(
            (F.col("user_id") >= lo_u) & (F.col("user_id") <= hi_u)
            & (F.col("value") >= lo_v) & (F.col("value") <= hi_v)
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            back.explain("formatted")
        plan = buf.getvalue()
        pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
        assert pushed and "user_id" in pushed[0] and "value" in pushed[0]

        # both layouts hold the same rows (layout is a pure reorder)
        n1 = spark.read.parquet(natural).count()
        n2 = spark.read.parquet(clustered).count()
        assert n1 == n2 == ev.count()
    finally:
        shutil.rmtree(base, ignore_errors=True)
