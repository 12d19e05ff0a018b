"""r15: exact two-pass heavy hitters (functions/sketch.heavy_hitters).

The operator's claim is EXACT equality with GROUP BY + HAVING in the
guaranteed regime phi > 1/(k+1): the per-partition Misra-Gries pass
can only ADD false candidates (removed by the recount), never drop a
true heavy hitter. These tests pin that equality on adversarial
layouts (heavy eviction pressure, skewed keys concentrated in one
partition, multi-column keys), the guarantee-bound ValueError, and the
bounded-candidate scale contract (candidates ≤ k × partitions)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.sketch import heavy_hitters


def _exact(df, key_cols, phi_num, phi_den):
    n = df.count()
    return {
        tuple(r)
        for r in df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") * phi_den >= phi_num * n)
        .select(*key_cols, "n")
        .collect()
    }


def _got(df, key_cols, phi_num, phi_den, k):
    return {
        tuple(r)
        for r in heavy_hitters(df, key_cols, phi_num, phi_den, k)
        .select(*key_cols, "n")
        .collect()
    }


def test_quadratic_skew_matches_exact(spark):
    # key i appears (i+1)^2 times — a long light tail under heavy keys
    rows = [(f"k{i}",) for i in range(60) for _ in range((i + 1) ** 2)]
    random.Random(7).shuffle(rows)
    df = spark.createDataFrame(rows, "key string").repartition(16)
    for phi_num, phi_den, k in ((1, 100, 120), (2, 100, 60), (5, 100, 25)):
        assert _got(df, ("key",), phi_num, phi_den, k) == _exact(
            df, ("key",), phi_num, phi_den
        ), (phi_num, phi_den, k)


def test_eviction_pressure(spark):
    # distinct keys (401) >> counters (25): the decrement-all path runs
    # constantly; one key holds 20% and must survive every eviction
    rows = [("hot",)] * 2000 + [(f"t{i}",) for i in range(400) for _ in range(20)]
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame(rows, "key string").repartition(8)
    got = _got(df, ("key",), 1, 10, 25)
    assert got == _exact(df, ("key",), 1, 10)
    assert ("hot", 2000) in got


def test_single_partition_concentration(spark):
    # all of one heavy key lands in ONE partition (sorted layout):
    # the cross-partition composition of the guarantee still holds
    rows = [(i, "heavy" if i < 3000 else f"u{i}") for i in range(10000)]
    df = (
        spark.createDataFrame(rows, "id long, key string")
        .repartitionByRange(10, "id")
        .drop("id")
    )
    got = _got(df, ("key",), 1, 5, 10)
    assert got == _exact(df, ("key",), 1, 5)
    assert ("heavy", 3000) in got


def test_multi_column_key(spark):
    rows = [("en", "the")] * 500 + [("de", "the")] * 40 + [
        ("en", f"w{i}") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "lang string, token string").repartition(6)
    got = _got(df, ("lang", "token"), 1, 2, 30)
    assert got == _exact(df, ("lang", "token"), 1, 2)
    assert got == {("en", "the", 500)}


def test_frac_column(spark):
    df = spark.createDataFrame([("a",)] * 75 + [("b",)] * 25, "key string")
    rows = {r.key: r for r in heavy_hitters(df, ("key",), 20, 100, 10).collect()}
    assert rows["a"].frac == 0.75 and rows["b"].frac == 0.25


def test_guarantee_bound_raises(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters(df, ("key",), 1, 100, 50)
    # boundary: k = phi_den/phi_num is still too small ((k+1)*phi > 1
    # must hold STRICTLY above); k+1 works
    with pytest.raises(ValueError):
        heavy_hitters(df, ("key",), 1, 100, 99)
    heavy_hitters(df, ("key",), 1, 100, 100).collect()


def test_candidate_set_bounded(spark):
    # scale contract: pass-1 output ≤ k rows per partition — the
    # shuffle the operator exists to avoid (distinct-key-sized) never
    # happens. Reproduce pass 1 exactly and count.
    import pandas as pd

    k = 8
    rows = [(f"k{i % 97}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "key string").repartition(12)
    keyed = df.select(F.col("key").alias("_hhk"))

    def mg_sizes(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for key in pdf["_hhk"]:
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k:
                    counters[key] = 1
                else:
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame({"n": [len(counters)]})

    sizes = [
        r.n for r in keyed.mapInPandas(mg_sizes, "n long").collect()
    ]
    assert all(s <= k for s in sizes)
    assert sum(sizes) <= k * 12
