"""Pin the cluster-mode layout claim for the persisted dedup index.

The layout note in functions/dedup.py (and PLANS.md) has claimed since
r15 that "on a metastore cluster the same tables would be written with
bucketBy(band_key)/(doc_id) to make the probe joins shuffle-free; the
path layout here is the portable form." This test makes that claim a
pinned fact on the Spark version in use: the band table written as a
bucketed saveAsTable exposes HashPartitioning(band_key) from the scan,
and the (band, band_key) probe equi-join plans with NO exchange on the
corpus side — only the (batch-sized) probe side shuffles — while the
identical join over the plain path-based parquet shuffles BOTH sides.
Rows are identical either way.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


@pytest.fixture()
def no_broadcast(spark):
    """Force a shuffle join so the bucketed side's partitioning is what
    decides the exchange count (tiny test tables would broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_band_table_probe_join_corpus_side_no_shuffle(
    spark, tmp_path, no_broadcast
):
    from ngff_zarr_spark.functions.dedup import (
        _band_table,
        minhash_signatures_wide,
    )

    docs = spark.createDataFrame(
        [(i, f"corpus document {i} with shingle words {i * 7} {i * 13}")
         for i in range(300)],
        "doc_id long, text string",
    )
    bands = _band_table(minhash_signatures_wide(docs, 4), 4, 2)

    table = "r17_bands_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # bucket on the FULL join key set: since Spark 3.3 co-partition for
    # a join requires the partitioning to cover every join key
    # (spark.sql.requireAllClusterKeysForCoPartition=true by default),
    # so bucketBy(band_key) alone would still shuffle the corpus side
    (
        bands.write.bucketBy(8, "band", "band_key")
        .sortBy("band", "band_key")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    )
    plain_path = str(tmp_path / "bands_plain")
    bands.write.mode("overwrite").parquet(plain_path)

    probe = spark.createDataFrame(
        [(1000 + i, f"corpus document {i} with shingle words {i * 7} {i * 13}")
         for i in range(0, 300, 7)],
        "doc_id long, text string",
    )
    # materialize the probe bands so the exchange count isolates the
    # JOIN (the minhash aggregate upstream pays its own exchanges)
    pb_path = str(tmp_path / "probe_bands")
    _band_table(minhash_signatures_wide(probe, 4), 4, 2).select(
        F.col("doc_id").alias("new_doc"), "band", "band_key"
    ).write.mode("overwrite").parquet(pb_path)
    pb = spark.read.parquet(pb_path)

    try:
        stored_bucketed = spark.table(table)
        stored_plain = spark.read.parquet(plain_path)
        j_bucketed = pb.join(stored_bucketed, ["band", "band_key"]).select(
            "new_doc", F.col("doc_id").alias("ref_doc")
        )
        j_plain = pb.join(stored_plain, ["band", "band_key"]).select(
            "new_doc", F.col("doc_id").alias("ref_doc")
        )
        # plain path: BOTH join inputs shuffle on the join key.
        # bucketed: HashPartitioning(band, band_key) from the scan
        # covers the join keys — the corpus side reads in-place, only
        # the batch-sized probe side pays an exchange.
        n_plain, n_bucketed = _exchanges(j_plain), _exchanges(j_bucketed)
        assert n_plain == 2, f"plain join planned {n_plain} exchanges"
        assert n_bucketed == 1, (
            f"bucketed join planned {n_bucketed} exchanges — the "
            "corpus-side scan lost its bucket partitioning"
        )
        # identical candidate sets either way
        rows_b = sorted(map(tuple, j_bucketed.collect()))
        rows_p = sorted(map(tuple, j_plain.collect()))
        assert rows_b == rows_p and len(rows_b) > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
