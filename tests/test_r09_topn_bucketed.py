"""Two-phase (skew-safe) windowed top-N twin == single-window form.

q_events_user_topn_bucketed pre-ranks within (event_type,
hash(user) % 64) and re-ranks the survivors; with a TOTAL order
(n desc, user_id) every global top-5 row is in its own pre-bucket's
top-5, so the result is exactly the single-window answer — including
under heavy ties at the cut boundary.
"""

from pyspark.sql import functions as F


def _rows(df):
    return sorted(
        (r.event_type, r.rank, r.user_id, r.n) for r in df.collect()
    )


def test_bucketed_topn_equals_plain_on_sf(spark, sf_dir):
    from ngff_zarr_spark.gate import (
        q_events_user_topn,
        q_events_user_topn_bucketed,
    )

    plain = _rows(q_events_user_topn(spark, sf_dir))
    assert plain == _rows(q_events_user_topn_bucketed(spark, sf_dir))
    assert len(plain) > 0


def test_bucketed_topn_exact_under_boundary_ties(spark, tmp_path):
    """200 users in ONE event type, all with the same count except two
    leaders — ranks 3..200 are decided purely by the user_id tiebreak,
    so any bucket-boundary mistake would surface at the rank-5 cut."""
    import pandas as pd

    rows = []
    for u in range(200):
        n = 3 if u >= 2 else 10 - u  # u0:10, u1:9, rest tie at 3
        rows += [("hot", u)] * n
    # second, tiny event type: fewer users than the cut
    rows += [("cold", 7), ("cold", 7), ("cold", 8)]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")

    from pyspark.sql import Window

    from ngff_zarr_spark.functions.dedup import h64

    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    order = [F.col("n").desc(), F.col("user_id")]
    plain = counts.withColumn(
        "rank",
        F.row_number().over(Window.partitionBy("event_type").orderBy(*order)).cast("long"),
    ).filter(F.col("rank") <= 5)

    w1 = Window.partitionBy(
        "event_type", h64(F.col("user_id").cast("string")) % 64
    ).orderBy(*order)
    stage1 = counts.withColumn("prk", F.row_number().over(w1)).filter(
        F.col("prk") <= 5
    ).drop("prk")
    bucketed = stage1.withColumn(
        "rank",
        F.row_number().over(Window.partitionBy("event_type").orderBy(*order)).cast("long"),
    ).filter(F.col("rank") <= 5)

    p, b = _rows(plain), _rows(bucketed)
    assert p == b
    hot = [r for r in p if r[0] == "hot"]
    # leaders then the two smallest tied user_ids fill ranks 3-5
    assert [r[2] for r in hot] == [0, 1, 2, 3, 4]
    assert len([r for r in p if r[0] == "cold"]) == 2
