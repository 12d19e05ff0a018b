"""r8 training-pipeline operators: PII scrub, within-doc repetition,
sequence packing, end-to-end filter pipeline."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.corpus import filter_pipeline
from ngff_zarr_spark.functions.packing import pack_sequences, pack_stats
from ngff_zarr_spark.functions.pii import pii_signals
from ngff_zarr_spark.functions.repetition import repetition_signals


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows))


def test_pii_counts_and_redaction(spark):
    docs = _docs(spark, [
        {"doc_id": 1, "text": "mail bob.smith+x@ex-ample.co.uk or a@b.io now"},
        {"doc_id": 2, "text": "call 555-123-4567 ssn 123-45-6789 ip 10.0.255.1"},
        {"doc_id": 3, "text": "clean text with no pii at all"},
    ])
    out = {r["doc_id"]: r.asDict() for r in pii_signals(docs).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_pii"] == 2
    assert out[2]["n_phone"] == 1 and out[2]["n_ssn"] == 1 and out[2]["n_ipv4"] == 1
    assert out[2]["n_pii"] == 3
    assert out[3]["n_pii"] == 0
    # redaction digest: doc 3 unchanged, doc 2 fully scrubbed
    import hashlib

    assert out[3]["redacted_md5"] == hashlib.md5(
        b"clean text with no pii at all").hexdigest()
    assert out[2]["redacted_md5"] == hashlib.md5(
        b"call <PHONE> ssn <SSN> ip <IP>").hexdigest()


def test_pii_plan_has_no_keyed_shuffle(spark):
    # spread()'s round-robin fan-out on a 1-partition toy input is
    # expected; what must never appear is a keyed (hash/range) shuffle
    docs = _docs(spark, [{"doc_id": 1, "text": "x"}])
    plan = pii_signals(docs)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_repetition_fractions(spark):
    # "a b a b c": bigrams [a b, b a, a b, b c] -> dup mass for "a b" =
    # 2*3=6 of total 3+3+3+3=12 -> 0.5; trigrams all distinct -> 0.0
    docs = _docs(spark, [
        {"doc_id": 1, "text": "a b a b c"},
        {"doc_id": 2, "text": "x y"},          # no dup bigrams
        {"doc_id": 3, "text": "solo"},          # shorter than any n
    ])
    out = {r["doc_id"]: r.asDict() for r in repetition_signals(docs).collect()}
    assert out[1]["dup2_frac"] == pytest.approx(0.5)
    assert out[1]["dup3_frac"] == 0.0
    assert out[2]["dup2_frac"] == 0.0
    assert out[3]["dup2_frac"] == 0.0 and out[3]["dup4_frac"] == 0.0


def test_repetition_catches_looping_boilerplate(spark):
    docs = _docs(spark, [{"doc_id": 1, "text": "click here " * 50}])
    out = repetition_signals(docs).collect()[0]
    assert out["dup2_frac"] > 0.9 and out["dup4_frac"] > 0.9


def test_packing_block_contract(spark):
    rng = np.random.default_rng(5)
    docs = _docs(spark, [
        {"doc_id": i, "text": " ".join(["w"] * int(rng.integers(1, 300)))}
        for i in range(200)
    ])
    packed = pack_sequences(docs, budget=256, n_buckets=4).toPandas()
    assert len(packed) == 200
    # pack_id is exactly the block of the starting offset
    assert (packed["pack_id"] == packed["pack_offset"] // 256).all()
    # offsets are a contiguous capped-token prefix sum within bucket
    for _, grp in packed.groupby("bucket"):
        g = grp.sort_values("pack_offset")
        capped = g["n_tokens"].clip(upper=256)
        assert (g["pack_offset"].to_numpy()
                == np.concatenate([[0], capped.cumsum().to_numpy()[:-1]])).all()
    # deterministic: second run identical
    again = pack_sequences(docs, budget=256, n_buckets=4).toPandas()
    a = packed.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_packing_oversize_doc_owns_its_pack(spark):
    docs = _docs(spark, [
        {"doc_id": 1, "text": " ".join(["w"] * 1000)},  # > budget
        {"doc_id": 2, "text": "a b c"},
    ])
    packed = pack_sequences(docs, budget=64, n_buckets=1).toPandas()
    big = packed[packed.doc_id == 1].iloc[0]
    # capped at budget -> starts exactly on a pack boundary of its own
    assert big["pack_offset"] % 64 == 0
    assert big["n_tokens"] == 1000  # raw count reported


def test_packing_single_shuffle_plan(spark):
    docs = _docs(spark, [{"doc_id": 1, "text": "a b"}])
    plan = pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "rangepartitioning" not in plan


def test_pack_stats_fill(spark):
    docs = _docs(spark, [
        {"doc_id": i, "text": " ".join(["w"] * 100)} for i in range(8)
    ])
    st = pack_stats(docs, budget=250, n_buckets=1).toPandas().sort_values("pack_id")
    # 8 docs x 100 tokens in one bucket: packs cut at starting offsets
    # 0..700 -> blocks 0,0,0,1,1,2,2,2 (offset//250)
    assert st["n_docs"].tolist() == [3, 2, 3]
    assert st["n_tokens_packed"].sum() == 800


def test_duplicated_spans_hand_worked(spark):
    from ngff_zarr_spark.functions.spans import duplicated_spans

    docs = _docs(spark, [
        {"doc_id": 1, "text": "a b c d e f g h"},
        {"doc_id": 2, "text": "x y a b c d q r"},
        {"doc_id": 3, "text": "zz yy xx ww vv"},
        {"doc_id": 4, "text": "a b c d x y a b c d"},
    ])
    got = {
        (r["doc_id"], r["span_start"]): r.asDict()
        for r in duplicated_spans(docs, n=4).collect()
    }
    # 'a b c d' occurs in docs 1, 2, and twice in 4; 'x y a b' and
    # 'y a b c' occur in docs 2 and 4; doc 3 is clean
    assert got[(1, 0)]["span_end"] == 3 and got[(1, 0)]["n_windows"] == 1
    assert got[(2, 0)]["span_end"] == 5 and got[(2, 0)]["n_windows"] == 3
    # doc 4: covered window starts {0, 4, 5, 6} — window at 4 is
    # adjacent to span end 3, so everything merges into one span
    assert got[(4, 0)]["span_end"] == 9 and got[(4, 0)]["n_windows"] == 4
    assert len(got) == 3


def test_duplicated_token_fraction(spark):
    from ngff_zarr_spark.functions.spans import duplicated_token_fraction

    docs = _docs(spark, [
        {"doc_id": 1, "text": "a b c d e f g h"},
        {"doc_id": 2, "text": "a b c d"},
        {"doc_id": 3, "text": "p q r s t u v w"},
    ])
    out = {r["doc_id"]: r.asDict() for r in duplicated_token_fraction(docs, n=4).collect()}
    assert out[1]["dup_tokens"] == 4 and out[1]["dup_frac"] == pytest.approx(0.5)
    assert out[2]["dup_tokens"] == 4 and out[2]["dup_frac"] == pytest.approx(1.0)
    assert out[3]["dup_tokens"] == 0 and out[3]["dup_frac"] == 0.0


def test_spans_join_does_not_blow_up_on_hot_grams(spark):
    # a boilerplate gram repeated in every doc joins 1:1 with its count
    # row — output rows == covered positions, never count^2
    docs = _docs(spark, [
        {"doc_id": i, "text": "same old boiler plate " + f"unique{i} tail{i}"}
        for i in range(40)
    ])
    from ngff_zarr_spark.functions.spans import duplicated_spans

    spans = duplicated_spans(docs, n=4).toPandas()
    assert len(spans) == 40  # one span per doc
    assert (spans["span_start"] == 0).all()


def test_filter_pipeline_reasons(spark):
    # passes every Gopher rule: 60 words, mean len >= 3, two distinct
    # stopwords, all bigrams distinct (top frac = 1/59)
    long_en = " ".join([f"word{i:02d}" for i in range(58)] + ["the", "and"])
    docs = _docs(spark, [
        {"doc_id": 1, "lang": "en", "text": long_en},
        {"doc_id": 2, "lang": "en", "text": long_en},          # exact dup of 1
        {"doc_id": 3, "lang": "de", "text": long_en + " extra"},
        {"doc_id": 4, "lang": "en", "text": "too short"},
    ])
    out = {r["doc_id"]: r.asDict() for r in filter_pipeline(docs).collect()}
    assert out[1]["reason"] == "kept" and out[1]["keep"]
    assert out[2]["reason"] == "duplicate" and not out[2]["keep"]
    assert out[3]["reason"] == "lang"
    assert out[4]["reason"] == "quality"


def test_funnel_ordering_semantics(spark):
    from ngff_zarr_spark.functions.events import funnel

    rows = []
    # user 1: full ordered funnel; user 2: purchase BEFORE click (only
    # 2 stages count); user 3: click only after purchase... no view ->
    # never enters
    for uid, et, ts in [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "view", 10), (2, "purchase", 15), (2, "click", 20),
        (3, "click", 5), (3, "purchase", 6),
        (4, "view", 50), (4, "click", 50), (4, "purchase", 50),  # ties count
    ]:
        rows.append({"user_id": uid, "event_type": et,
                     "ts": ts, "event_id": len(rows), "value": 0.0})
    ev = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["step"]: r["n_users"] for r in funnel(ev).collect()}
    assert out == {"view": 3, "click": 3, "purchase": 2}


def test_hll_register_contract(spark):
    from ngff_zarr_spark.functions.sketch import HLL_M, hll_distinct
    from ngff_zarr_spark.functions.text import h64  # noqa: F401

    df = spark.range(5000).select(F.col("id").alias("k"))
    row = hll_distinct(df, "k").collect()[0]
    assert row["m"] == HLL_M
    # 5000 distinct over 64 buckets: every register occupied, estimate
    # within the standard ~1.04/sqrt(m) relative error band (3 sigma)
    assert row["n_nonempty"] == HLL_M
    assert abs(row["est"] - 5000) / 5000 < 3 * 1.04 / (HLL_M ** 0.5)
    # deterministic: identical on rerun
    again = hll_distinct(df, "k").collect()[0]
    assert row.asDict() == again.asDict()


def test_cohort_retention_triangle(spark):
    from ngff_zarr_spark.functions.events import cohort_retention

    W = 7 * 86400 * 1_000_000_000
    rows = []
    # user 1 signs up week 0, active weeks 0,1,3; user 2 signs up week
    # 1, active week 1 only; user 3 never signs up (excluded)
    for uid, et, wk in [
        (1, "signup", 0), (1, "view", 1), (1, "click", 3),
        (2, "signup", 1),
        (3, "view", 0), (3, "view", 2),
    ]:
        rows.append({"user_id": uid, "event_type": et,
                     "ts": wk * W + 1000, "event_id": len(rows), "value": 0.0})
    ev = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1}


def test_bloom_semijoin_equals_plain_semijoin(spark):
    from ngff_zarr_spark.functions.events import bloom_semi_join

    rng = np.random.default_rng(13)
    rows = [
        {"user_id": int(u), "event_type": "purchase" if rng.random() < 0.05 else "view",
         "ts": int(i), "event_id": i, "value": 0.0}
        for i, u in enumerate(rng.integers(0, 400, 3000))
    ]
    ev = spark.createDataFrame(pd.DataFrame(rows))
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    got = sorted(map(tuple, bloom_semi_join(ev, buyers).collect()))
    want = sorted(map(tuple, ev.join(buyers.distinct(), "user_id", "left_semi").collect()))
    assert got == want and len(got) > 0


def test_bloom_prefilter_actually_filters(spark):
    # non-member rows must be dropped by the bloom BEFORE the join:
    # with a tiny member set, the prefiltered row count is far below
    # the input count (false positives only)
    from ngff_zarr_spark.functions.events import BLOOM_K, BLOOM_M_BITS, bloom_semi_join

    ev = spark.createDataFrame(pd.DataFrame([
        {"user_id": i, "event_type": "view", "ts": i, "event_id": i, "value": 0.0}
        for i in range(2000)
    ]))
    keys = ev.filter(F.col("user_id") < 3).select("user_id")
    out = bloom_semi_join(ev, keys)
    # exactness after the join
    assert sorted(r["user_id"] for r in out.collect()) == [0, 1, 2]
    # the bloom member predicate itself (the pre-join filter) must drop
    # nearly everything: rebuild it by taking the plan's Filter child
    # — cheaper: count rows passing the SAME predicate by re-deriving
    # the prefiltered frame (bloom_semi_join filters BEFORE the join,
    # so its join input equals ev.filter(member))
    import math

    # analyzed plan (the optimizer constant-folds the filter INTO a
    # LocalRelation for in-memory test input — on a file scan it stays)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "forall" in plan and plan.index("forall") > plan.index("Join"), (
        "bloom filter must sit below (after, in plan text) the join node"
    )
    # analytic sanity: the fp bound at these parameters is tiny
    fp_bound = (1 - math.exp(-BLOOM_K * 3 / BLOOM_M_BITS)) ** BLOOM_K
    assert fp_bound < 1e-10


def test_chunking_contract(spark):
    from ngff_zarr_spark.functions.corpus import chunk_documents

    docs = _docs(spark, [
        {"doc_id": 1, "text": " ".join(f"t{i}" for i in range(10))},
        {"doc_id": 2, "text": "one two"},
    ])
    out = chunk_documents(docs, chunk_tokens=4, stride=3).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_idx")
    # starts 0,3,6,9; lengths 4,4,4,1
    assert d1["start_tok"].tolist() == [0, 3, 6, 9]
    assert d1["n_tokens"].tolist() == [4, 4, 4, 1]
    import hashlib

    assert d1.iloc[0]["chunk_md5"] == hashlib.md5(b"t0 t1 t2 t3").hexdigest()
    assert d1.iloc[3]["chunk_md5"] == hashlib.md5(b"t9").hexdigest()
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0]["n_tokens"] == 2


def test_chunking_no_shuffle(spark):
    from ngff_zarr_spark.functions.corpus import chunk_documents

    docs = _docs(spark, [{"doc_id": 1, "text": "a b c"}])
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_rebalance_properties(spark):
    from ngff_zarr_spark.functions.corpus import rebalance_by_lang

    rng = np.random.default_rng(21)
    langs = ["en"] * 600 + ["de"] * 200 + ["fr"] * 100
    docs = _docs(spark, [
        {"doc_id": i, "lang": l, "text": "x"} for i, l in enumerate(langs)
    ])
    out = {r["lang"]: r.asDict() for r in rebalance_by_lang(docs).collect()}
    # smallest language keeps everything (threshold == bucket count)
    assert out["fr"]["threshold"] == 1_000_000 and out["fr"]["n_kept"] == 100
    # larger languages downsample toward the smallest's volume
    assert out["en"]["threshold"] == 1_000_000 * 100 // 600
    assert abs(out["en"]["n_kept"] - 100) < 50  # hash-binomial tolerance
    assert abs(out["de"]["n_kept"] - 100) < 50
    # deterministic
    again = {r["lang"]: r.asDict() for r in rebalance_by_lang(docs).collect()}
    assert out == again


def test_augment_rejects_sub_crop_image(spark):
    """ADVICE r8: an attached image smaller than the crop must raise a
    clear error instead of a ZeroDivisionError inside the Arrow UDF."""
    import pytest as _pytest

    from ngff_zarr_spark.functions.multimodal import augment_images
    from ngff_zarr_spark.ingest.png import png_encode
    import numpy as np

    tiny = png_encode(np.zeros((2, 3), dtype=np.uint8))  # < 4x5 crop

    # drive the UDF directly over a doc whose synthesized image we
    # replace with the tiny PNG via a monkeypatched attach
    from ngff_zarr_spark.functions import multimodal as mm

    df = spark.createDataFrame([(1,)], "doc_id long")
    orig = mm.attach_images
    try:
        mm.attach_images = lambda d: d.selectExpr(
            "doc_id", f"X'{bytes(tiny).hex()}' as image"
        )
        with _pytest.raises(Exception, match="smaller than"):
            mm.augment_images(df).collect()
    finally:
        mm.attach_images = orig
