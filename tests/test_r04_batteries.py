"""Round-4 driver-slot consolidation: the driver oracle-checks the
FIRST 50 entries of queries() only, and the registry outgrew that
window in r3 (68 entries, 18 gates starved of oracle rows). r4 fix:
the 18 starved gates occupy slots 1-18, and multi-gate families are
folded into tagged "battery" gates so every operator family fits
inside the window. This module pins

1. the 50-slot layout (starved gates first, every battery inside the
   window, nothing previously-verified silently dropped), and
2. battery == union-of-constituents equivalence, so a battery row is
   evidence for each constituent single-operator gate, and
3. resize_image_packed == posexplode(resize_image_pixels) (the
   array-native production twin of the per-pixel oracle form).
"""

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark import gate, oracle

# gates that were green in r2/r3 but fell outside the r3 window, or
# were registered and never slotted (VERDICT r3 "What's missing" #1)
STARVED_R3 = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "events_hourly",
    "events_hourly_stream",
    "events_sessionize",
    "events_session_window",
    # r14 rotation: the five HCS/NIfTI singletons fold into
    # hcs_battery. r15 rotation (VERDICT r14 ask #5): the four
    # displaced singletons (events_rollup, text_vocab_coverage,
    # ann_mmr_query, ir_tfidf_topk) are battery constituents (digest-
    # proven in-window); their rows grade the r14 late additions
    # directly.
    "hcs_battery",
    # r16 rotation (VERDICT r15 ask #6): the hygiene singletons'
    # direct rows hand over to the named promotions
    "sketch_heavy_hitters_stream",
    "web_url_dedup",
    # r7: s14's slot is the itk battery (s14 import + s15 export)
    "itk_adapter_battery",
    # r17 rotation (VERDICT r16 ask #4): web_host_stats' row hands over
    # to the composed crawl chain; host_stats stays digest-proven via
    # web_battery and runs live as the pipeline's stage 2
    "web_pipeline_battery",
    "c7_validate_battery",
    # r13 rotation: c8/c9/c10 fold into metadata_battery.
    "metadata_battery",
    "s11_tiff_series",
    "events_dedup_stream",
    "t1_stream_pixels",
    "t2_t3_callbacks",
]

BATTERIES = {
    "slicing_battery": ["f1_level_pick", "f2_roi", "f3_f4_tc_select", "f5_transpose"],
    "downsample_battery": [
        "a2_bin_shrink",
        "a7_nearest",
        "a8_mode",
        "a8_mode_centered",
        "a3_label_downsample",
    ],
    "gaussian_battery": ["a1_gaussian", "a4_itk_gaussian"],
    "storage_roundtrip_battery": [
        "s1_s4_zarr_roundtrip",
        "s1_dot_separator_read",
        "s9_blosc_roundtrip",
        "s8_sharded_roundtrip",
        "dtype_uint16_roundtrip",
        "dtype_float16_roundtrip",
        "dtype_int64_roundtrip",
        "dtype_uint64_roundtrip",
        "dtype_complex64_roundtrip",
        "dtype_complex128_roundtrip",
        "s1_roi_pruned_read",
        "s2_http_read",
    ],
    "text_battery": [
        "text_token_count",
        "text_quality",
        "text_lang_id",
        "text_fingerprint",
        "text_winnow",
    ],
    # r7 folds: itk import+export; batch+stream exact dedup; the three
    # single-raster ingest routes (incl. the native baseline-JPEG path)
    "itk_adapter_battery": ["s14_itk_adapter", "s15_itk_export"],
    "dedup_exact_battery": ["dedup_exact", "dedup_exact_stream"],
    "ingest_battery": [
        "s11_tiff_ingest",
        "s11_tiff_series",
        "s13_png_series",
        "s11_jpeg_ingest",
        "s11_dicom_ingest",
        "s11_gif_ingest",
        "s11_webp_ingest",
        "s11_mgh_ingest",
        "s11_mrc_ingest",
        "s11_wav_ingest",
    ],
    # r8 digest batteries (value-exact content digests per constituent;
    # see gate._digest_gate) — rotate the whole r7/r8 events-analytics
    # and corpus-sampling surfaces into the driver window and fold the
    # multimodal/sketch families to free the slots
    "events_analytics_battery": gate.EVENTS_ANALYTICS_PARTS,
    "corpus_sampling_battery": gate.CORPUS_SAMPLING_PARTS,
    "multimodal_battery": gate.MULTIMODAL_PARTS,
    "sketch_battery": gate.SKETCH_PARTS,
    # r14 fold: the five HCS/NIfTI singletons (digest battery)
    "hcs_battery": gate.HCS_PARTS,
    # r9 folds: dedup + ANN families (digest batteries); r15 split:
    # the corpus-hygiene half of dedup_battery (VERDICT r14 ask #6)
    "dedup_battery": gate.DEDUP_PARTS,
    "hygiene_battery": gate.HYGIENE_PARTS,
    "ann_battery": gate.ANN_PARTS,
    # r11 fold: the past-the-window TPC-H plan-family gates
    "tpch_battery": gate.TPCH_PARTS,
    # r15 folds: the segmented/bucketed skew twins and the web-hygiene
    # family (digest batteries)
    "events_skew_battery": gate.EVENTS_SKEW_PARTS,
    "web_battery": gate.WEB_PARTS,
}


def test_first_50_layout():
    qs = list(gate.queries())
    first50 = qs[:50]
    # the 18 r3-starved gates are verified first
    assert first50[:18] == STARVED_R3
    # every battery sits inside the window
    for b in BATTERIES:
        assert b in first50, b
    # every first-50 entry has an oracle (full value-hash check, not
    # the weaker rows-only fallback) except the genuinely non-SQL ones
    rows_only_ok = set()
    oracles = oracle.oracles()
    missing = [k for k in first50 if k not in oracles and k not in rows_only_ok]
    assert missing == [], missing
    # r6/r9: transitively-proven twins remain registered past the window
    assert "dedup_minhash_sig" in qs[50:]
    assert "multimodal_resize_packed" in qs[50:]
    # r7: the three folds freed slots for the export adapter, the
    # replay-dedup exactly-once gate, and plain-PQ ADC; constituents
    # stay registered past the window
    # r15 third rotation: events_dedup_stream folded into
    # events_analytics_battery; r16 promotes it BACK to a direct row
    # (VERDICT r15 ask #6) — it stays a battery constituent
    assert "events_dedup_stream" in first50
    assert "events_dedup_stream" in gate.EVENTS_ANALYTICS_PARTS
    assert "multimodal_pipeline_battery" in first50
    assert "dedup_exact_battery" in first50
    assert "ingest_battery" in first50
    for k in (
        "s14_itk_adapter",
        "s15_itk_export",
        "dedup_exact",
        "dedup_exact_stream",
        "s11_tiff_ingest",
        "s13_png_series",
        "s11_jpeg_ingest",
    ):
        assert k in qs[50:], k
    # r8: digest batteries hold driver slots; every constituent —
    # including the whole r7 surface that sat past the window — is
    # proven via its battery and stays registered past slot 50
    for b in (
        "events_analytics_battery",
        "corpus_sampling_battery",
        "multimodal_battery",
        "sketch_battery",
    ):
        assert b in first50, b
    # r8: the parity battery (pytest-only §2 rows → driver-graded)
    # holds slot 49; multimodal_features/resize move past the window
    # (proven via multimodal_battery)
    assert "parity_battery" in first50
    assert "multimodal_features" in qs[50:]
    assert "multimodal_resize" in qs[50:]
    # r13 second-batch rotation residue: the three double-covered
    # singletons stay past the window, value-proven via batteries
    for k in ("sketch_hll_distinct", "corpus_filter_pipeline", "dedup_dup_spans"):
        assert k in qs[50:], k
        assert any(
            k in parts for parts in BATTERIES.values()
        ) or k in gate.CORPUS_SAMPLING_PARTS + gate.SKETCH_PARTS, k
    # r14 rotation (VERDICT r13 ask #7): hcs_battery in-window; its
    # five constituents past the window, value-proven via the digest
    assert "hcs_battery" in first50
    for k in gate.HCS_PARTS:
        assert k in qs[50:], k
    assert "graph_pagerank" in qs[50:] and "graph_pagerank" in gate.DEDUP_PARTS
    assert "dedup_lines" in qs[50:] and "dedup_lines" in gate.HYGIENE_PARTS
    # r15 rotation (VERDICT r14 asks #1/#2/#5/#6): the six named r14
    # additions + the persisted-index gate + the composed pipeline +
    # the hygiene half of the split dedup_battery grade DIRECTLY; the
    # nine displaced rows are all battery constituents and move past
    # the window, each still value-proven via its digest
    for k in (
        "s11_tiff_series",
        "dtype_complex64_roundtrip",
        "dtype_complex128_roundtrip",
        "dedup_index_refresh",
        "corpus_pipeline_battery",
        "hygiene_battery",
    ):
        assert k in first50, k
    # r16 rotation (VERDICT r15 asks #2/#6): the four named promotions
    # plus the composed imaging pipeline grade DIRECTLY; the five
    # displaced hygiene singletons are all hygiene_battery constituents
    # and move past the window, each still value-proven via its digest
    for k in (
        "sketch_heavy_hitters_stream",
        "web_url_dedup",
        "events_dedup_stream",
        "imaging_pipeline_battery",
    ):
        assert k in first50, k
    # r17 rotation (VERDICT r16 ask #4): the composed crawl chain takes
    # web_host_stats' slot; the displaced gate is a web_battery
    # constituent (digest value-proven in-window) and also runs live as
    # the pipeline's stage 2
    assert "web_pipeline_battery" in first50
    assert "web_host_stats" in qs[50:]
    assert "web_host_stats" in gate.WEB_PARTS
    for k in (
        "dedup_lines_nl",
        "dedup_contamination",
        "dedup_contamination_stream",
        "dedup_incremental",
        "dedup_incremental_stream",
    ):
        assert k in qs[50:], k
        assert k in gate.HYGIENE_PARTS, k
    for k, battery in (
        ("events_rollup", gate.EVENTS_ANALYTICS_PARTS),
        ("text_vocab_coverage", gate.CORPUS_SAMPLING_PARTS),
        ("ann_mmr_query", gate.ANN_PARTS),
        ("ir_tfidf_topk", gate.CORPUS_SAMPLING_PARTS),
        ("text_bpe_merges", gate.CORPUS_SAMPLING_PARTS),
        ("ir_bm25_query", gate.CORPUS_SAMPLING_PARTS),
        ("corpus_priority_sample_stream", gate.CORPUS_SAMPLING_PARTS),
        ("ann_sq8_topk", gate.ANN_PARTS),
        ("ann_mmr_rerank", gate.ANN_PARTS),
    ):
        assert k in qs[50:], k
        assert k in battery, k
    # the split keeps both halves small enough that one flaky
    # constituent can't mask eight others (VERDICT r14 ask #6)
    assert len(gate.DEDUP_PARTS) <= 8 and len(gate.HYGIENE_PARTS) <= 8
    # r9 rotation (VERDICT r8 ask #7): dedup/ANN families fold into two
    # digest batteries. r10 rotation (VERDICT r9 ask #2): the five r9
    # skew-safe twins take the window slots of the asof forward/
    # tolerance forms and the funnel/cohort/bloom trio, which move
    # past the window — each still value-proven via
    # events_analytics_battery and individually addressable.
    # r11 rotation (VERDICT r10 ask #4): events_range_windows_bucketed
    # moves past the window (still value-proven via
    # events_analytics_battery) and tpch_battery takes its slot
    for k in (
        "dedup_battery",
        "ann_battery",
        "tpch_battery",
        "events_asof_stream",
        "dedup_skew_cluster",
    ):
        assert k in first50, k
    for k in (
        "events_asof_forward",
        "events_asof_tolerance",
        "events_funnel",
        "events_cohort_retention",
        "events_bloom_semijoin",
        "events_range_windows_bucketed",
    ):
        assert k in qs[50:], k
    # r15 second rotation: the four segmented/bucketed skew twins fold
    # into events_skew_battery (digest value-proven in-window); their
    # direct slots grade the composed events pipeline (which runs the
    # three segmented operators on the engaged subset), the exact
    # heavy-hitter gate, and the web-hygiene battery
    for k in (
        "events_skew_battery",
        "events_pipeline_battery",
        "sketch_heavy_hitters",
        "web_battery",
    ):
        assert k in first50, k
    # r16: web_url_dedup / web_host_stats promoted to direct in-window
    # rows (VERDICT r15 ask #6) while remaining WEB_PARTS constituents
    for k in gate.EVENTS_SKEW_PARTS + gate.WEB_PARTS:
        assert k in qs[50:] or k in first50, k
    # r13: a battery constituent may ALSO hold a direct window slot
    # (graph_pagerank rotated in; double grading is never a problem) —
    # the requirement is only that every constituent stays registered
    for k in gate.DEDUP_PARTS + gate.HYGIENE_PARTS + gate.ANN_PARTS + gate.TPCH_PARTS:
        assert k in qs[50:] or k in first50, k
    # r13 rotation (VERDICT r12 ask #6): planner/metadata singletons
    # fold into two digest batteries; the six freed slots grade the
    # r12/r13 flagships directly. Displaced constituents stay
    # registered past the window. (graph_pagerank rotated back out in
    # r14's second rotation — asserted below.)
    for k in (
        "planner_battery",
        "metadata_battery",
        "dedup_clusters_chain",
        "events_zorder_nd",
    ):
        assert k in first50, k
    for k in gate.PLANNER_PARTS + gate.METADATA_PARTS:
        assert k in qs[50:], k
    # every constituent stays registered (past the window, or filling a
    # spare window slot until an r8 ingest gate claims it — direct
    # grading of a constituent is never a problem)
    for k in (
        gate.EVENTS_ANALYTICS_PARTS
        + gate.CORPUS_SAMPLING_PARTS
        + gate.MULTIMODAL_PARTS
        + gate.SKETCH_PARTS
        + gate.DEDUP_PARTS
        + gate.HYGIENE_PARTS
        + gate.ANN_PARTS
    ):
        assert k in qs, k


def test_digest_parts_lists_mirror_oracle():
    """gate.py and oracle.py declare the battery compositions
    independently (no cross-import) — pin them equal, and pin that
    every digest constituent has a render spec."""
    assert gate.EVENTS_ANALYTICS_PARTS == oracle.EVENTS_ANALYTICS_PARTS
    assert gate.CORPUS_SAMPLING_PARTS == oracle.CORPUS_SAMPLING_PARTS
    assert gate.MULTIMODAL_PARTS == oracle.MULTIMODAL_PARTS
    assert gate.SKETCH_PARTS == oracle.SKETCH_PARTS
    assert gate.DEDUP_PARTS == oracle.DEDUP_PARTS
    assert gate.HYGIENE_PARTS == oracle.HYGIENE_PARTS
    assert gate.ANN_PARTS == oracle.ANN_PARTS
    assert gate.TPCH_PARTS == oracle.TPCH_PARTS
    assert gate.PLANNER_PARTS == oracle.PLANNER_PARTS
    assert gate.METADATA_PARTS == oracle.METADATA_PARTS
    assert gate.HCS_PARTS == oracle.HCS_PARTS
    assert gate.EVENTS_SKEW_PARTS == oracle.EVENTS_SKEW_PARTS
    assert gate.WEB_PARTS == oracle.WEB_PARTS
    for p in (
        gate.EVENTS_ANALYTICS_PARTS
        + gate.CORPUS_SAMPLING_PARTS
        + gate.MULTIMODAL_PARTS
        + gate.SKETCH_PARTS
        + gate.DEDUP_PARTS
        + gate.HYGIENE_PARTS
        + gate.ANN_PARTS
        + gate.TPCH_PARTS
        + gate.PLANNER_PARTS
        + gate.METADATA_PARTS
        + gate.HCS_PARTS
        + gate.EVENTS_SKEW_PARTS
        + gate.WEB_PARTS
    ):
        assert p in oracle._DIGEST_SPECS, p


def test_digest_specs_match_gate_schemas(spark, sf_dir):
    """Every digest constituent's Spark schema agrees with the oracle
    render spec: same column set, and exactly the columns marked 'd'
    are float/double (a drifted column type would silently change the
    rendering and mismatch the DuckDB digest). The streaming
    constituent is skipped (building it runs the stream); its spec is
    covered by the battery oracle run."""
    from pyspark.sql.types import DoubleType, FloatType

    qs = gate.queries()
    for p, spec in oracle._DIGEST_SPECS.items():
        if p in (
            "events_count_sessions_stream",
            "dedup_substring_stream",
            "sketch_heavy_hitters_stream",
            "events_dedup_stream",
            "web_url_dedup_stream",
        ):
            continue
        df = qs[p](spark, sf_dir)
        assert set(df.columns) == set(spec), p
        for fld in df.schema.fields:
            is_float = isinstance(fld.dataType, (DoubleType, FloatType))
            assert (spec[fld.name] == "d") == is_float, f"{p}.{fld.name}"


def test_digest_battery_equals_constituent_digests(spark, sf_dir):
    """A digest battery row is exactly _digest_gate applied to the
    constituent's own gate output (checked on the two cheap batteries;
    the battery runner literally maps _digest_gate over the same
    constituent callables, so this pins the union plumbing + naming)."""
    qs = gate.queries()
    for battery, parts in (
        ("sketch_battery", gate.SKETCH_PARTS),
        ("corpus_sampling_battery", gate.CORPUS_SAMPLING_PARTS),
    ):
        got = {tuple(r) for r in qs[battery](spark, sf_dir).collect()}
        want = {
            tuple(gate._digest_gate(qs[p](spark, sf_dir), p).collect()[0])
            for p in parts
        }
        assert got == want, battery


def test_full_oracle_coverage():
    """EVERY registered gate — including those past the driver's 50-slot
    window — has an oracle entry (full value-hash check; the rows-only
    fallback is never exercised), and no oracle is orphaned."""
    qs = set(gate.queries())
    oracles = set(oracle.oracles())
    assert qs - oracles == set(), f"gates without oracle: {sorted(qs - oracles)}"
    assert oracles - qs == set(), f"oracles without gate: {sorted(oracles - qs)}"


def test_nothing_dropped():
    """Every gate that ever had a green CORRECTNESS row is still
    registered (possibly past slot 50, proven via its battery)."""
    qs = set(gate.queries())
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rnd in ("CORRECTNESS_r02.json", "CORRECTNESS_r03.json"):
        with open(os.path.join(here, rnd)) as f:
            for key in json.load(f):
                assert key in qs, f"{key} (green in {rnd}) dropped from registry"


def test_battery_constituents_registered():
    qs = list(gate.queries())
    for battery, parts in BATTERIES.items():
        for p in parts:
            assert p in qs, f"{battery} constituent {p} not registered"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("battery", ["slicing_battery", "downsample_battery"])
def test_battery_equals_constituents(spark, sf_dir, battery):
    """The tagged union in the battery is exactly the per-gate outputs
    (checked on the two cheap pixel batteries; gaussian/storage/text
    batteries literally call the same constituent functions, pinned by
    construction and by the sf0.01 oracle run)."""
    qs = gate.queries()
    bat = qs[battery](spark, sf_dir)
    tags = [r[0] for r in bat.select("gate").distinct().collect()]
    mapping = {
        "f1": "f1_level_pick",
        "f2": "f2_roi",
        "f3_f4": "f3_f4_tc_select",
        "f5": "f5_transpose",
        "a2": "a2_bin_shrink",
        "a7": "a7_nearest",
        "a8": "a8_mode",
        "a8c": "a8_mode_centered",
        "a3": "a3_label_downsample",
    }
    cols = [c for c in bat.columns if c != "gate"]
    for tag in tags:
        part = bat.filter(F.col("gate") == tag).select(*cols)
        solo = qs[mapping[tag]](spark, sf_dir).select(
            *[F.col(c).cast(dict(part.dtypes)[c]).alias(c) for c in cols]
        )
        assert _rows(part) == _rows(solo), f"{battery}:{tag}"


def test_resize_packed_equals_pixels(spark, sf_dir):
    """posexplode(packed.pixels) with y=pos//4, x=pos%4 reproduces the
    per-pixel oracle form row-for-row."""
    from ngff_zarr_spark.functions.multimodal import (
        resize_image_packed,
        resize_image_pixels,
    )

    docs = gate._docs(spark, sf_dir).limit(50)
    packed = resize_image_packed(docs)
    exploded = packed.select(
        "doc_id", F.posexplode("pixels").alias("pos", "v")
    ).select(
        "doc_id",
        (F.col("pos") / 4).cast("long").alias("y"),
        (F.col("pos") % 4).cast("long").alias("x"),
        "v",
    )
    pixels = resize_image_pixels(docs)
    assert _rows(exploded) == _rows(pixels)
