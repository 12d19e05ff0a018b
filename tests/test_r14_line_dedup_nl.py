"""Newline-delimiter mode of line_dedup (C4's actual '\n' rule,
Raffel et al. §2.2; VERDICT r13 ask #4) — semantics pinned on a
hand-checkable corpus."""

import pyspark.sql.functions as F  # noqa: F401

from ngff_zarr_spark.functions.spans import line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_nl_mode_cuts_repeated_lines_from_every_holder(spark):
    docs = _docs(spark, [
        (1, "unique one\nSHARED LINE\ntail a"),
        (2, "unique two\nSHARED LINE\ntail b"),
        (3, "solo doc\nwith no dupes"),
    ])
    out = {r.doc_id: r for r in line_dedup(docs, delimiter="\n").collect()}
    assert out[1].clean_text == "unique one\ntail a"
    assert out[2].clean_text == "unique two\ntail b"
    assert (out[1].n_lines, out[1].n_kept, out[1].n_dropped) == (3, 2, 1)
    assert out[3].clean_text == "solo doc\nwith no dupes"
    assert out[3].n_dropped == 0


def test_nl_mode_verbatim_not_normalized(spark):
    """Delimiter mode matches lines VERBATIM — case/punctuation differ,
    lines differ (unlike the token-block mode, which normalizes)."""
    docs = _docs(spark, [
        (1, "Shared Line"),
        (2, "shared line"),
    ])
    out = {r.doc_id: r for r in line_dedup(docs, delimiter="\n").collect()}
    assert out[1].n_dropped == 0 and out[2].n_dropped == 0


def test_nl_mode_all_cut_yields_empty(spark):
    docs = _docs(spark, [(1, "dup"), (2, "dup")])
    out = {r.doc_id: r for r in line_dedup(docs, delimiter="\n").collect()}
    assert out[1].clean_text == "" and out[1].n_kept == 0


def test_nl_mode_preserves_line_order(spark):
    docs = _docs(spark, [
        (1, "z last alphabetically\nBOILER\na first alphabetically"),
        (2, "BOILER"),
    ])
    out = {r.doc_id: r for r in line_dedup(docs, delimiter="\n").collect()}
    assert out[1].clean_text == "z last alphabetically\na first alphabetically"


def test_custom_delimiter_is_literal_not_regex(spark):
    """The delimiter is escaped — a regex metacharacter splits
    literally."""
    docs = _docs(spark, [(1, "a|b|a"), (2, "b|c")])
    out = {r.doc_id: r for r in line_dedup(docs, delimiter="|").collect()}
    # 'b' occurs in both docs -> cut everywhere; 'a' twice in doc 1 is
    # a single-document repeat (df=1) and survives both times
    assert out[1].clean_text == "a|a"
    assert out[2].clean_text == "c"
