"""r13 C4-style line-level dedup (functions/spans.line_dedup): cut
every line-block occurring verbatim in more than ``max_df`` distinct
documents, re-join the survivors (Raffel et al. 2020 §2.2 line filter;
reference analog: the corpus-hygiene role of the dedup family)."""

from __future__ import annotations

from ngff_zarr_spark.functions.spans import line_dedup


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in line_dedup(df, **kw).collect()}


def test_hand_fixture(spark):
    # line_len=2 blocks: doc 1 -> ["a b", "c d"], doc 2 -> ["a b", "x y"],
    # doc 3 -> ["p q"]; "a b" occurs in 2 docs -> cut from both
    rows = [(1, "a b c d"), (2, "a b x y"), (3, "p q")]
    got = _run(spark, rows, line_len=2)
    assert got[1].clean_text == "c d"
    assert (got[1].n_lines, got[1].n_kept, got[1].n_dropped) == (2, 1, 1)
    assert got[2].clean_text == "x y"
    assert got[3].clean_text == "p q"
    assert got[3].n_dropped == 0


def test_all_lines_cut_leaves_empty_doc(spark):
    rows = [(1, "a b"), (2, "a b")]
    got = _run(spark, rows, line_len=2)
    assert got[1].clean_text == "" and got[1].n_kept == 0
    assert got[2].clean_text == "" and got[2].n_kept == 0


def test_within_doc_repeat_is_not_cut(spark):
    # the same line twice in ONE doc: distinct-doc frequency is 1,
    # so the C4 rule keeps both copies (it is a cross-doc filter;
    # within-doc repetition is text_repetition's job)
    rows = [(1, "a b a b"), (2, "c d")]
    got = _run(spark, rows, line_len=2)
    assert got[1].clean_text == "a b a b"
    assert got[1].n_dropped == 0


def test_partial_trailing_block_participates(spark):
    # trailing 1-token blocks "z" collide across docs -> cut
    rows = [(1, "a b z"), (2, "c d z")]
    got = _run(spark, rows, line_len=2)
    assert got[1].clean_text == "a b"
    assert got[2].clean_text == "c d"
    assert got[1].n_lines == 2 and got[1].n_dropped == 1


def test_max_df_threshold(spark):
    # "a b" in 2 docs: kept at max_df=2, cut at max_df=1
    rows = [(1, "a b c d"), (2, "a b x y")]
    loose = _run(spark, rows, line_len=2, max_df=2)
    assert loose[1].clean_text == "a b c d"
    strict = _run(spark, rows, line_len=2, max_df=1)
    assert strict[1].clean_text == "c d"


def test_normalization_and_empty_doc(spark):
    # case/whitespace-insensitive matching; empty doc emits no row
    rows = [(1, "A  b c d"), (2, "a B x y"), (3, "   ")]
    got = _run(spark, rows, line_len=2)
    assert got[1].clean_text == "c d"
    assert 3 not in got


def test_matches_duckdb_oracle_sf0001(spark):
    import duckdb

    from ngff_zarr_spark.gate import q_dedup_lines
    from ngff_zarr_spark.oracle import sql_dedup_lines

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.doc_id, r.clean_text, r.n_lines, r.n_kept, r.n_dropped)
        for r in q_dedup_lines(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(tuple(t) for t in con.execute(sql_dedup_lines()).fetchall())
    assert got == want
