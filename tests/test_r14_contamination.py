"""Benchmark decontamination scan (GPT-3 Appendix C 13-gram rule) —
semantics pinned on a hand-checkable corpus, including the cross-doc
leak case the fixture gate can only hit organically."""

from ngff_zarr_spark.functions.spans import contamination_scan


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = [f"w{i}" for i in range(40)]


def test_leaked_doc_flagged_clean_doc_not(spark):
    bench_text = " ".join(WORDS[:15])  # 15 tokens -> 3 thirteen-grams
    docs = _df(spark, [
        (1, "intro " + bench_text + " outro"),        # contains the benchmark
        (2, " ".join(WORDS[20:40])),                   # disjoint vocabulary
        (3, " ".join(WORDS[:12]) + " different tail"), # only a 12-token prefix
    ])
    bench = _df(spark, [(100, bench_text)])
    out = {r.doc_id: r for r in contamination_scan(docs, bench).collect()}
    assert out[1].dirty == 1 and out[1].n_hit == 3
    assert out[2].dirty == 0 and out[2].n_hit == 0
    # a 12-token overlap is BELOW the 13-gram threshold: clean
    assert out[3].dirty == 0


def test_normalization_case_insensitive(spark):
    bench = _df(spark, [(9, " ".join(WORDS[:13]).upper())])
    docs = _df(spark, [(1, " ".join(WORDS[:13]))])
    out = contamination_scan(docs, bench).collect()[0]
    assert out.dirty == 1 and out.n_hit == 1 and out.n_grams == 1


def test_short_doc_zero_grams(spark):
    docs = _df(spark, [(1, "too short")])
    bench = _df(spark, [(9, " ".join(WORDS[:13]))])
    out = contamination_scan(docs, bench).collect()[0]
    assert (out.n_grams, out.n_hit, out.hit_frac, out.dirty) == (0, 0, 0.0, 0)


def test_hit_count_is_positions_not_distinct_grams(spark):
    """A doc repeating the leaked gram counts every position."""
    g = " ".join(WORDS[:13])
    docs = _df(spark, [(1, g + " sep " + g)])
    bench = _df(spark, [(9, g)])
    out = contamination_scan(docs, bench).collect()[0]
    assert out.n_hit == 2 and out.dirty == 1
