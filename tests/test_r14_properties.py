"""Hypothesis property tests for the r14 operators: each Spark result
must equal a brute-force pure-Python reference on randomized small
corpora — evidence independent of both the DuckDB oracles and the
hand-picked unit fixtures."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ngff_zarr_spark.functions.spans import contamination_scan, line_dedup

WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "xy"])
LINE = st.lists(WORD, min_size=0, max_size=4).map(" ".join)
DOC = st.lists(LINE, min_size=1, max_size=5).map("\n".join)


def _norm_tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]


def _ref_line_dedup_nl(docs: dict[int, str], max_df: int = 1):
    from collections import defaultdict

    holders = defaultdict(set)
    for did, text in docs.items():
        for line in text.split("\n"):
            holders[line].add(did)
    out = {}
    for did, text in docs.items():
        lines = text.split("\n")
        kept = [ln for ln in lines if len(holders[ln]) <= max_df]
        out[did] = (
            "\n".join(kept),
            len(lines),
            len(kept),
            len(lines) - len(kept),
        )
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.dictionaries(st.integers(0, 9), DOC, min_size=1, max_size=6))
def test_line_dedup_nl_matches_reference(spark, corpus):
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_kept, r.n_dropped)
        for r in line_dedup(df, delimiter="\n").collect()
    }
    assert got == _ref_line_dedup_nl(corpus)


def _ref_contamination(docs, bench, n):
    bgrams = set()
    for text in bench.values():
        toks = _norm_tokens(text)
        for i in range(len(toks) - n + 1):
            bgrams.add(tuple(toks[i : i + n]))
    out = {}
    for did, text in docs.items():
        toks = _norm_tokens(text)
        n_grams = max(len(toks) - n + 1, 0)
        n_hit = sum(
            1 for i in range(n_grams) if tuple(toks[i : i + n]) in bgrams
        )
        out[did] = (n_grams, n_hit, 1 if n_hit else 0)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(st.integers(0, 9), LINE, min_size=1, max_size=6),
    st.dictionaries(st.integers(100, 104), LINE, min_size=1, max_size=3),
    st.integers(1, 3),
)
def test_contamination_matches_reference(spark, corpus, bench, n):
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    bdf = spark.createDataFrame(list(bench.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_hit, r.dirty)
        for r in contamination_scan(docs, bdf, n=n).collect()
    }
    assert got == _ref_contamination(corpus, bench, n)
