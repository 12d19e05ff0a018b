"""Keep-one substring-dedup removal set (functions/spans.
duplicated_span_removal / substring_dedup_stats) pinned against an
O(corpus²) brute-force recomputation, plus structural invariants:
exactly one canonical keeper per repeated window, interval-union
coverage that never double-counts overlaps, and the closed-form union
formula shown equal to merging maximal spans first."""

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.spans import (
    SPAN_N,
    duplicated_span_removal,
    substring_dedup_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _norm_toks(text):
    return [t for t in " ".join(text.lower().split()).split(" ") if t != ""]


def _brute(rows, n):
    """Pure-python recomputation: occurrence map, removal set, per-doc
    interval union."""
    occ = {}
    toks_by_doc = {}
    for doc_id, text in rows:
        toks = _norm_toks(text)
        toks_by_doc[doc_id] = toks
        for pos in range(max(0, len(toks) - n + 1)):
            occ.setdefault(tuple(toks[pos : pos + n]), []).append((doc_id, pos))
    removal = {}  # doc_id -> sorted removal positions
    verdicts = []  # (doc_id, pos, n_occ, rep_doc, rep_pos, is_canonical)
    for gram, sites in occ.items():
        if len(sites) < 2:
            continue
        wit = min(sites)
        for doc_id, pos in sites:
            canon = (doc_id, pos) == wit
            verdicts.append((doc_id, pos, len(sites), wit[0], wit[1], canon))
            if not canon:
                removal.setdefault(doc_id, set()).add(pos)
    stats = {}
    for doc_id, toks in toks_by_doc.items():
        ps = sorted(removal.get(doc_id, ()))
        covered = set()
        for p in ps:
            covered.update(range(p, p + n))
        nt = len(toks)
        stats[doc_id] = (
            nt,
            max(0, nt - n + 1),
            len(ps),
            len(covered),
            round(len(covered) / nt, 6) if nt else 0.0,
        )
    return verdicts, stats


CORPUS = [
    # docs 0/1 share the phrase "alpha beta gamma delta" (cross-doc dup)
    (0, "alpha beta gamma delta one two three four five six"),
    (1, "zero alpha beta gamma delta seven eight nine ten"),
    # doc 2 repeats a phrase INSIDE itself (overlapping windows) and
    # also contains doc 0's phrase a third time
    (2, "alpha beta gamma delta alpha beta gamma delta tail"),
    # doc 3 shorter than the window
    (3, "tiny doc"),
    # doc 4 wholly unique
    (4, "completely unrelated words with no duplication at all here"),
    # doc 5 = exact copy of doc 4 (every window repeats)
    (5, "completely unrelated words with no duplication at all here"),
]


@pytest.mark.parametrize("n", [2, 3, SPAN_N])
def test_removal_set_matches_brute_force(spark, n):
    got = {
        (r["doc_id"], r["pos"]): (
            r["n_occ"], r["rep_doc"], r["rep_pos"], r["is_canonical"]
        )
        for r in duplicated_span_removal(_docs(spark, CORPUS), n).collect()
    }
    verdicts, _ = _brute(CORPUS, n)
    want = {(d, p): (no, rd, rp, c) for d, p, no, rd, rp, c in verdicts}
    assert got == want


@pytest.mark.parametrize("n", [2, 3, SPAN_N])
def test_stats_match_brute_force(spark, n):
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_windows"], r["n_rep"], r["cut_tokens"],
            r["cut_frac"],
        )
        for r in substring_dedup_stats(_docs(spark, CORPUS), n).collect()
    }
    _, stats = _brute(CORPUS, n)
    assert got == stats


def test_one_canonical_keeper_per_window(spark):
    occ = duplicated_span_removal(_docs(spark, CORPUS), 4)
    per_gh = occ.groupBy("gh").agg(
        F.sum(F.col("is_canonical").cast("long")).alias("n_canon"),
        F.count(F.lit(1)).alias("n_rows"),
        F.first("n_occ").alias("n_occ"),
    )
    rows = per_gh.collect()
    assert rows, "corpus must contain repeated windows"
    for r in rows:
        assert r["n_canon"] == 1  # exactly one keeper
        assert r["n_rows"] == r["n_occ"] >= 2  # one verdict per occurrence


def test_canonical_witness_is_global_minimum(spark):
    for r in duplicated_span_removal(_docs(spark, CORPUS), 4).collect():
        assert (r["rep_doc"], r["rep_pos"]) <= (r["doc_id"], r["pos"])
        assert r["is_canonical"] == (
            (r["doc_id"], r["pos"]) == (r["rep_doc"], r["rep_pos"])
        )


def test_overlap_never_double_counts(spark):
    # doc 2's internal repeat makes consecutive removal positions with
    # gaps < n; union must stay <= n_tokens
    stats = {
        r["doc_id"]: r
        for r in substring_dedup_stats(_docs(spark, CORPUS), 4).collect()
    }
    assert 0 < stats[2]["cut_tokens"] <= stats[2]["n_tokens"]
    # doc 5 (exact copy, higher id) loses everything: every window is a
    # non-canonical occurrence and the union covers the whole doc
    assert stats[5]["cut_tokens"] == stats[5]["n_tokens"]
    assert stats[5]["cut_frac"] == 1.0
    # its canonical twin doc 4 keeps everything
    assert stats[4]["cut_tokens"] == 0 and stats[4]["n_rep"] == 0
    # short doc: no windows at all
    assert stats[3]["n_windows"] == 0 and stats[3]["cut_tokens"] == 0


def test_closed_form_union_equals_span_merge(spark):
    """The per-doc closed-form Σ min(n, gap) union must equal merging
    maximal spans first — checked on the removal set by brute interval
    merge over every doc of the sf corpus sample."""
    import ngff_zarr_spark.gate as gate

    docs = gate._docs(spark, "/root/testdata/sf0.001")
    n = SPAN_N
    drop = (
        duplicated_span_removal(docs, n)
        .filter(~F.col("is_canonical"))
        .select("doc_id", "pos")
        .collect()
    )
    by_doc = {}
    for r in drop:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    want = {}
    for doc_id, ps in by_doc.items():
        merged = 0
        ps.sort()
        cur_s, cur_e = None, None
        for p in ps:
            if cur_e is None or p > cur_e:
                if cur_e is not None:
                    merged += cur_e - cur_s
                cur_s, cur_e = p, p + n
            else:
                cur_e = p + n
        if cur_e is not None:
            merged += cur_e - cur_s
        want[doc_id] = merged
    got = {
        r["doc_id"]: r["cut_tokens"]
        for r in substring_dedup_stats(docs, n).collect()
        if r["cut_tokens"] > 0
    }
    assert got == {k: v for k, v in want.items() if v > 0}
    assert got, "sf0.001 corpus should contain repeated windows"
