"""VERDICT r13 ask #6: no explicit persist()/cache() may outlive its
query. Every operator that pins an intermediate for plan-dedup must
release it before returning (functions/_scope.py checkpointed/handoff,
or an eager try/finally like q_dedup_skew_cluster).

The test patches DataFrame.persist/cache to record every explicitly
pinned frame, runs each persist-using gate end-to-end (full consume,
like the driver), and asserts every recorded frame's storage level is
back to NONE. localCheckpoint leaves are intentionally NOT counted:
their blocks are ContextCleaner-managed (released when the plan is
garbage-collected), which is the entire point of the sweep.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
import pytest
from pyspark.sql import DataFrame

from ngff_zarr_spark import gate

# every gate whose call graph reaches a .persist()/.cache() site
# (grep -rn "\.persist()\|\.cache()" ngff_zarr_spark/functions ngff_zarr_spark/gate.py)
PERSIST_GATES = [
    "dedup_minhash",          # dedup._capped_band_pairs bx + minhash_candidates wide
    "dedup_ngram_jaccard",    # dedup.ngram_jaccard_pairs capped-sh cache
    # dedup_shingle_frac left in r19: its df ride a count window now —
    # one shingle pass, nothing to cache
    "multimodal_image_dedup", # multimodal.image_near_dup ah
    "graph_pagerank",         # graph.pagerank ed
    "graph_triangles",        # graph.triangle_stats canon/oriented
    "text_lm_perplexity",     # lm.lm_perplexity ref_grams
    "corpus_dsir_weights",    # lm.dsir_importance dg
    "text_bpe_merges",        # bpe._learn words generations
    "events_percentiles_bucketed",  # events descent stats/hist/rows
    "ir_rrf_fusion",          # gate tf = _shingle_tf().persist()
    # r19: call-scoped tf/weight caches inside the IR operators (the
    # four-reference tf subtree planned once — see functions/ir.py)
    "ir_bm25_topk",
    "ir_bm25_query",
    "ir_tfidf_topk",
    "ir_eval_metrics",        # reaches bm25_topk's scoped tf persist
    # r19: quantizer/list caches (semantic_dedup bal/e).
    # multimodal_dedup_verdict left this list in r19: its rep tests
    # became whole-partition windows, so each signature table has ONE
    # consumer and the standalone persists disappeared with the
    # double-decode they guarded against.
    "semantic_dedup",
    # corpus_filter_pipeline also left in r19 — same window rewrite,
    # the keyed (doc_id, lang, md5) cache had one consumer left.
]


@pytest.fixture()
def persist_tracker(monkeypatch):
    # patch the CONCRETE class — in PySpark 4 pyspark.sql.DataFrame is
    # the abstract base and the classic engine overrides persist/cache
    from pyspark.sql.classic.dataframe import DataFrame

    tracked: list[DataFrame] = []
    orig_persist = DataFrame.persist
    orig_cache = DataFrame.cache

    def persist(self, *a, **k):
        out = orig_persist(self, *a, **k)
        tracked.append(out)
        return out

    def cache(self):
        out = orig_cache(self)
        tracked.append(out)
        return out

    monkeypatch.setattr(DataFrame, "persist", persist)
    monkeypatch.setattr(DataFrame, "cache", cache)
    return tracked


def _is_pinned(df: DataFrame) -> bool:
    sl = df.storageLevel
    return bool(sl.useMemory or sl.useDisk or sl.useOffHeap)


@pytest.mark.parametrize("name", PERSIST_GATES)
def test_no_persist_outlives_gate(spark, sf_dir, persist_tracker, name):
    q = gate.queries()[name]
    result = q(spark, sf_dir)
    result.collect()  # full consume, like the driver
    assert persist_tracker, (
        f"{name} no longer persists anything — drop it from PERSIST_GATES "
        "so the list stays an exact inventory"
    )
    leaked = [i for i, df in enumerate(persist_tracker) if _is_pinned(df)]
    assert not leaked, (
        f"{name}: {len(leaked)}/{len(persist_tracker)} explicitly persisted "
        f"frames still pinned after the query returned (indices {leaked})"
    )


def test_inventory_is_complete():
    """Fail when a NEW persist site appears outside the audited set, so
    the next operator that pins a cache must either scope it or be added
    to PERSIST_GATES with a release path."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "ngff_zarr_spark"
    hits = []
    for p in root.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if re.search(r"\.(persist|cache)\(\)", line) and "unpersist" not in line:
                hits.append(f"{p.relative_to(root)}:{i}")
    known = {
        "gate.py",            # q_dedup_skew_cluster (try/finally) + q_ir_rrf_fusion (checkpointed)
        "functions/dedup.py",
        "functions/multimodal.py",
        "functions/bpe.py",
        "functions/graph.py",
        "functions/lm.py",
        "functions/events.py",
        "functions/ir.py",    # r19: call-scoped tf/weight caches
        "functions/similarity.py",  # r19: semantic_dedup bal/e caches
    }
    unknown = sorted({h.rsplit(":", 1)[0] for h in hits} - known)
    assert not unknown, (
        f"new persist sites outside the audited files: {unknown} — scope "
        "them (functions/_scope.py) and extend PERSIST_GATES"
    )
