"""r17: generation-layout in-place compaction of the persisted dedup
index (VERDICT r16 ask #5) plus the ADVICE r16 hardening items on the
same surface.

1. compact_ref_index_inplace folds N batch dirs into one batch under a
   NEW gen=<G+1> directory at the SAME path, committed by the meta's
   gen field — equal row sets, still refreshable, legacy flat layouts
   migrate on first compaction.
2. Concurrent-reader safety: a reader opened BEFORE the compaction is
   pinned on its generation's files and keeps collecting correct rows
   AFTER the compaction commits; vacuum_ref_index is the separate,
   explicitly destructive reclamation step.
3. compact_ref_index (the alias-repoint form) refuses dst == src —
   previously it would rmtree the source before the lazily-read src
   DataFrames executed (ADVICE r16 #1).
4. Writer verbs are single-writer via _writer.lock: concurrent
   admissions fail loudly instead of racing the orphan GC (ADVICE r16
   #3); the lock is released on success and on error.
"""

from __future__ import annotations

import os

import pytest

from ngff_zarr_spark.functions.dedup import (
    compact_ref_index,
    compact_ref_index_inplace,
    incremental_dedup,
    read_ref_index,
    read_ref_index_meta,
    refresh_ref_index,
    vacuum_ref_index,
    write_ref_index,
)


def _mkdocs(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, text string")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


BOILER = "the quick brown fox jumps over the lazy dog again and again"


def _build_three_batch_index(spark, path):
    a = _mkdocs(
        spark,
        [(i, f"unique document number {i} with words {i * 7}") for i in range(12)],
    )
    b = _mkdocs(spark, [(100 + i, BOILER) for i in range(6)])
    c = _mkdocs(
        spark,
        [(200 + i, f"later crawl doc {i} tokens {i * 13}") for i in range(4)],
    )
    write_ref_index(a, path, max_bucket=3)
    refresh_ref_index(spark, path, b)
    refresh_ref_index(spark, path, c)


def test_inplace_compaction_same_path(spark, tmp_path):
    """gen=1 publish + meta commit at the same path: one batch dir per
    table, identical row sets, meta parameters preserved, and the index
    keeps accepting refresh batches afterwards."""
    path = str(tmp_path / "idx")
    _build_three_batch_index(spark, path)
    assert len(os.listdir(os.path.join(path, "wide"))) == 3
    meta_before = dict(read_ref_index_meta(path))
    w0, b0 = read_ref_index(spark, path)
    wcols = sorted(w0.columns)
    bcols = ["doc_id", "band", "band_key"]
    wide_rows, band_rows = _rows(w0, wcols), _rows(b0, bcols)

    compact_ref_index_inplace(spark, path)

    meta = read_ref_index_meta(path)
    assert meta["gen"] == 1
    assert {k: meta[k] for k in meta_before} == meta_before
    root = os.path.join(path, "gen=1")
    assert os.listdir(os.path.join(root, "wide")) == ["batch=203"]
    assert os.listdir(os.path.join(root, "bands")) == ["batch=203"]
    w1, b1 = read_ref_index(spark, path)
    assert _rows(w1, wcols) == wide_rows
    assert _rows(b1, bcols) == band_rows

    # still refreshable under the new generation; a second compaction
    # folds gen=1's two batches into gen=2
    d = _mkdocs(spark, [(300, "yet another later document entirely")])
    refresh_ref_index(spark, path, d)
    assert len(os.listdir(os.path.join(root, "wide"))) == 2
    compact_ref_index_inplace(spark, path)
    assert read_ref_index_meta(path)["gen"] == 2
    w2, _ = read_ref_index(spark, path)
    assert len(_rows(w2, wcols)) == len(wide_rows) + 1


def test_concurrent_reader_survives_compaction(spark, tmp_path):
    """A reader opened at gen=G keeps working after the in-place
    compaction commits gen=G+1 (its plan references G's files, which
    compaction never deletes); vacuum is the separate destructive step
    after which fresh opens still serve the full index."""
    path = str(tmp_path / "idx")
    _build_three_batch_index(spark, path)

    old_wide, old_bands = read_ref_index(spark, path)  # pinned on flat layout
    wcols = sorted(old_wide.columns)
    bcols = ["doc_id", "band", "band_key"]
    expect_w, expect_b = _rows(old_wide, wcols), _rows(old_bands, bcols)

    compact_ref_index_inplace(spark, path)

    # the pre-compaction reader's lazily-planned scans still execute
    # against the superseded files
    assert _rows(old_wide, wcols) == expect_w
    assert _rows(old_bands, bcols) == expect_b
    # and drive the gatekeeper identically to a fresh gen=1 open
    probe = _mkdocs(spark, [(500, BOILER), (501, "novel fresh words here")])
    v_old = set(
        map(
            tuple,
            incremental_dedup(
                probe, None, ref_wide=old_wide, ref_bands=old_bands
            ).collect(),
        )
    )
    new_wide, new_bands = read_ref_index(spark, path)
    v_new = set(
        map(
            tuple,
            incremental_dedup(
                probe, None, ref_wide=new_wide, ref_bands=new_bands
            ).collect(),
        )
    )
    assert v_old == v_new

    vacuum_ref_index(path)
    # legacy flat tables reclaimed; only the live generation remains
    assert not os.path.isdir(os.path.join(path, "wide"))
    assert not os.path.isdir(os.path.join(path, "bands"))
    assert os.path.isdir(os.path.join(path, "gen=1"))
    w, b = read_ref_index(spark, path)
    assert _rows(w, wcols) == expect_w
    assert _rows(b, bcols) == expect_b


def test_reader_collecting_during_publish(spark, tmp_path):
    """Stress the generation pin DURING the publish, not just across
    it: a reader thread repeatedly collects the pre-compaction wide
    table while compact_ref_index_inplace writes gen=1 and commits.
    Every collect must return the full, correct row set — the verb
    never deletes, so a pinned-generation scan can never observe a
    partial index."""
    import threading

    path = str(tmp_path / "idx")
    _build_three_batch_index(spark, path)
    wide, _ = read_ref_index(spark, path)
    wcols = sorted(wide.columns)
    expect = _rows(wide, wcols)

    results, stop = [], threading.Event()

    def reader():
        while not stop.is_set():
            results.append(_rows(wide, wcols) == expect)

    t = threading.Thread(target=reader)
    t.start()
    try:
        compact_ref_index_inplace(spark, path)
    finally:
        stop.set()
        t.join(timeout=120)
    assert results, "reader never completed a collect during the publish"
    assert all(results), f"{results.count(False)}/{len(results)} stale reads"
    assert read_ref_index_meta(path)["gen"] == 1


def test_vacuum_reclaims_old_generations(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build_three_batch_index(spark, path)
    compact_ref_index_inplace(spark, path)
    compact_ref_index_inplace(spark, path)
    assert read_ref_index_meta(path)["gen"] == 2
    assert os.path.isdir(os.path.join(path, "gen=1"))
    vacuum_ref_index(path)
    gens = sorted(n for n in os.listdir(path) if n.startswith("gen="))
    assert gens == ["gen=2"]
    # vacuum on a flat-layout index is a no-op
    flat = str(tmp_path / "flat")
    write_ref_index(
        _mkdocs(spark, [(1, "single doc words")]), flat, max_bucket=3
    )
    vacuum_ref_index(flat)
    assert os.path.isdir(os.path.join(flat, "wide"))


def test_compact_dst_equals_src_guard(spark, tmp_path):
    path = str(tmp_path / "idx")
    _build_three_batch_index(spark, path)
    with pytest.raises(ValueError, match="dst == src"):
        compact_ref_index(spark, path, path)
    # relative alias of the same directory is caught too
    rel = os.path.relpath(path)
    with pytest.raises(ValueError, match="dst == src"):
        compact_ref_index(spark, path, rel)
    # ...and a SYMLINK alias (realpath, not abspath — an abspath-only
    # guard would rmtree the real source through the link)
    link = str(tmp_path / "idx_link")
    os.symlink(path, link)
    with pytest.raises(ValueError, match="dst == src"):
        compact_ref_index(spark, path, link)
    # the guard fired before any destruction
    assert os.path.isdir(os.path.join(path, "wide"))


def test_meta_commit_is_atomic(spark, tmp_path, monkeypatch):
    """The meta write is the commit point of every verb: a crash
    mid-commit must leave the PREVIOUS meta intact and readable (a
    plain truncate-then-write would brick the whole index), and no temp
    file may linger."""
    path = str(tmp_path / "idx")
    _build_three_batch_index(spark, path)
    before = read_ref_index_meta(path)

    real_replace = os.replace

    def crash_replace(src, dst):
        raise OSError("injected crash at the commit point")

    # dedup imports os inside the function, binding this same module —
    # patching the attribute reaches the commit site
    monkeypatch.setattr(os, "replace", crash_replace)
    batch = _mkdocs(spark, [(400, "post crash doc words")])
    with pytest.raises(OSError, match="injected crash"):
        refresh_ref_index(spark, path, batch)
    monkeypatch.setattr(os, "replace", real_replace)

    # previous meta fully intact, no temp droppings, index readable
    assert read_ref_index_meta(path) == before
    assert not [n for n in os.listdir(path) if n.endswith(".tmp")]
    w, _ = read_ref_index(spark, path)
    assert w.count() > 0
    # the crashed batch is an invisible orphan; a retry admits cleanly
    refresh_ref_index(spark, path, batch)
    assert read_ref_index_meta(path)["max_doc_id"] == 400


def test_compact_to_dst_strips_gen_from_meta(spark, tmp_path):
    """The alias-repoint form writes dst in the flat layout, so a gen
    field inherited from a gen-layout src must not leak into dst's
    meta (readers would look under a gen dir that does not exist)."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _build_three_batch_index(spark, src)
    compact_ref_index_inplace(spark, src)
    assert read_ref_index_meta(src)["gen"] == 1
    w_src, _ = read_ref_index(spark, src)
    wcols = sorted(w_src.columns)
    expect = _rows(w_src, wcols)
    compact_ref_index(spark, src, dst)
    assert "gen" not in read_ref_index_meta(dst)
    w_dst, _ = read_ref_index(spark, dst)
    assert _rows(w_dst, wcols) == expect


def test_inplace_compaction_never_reminhashes(spark, tmp_path, monkeypatch):
    """Plan contract: in-place compaction rewrites the STORED rows
    verbatim — corpus text is never re-shingled or re-minhashed (at
    100 TB that difference is a metadata-sized rewrite vs a full
    corpus recompute). Pinned at the source: the signature builder
    raising during compaction proves it is never called."""
    import ngff_zarr_spark.functions.dedup as dd

    path = str(tmp_path / "idx")
    _build_three_batch_index(spark, path)

    def boom(*a, **k):
        raise AssertionError("compaction re-minhashed the corpus")

    monkeypatch.setattr(dd, "minhash_signatures_wide", boom)
    monkeypatch.setattr(dd, "_band_table", boom)
    monkeypatch.setattr(dd, "_capped_ref_bands", boom)
    compact_ref_index_inplace(spark, path)
    assert read_ref_index_meta(path)["gen"] == 1


def test_writer_lock_single_writer(spark, tmp_path):
    """A held lock makes refresh AND in-place compaction fail loudly,
    naming the lock file; both release the lock afterwards (success and
    error paths)."""
    path = str(tmp_path / "idx")
    _build_three_batch_index(spark, path)
    lock = os.path.join(path, "_writer.lock")
    with open(lock, "w") as fh:
        fh.write("{}")
    batch = _mkdocs(spark, [(400, "post lock doc")])
    with pytest.raises(RuntimeError, match="_writer.lock"):
        refresh_ref_index(spark, path, batch)
    with pytest.raises(RuntimeError, match="_writer.lock"):
        compact_ref_index_inplace(spark, path)
    os.unlink(lock)
    refresh_ref_index(spark, path, batch)  # recovers after removal
    assert not os.path.exists(lock)  # released on success
    # released on error too: a stale-high-water batch raises ValueError
    # from inside the locked region
    stale = _mkdocs(spark, [(5, "too low an id")])
    with pytest.raises(ValueError, match="high-water"):
        refresh_ref_index(spark, path, stale)
    assert not os.path.exists(lock)
