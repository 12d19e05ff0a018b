"""Property-based persisted-index lifecycle pin (r17): ANY interleaving
of {refresh, in-place compaction, vacuum} over random (possibly empty,
boilerplate-heavy) monotonic batches must leave the index equal to a
from-scratch build over the concatenated corpus — the refresh ≡ rebuild
theorem extended from fixed sequences (tests/test_r15_ref_index.py)
to generated op sequences crossing generation boundaries, with the
bucket cap engaged (duplicate texts flood shared buckets). Layout
invariants checked after every sequence: exactly the live generation's
directories remain after a vacuum, and the meta's generation count
equals the number of compactions run.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from ngff_zarr_spark.functions.dedup import (
    compact_ref_index_inplace,
    read_ref_index,
    read_ref_index_meta,
    refresh_ref_index,
    vacuum_ref_index,
    write_ref_index,
)

# small index parameters keep each Spark job light; the cap is tiny so
# the boilerplate texts below overflow buckets and exercise the
# witness-cap path of refresh ≡ rebuild
NP, BS, CAP = 4, 2, 2

_TEXT_POOL = [
    "the quick brown fox jumps over the lazy dog",  # boilerplate flood
    "colorless green ideas sleep furiously tonight",
]


def _texts(ids):
    return [
        (
            i,
            _TEXT_POOL[i % 3]
            if i % 3 < 2
            else f"unique document {i} carrying words {i * 7} and {i * 13}",
        )
        for i in ids
    ]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


_op = st.one_of(
    st.tuples(st.just("refresh"), st.integers(min_value=0, max_value=5)),
    st.just(("compact",)),
    st.just(("vacuum",)),
)


@settings(max_examples=6, deadline=None)
@given(
    base_n=st.integers(min_value=1, max_value=5),
    ops=st.lists(_op, min_size=1, max_size=5),
)
def test_lifecycle_equals_rebuild(spark, base_n, ops):
    root = tempfile.mkdtemp(prefix="idx_prop_")
    path = os.path.join(root, "idx")
    try:
        next_id = 0
        all_ids = list(range(base_n))
        next_id = base_n
        write_ref_index(
            _mk(spark, _texts(all_ids)), path,
            num_perm=NP, band_size=BS, max_bucket=CAP,
        )
        n_compactions = 0
        for op in ops:
            if op[0] == "refresh":
                ids = list(range(next_id, next_id + op[1]))
                next_id += op[1]
                refresh_ref_index(spark, path, _mk(spark, _texts(ids)))
                # empty batches commit nothing; non-empty extend corpus
                all_ids.extend(ids)
            elif op[0] == "compact":
                compact_ref_index_inplace(spark, path)
                n_compactions += 1
            else:
                vacuum_ref_index(path)

        meta = read_ref_index_meta(path)
        assert meta.get("gen", 0) == n_compactions
        # final vacuum, then layout invariant: only the live generation
        # (or only the flat tables, if never compacted) remains
        vacuum_ref_index(path)
        entries = sorted(
            n for n in os.listdir(path) if os.path.isdir(os.path.join(path, n))
        )
        if n_compactions:
            assert entries == [f"gen={n_compactions}"]
        else:
            assert entries == ["bands", "wide"]

        # the index ≡ a from-scratch build over the concatenated corpus
        rebuild = os.path.join(root, "rebuild")
        write_ref_index(
            _mk(spark, _texts(all_ids)), rebuild,
            num_perm=NP, band_size=BS, max_bucket=CAP,
        )
        w_got, b_got = read_ref_index(spark, path)
        w_exp, b_exp = read_ref_index(spark, rebuild)
        assert _rows(w_got) == _rows(w_exp)
        assert _rows(b_got) == _rows(b_exp)
    finally:
        shutil.rmtree(root, ignore_errors=True)
