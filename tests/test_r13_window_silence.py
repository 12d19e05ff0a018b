"""r13 (VERDICT r12 ask #7): the bounded single-group windows
(seeded_shuffle's bucket-offset prefix sum, BPE's vocab token-id
assignment, series/DICOM z-ordering) must carry a NON-EMPTY partition
spec — a non-foldable constant-zero — so WindowExec's "No Partition
Defined" warning stays out of the logs and any future occurrence is a
real unpartitioned-window finding. The optimizer folds ``x*0`` (which
would silently resurface the warning) but not ``x-x``; this pins the
surviving partition spec in the OPTIMIZED plan."""

from __future__ import annotations

import contextlib
import io
import re


def _window_specs(df) -> list[str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return re.findall(r"windowspecdefinition\([^)]*", buf.getvalue())


def _assert_partitioned(specs):
    assert specs, "expected a Window node in the plan"
    for spec in specs:
        # an empty partition spec puts the ORDER BY column first:
        # windowspecdefinition(col#123L ASC NULLS FIRST, ...)
        assert not re.match(
            r"windowspecdefinition\(\w+#\d+L? ASC", spec
        ), f"unpartitioned window survived optimization: {spec}"


def test_seeded_shuffle_offsets_window_is_partitioned(spark, sf_dir):
    from ngff_zarr_spark import gate

    df = gate.queries()["corpus_seeded_shuffle"](spark, sf_dir)
    _assert_partitioned(_window_specs(df))


def test_bpe_token_id_window_is_partitioned(spark, sf_dir):
    from ngff_zarr_spark import gate

    df = gate.queries()["text_bpe_encode"](spark, sf_dir)
    _assert_partitioned(_window_specs(df))
