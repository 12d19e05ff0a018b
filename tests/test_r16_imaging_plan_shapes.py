"""Plan contracts for the composed imaging pipeline's storage stages
(r16): the 100×-scale claims the digest rows can't show — shard-grid
chunk pruning on the ROI stage, a decode path with no exchange, and
the decode-once multimodal chain running exactly one image decode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark import gate
from ngff_zarr_spark.fixtures import pixel_df


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def n_exchanges(plan: str) -> int:
    return plan.count("Exchange")


@pytest.fixture(scope="module")
def ipipe_store05(spark, tmp_path_factory):
    """The imaging pipeline's sharded 0.5 store, built once: level 0 is
    the IPIPE formula, chunks (4,16,16), 2 chunks/shard per dim."""
    from ngff_zarr_spark.model import NgffImage
    from ngff_zarr_spark.ome_zarr_api import to_multiscales, to_ngff_zarr

    store = str(tmp_path_factory.mktemp("ipipe_plan") / "s.ome.zarr")
    img = NgffImage(
        data=pixel_df(spark, gate.IPIPE).select("t", "c", "z", "y", "x", "v"),
        dims=["z", "y", "x"],
        shape={d: gate.IPIPE.shape[d] for d in ("z", "y", "x")},
        scale=dict(gate.IPIPE_SCALE),
        translation=dict(gate.IPIPE_TRANSLATION),
        name="image",
        dtype="uint16",
    )
    ms = to_multiscales(img, scale_factors=[], chunks=dict(gate.IPIPE_CHUNKS))
    to_ngff_zarr(store, ms, version="0.5", compressor="zstd", chunks_per_shard=2)
    return store


def test_roi_stage_prunes_shard_partitions(spark, ipipe_store05):
    """The pipeline's ROI box plans a strict subset of the SHARD grid
    (sharded arrays prune at shard granularity) — the difference
    between launching every chunk task and only the intersecting ones."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from ngff_zarr_spark.sources.ome_zarr import OmeZarrReader

    opts = {
        "path": ipipe_store05,
        "array_path": "scale0/image",
        "zarr_format": "3",
    }
    full = OmeZarrReader(dict(opts))
    n_full = len(full.partitions())
    # shape (8,35,31), chunks (4,16,16) → chunk grid 2×3×2; shards of
    # 2×2×2 chunks → shard grid 1×2×1 = 2 shard partitions
    assert n_full == 2
    pruned = OmeZarrReader(dict(opts))
    pruned.pushFilters(
        [GreaterThanOrEqual(("y",), 16), LessThan(("y",), 30)]
    )
    assert len(pruned.partitions()) == 1  # only the second y-shard


def test_roi_stage_read_no_exchange(spark, ipipe_store05):
    """The composed chain's stage-4 read is scan + filter — no shuffle."""
    from ngff_zarr_spark.ome_zarr_api import read_image

    cond = None
    for d, (lo, hi) in gate.IPIPE_ROI.items():
        c = (F.col(d) >= lo) & (F.col(d) < hi)
        cond = c if cond is None else (cond & c)
    df = read_image(spark, ipipe_store05, "scale0/image", zarr_format=3).filter(cond)
    plan = plan_of(df)
    assert "BatchScan" in plan
    assert n_exchanges(plan) == 0


def test_conversion_read_path_no_exchange(spark, ipipe_store05, tmp_path):
    """Stage 5's conversion copies each level scan→write: the read side
    of the copy is exchange-free (the only shuffle a store-to-store
    conversion pays is the writer's chunk-key pack)."""
    from ngff_zarr_spark.ome_zarr_api import from_ngff_zarr

    ms = from_ngff_zarr(spark, ipipe_store05)
    for img in ms.images:
        plan = plan_of(img.data)
        assert "BatchScan" in plan
        assert n_exchanges(plan) == 0


def test_multimodal_pipeline_single_decode(spark, sf_dir, monkeypatch):
    """The decode-once contract, counted at the source: the composed
    multimodal gate synthesizes/encodes each document's PNG payload in
    exactly ONE attach_images pass (stages 3–5 consume the pixel
    checkpoint; a re-decode would need a second attach)."""
    import ngff_zarr_spark.functions.multimodal as mm

    calls = []
    real = mm.attach_images

    def counting_attach(docs):
        calls.append(1)
        return real(docs)

    monkeypatch.setattr(mm, "attach_images", counting_attach)
    rows = gate.q_multimodal_pipeline_battery(spark, sf_dir).collect()
    assert len(rows) == 5
    # one attach for decode_image_pixels; audio/video payloads attach
    # separately but IMAGES attach exactly once
    assert sum(calls) == 1, f"attach_images ran {sum(calls)} times"
