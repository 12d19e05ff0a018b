"""Shared decoded-pixel checkpoint (r16, VERDICT r15 ask #3).

Every image stage's ``pixels=`` path must produce BYTE-IDENTICAL
results to its decode-inline path — the checkpoint is an execution
optimization, never a semantic fork.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.multimodal import (
    decode_image_pixels,
    document_image_features,
    image_ahash,
    image_near_dup,
    multimodal_dedup_verdict,
    resize_image_pixels,
)
from ngff_zarr_spark.gate import _docs


@pytest.fixture(scope="module")
def small_docs(spark, sf_dir):
    return _docs(spark, sf_dir).where(F.col("doc_id") % 5 == 0).localCheckpoint()


@pytest.fixture(scope="module")
def px(small_docs):
    return decode_image_pixels(small_docs).localCheckpoint()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pixels_checkpoint_shape(small_docs, px):
    rows = px.select("doc_id", "img_h", "img_w", F.size("px").alias("n")).collect()
    assert len(rows) == small_docs.count()
    for r in rows:
        assert r["n"] == r["img_h"] * r["img_w"]


def test_features_paths_identical(small_docs, px):
    assert _rows(document_image_features(small_docs)) == _rows(
        document_image_features(small_docs, pixels=px)
    )


def test_ahash_paths_identical(small_docs, px):
    assert _rows(image_ahash(small_docs)) == _rows(
        image_ahash(small_docs, pixels=px)
    )


def test_resize_paths_identical(small_docs, px):
    assert _rows(resize_image_pixels(small_docs)) == _rows(
        resize_image_pixels(small_docs, pixels=px)
    )


def test_near_dup_and_verdict_paths_identical(small_docs, px):
    assert _rows(image_near_dup(small_docs, max_hamming=1)) == _rows(
        image_near_dup(small_docs, max_hamming=1, pixels=px)
    )
    assert _rows(multimodal_dedup_verdict(small_docs)) == _rows(
        multimodal_dedup_verdict(small_docs, pixels=px)
    )
