"""Multimodal columns: documents ⇄ images (the LLM-pipeline brief).

Images ride as opaque ``binary`` columns with typed metadata; decode and
feature extraction run as Arrow-batched UDFs over ``mapInPandas`` so
the bytes never visit the driver. The decoder here is the engine's own
pure-Python PNG codec (ingest/png.py) — a REAL decode of real bytes;
heavier codecs (JPEG/video frames) follow the identical plumbing with
the external library imported inside the UDF (not available in this
image).

The attach step synthesizes a deterministic per-document PNG (size and
pixels derived from doc_id), standing in for a crawl's image payloads:
the DuckDB oracle recomputes the expected features from the same
integer formula with pure SQL, so the whole decode→feature path is
hash-checked end to end.

Scale posture: attach/decode/features are all per-row map work — no
shuffle anywhere until a caller aggregates; batch size is bounded by
Arrow batches, and the binary column participates in column pruning
(drop it before any wide join).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic fake-image parameters (shared with the oracle SQL)
W_BASE, W_MOD = 8, 5   # width  = 8 + doc_id % 5
H_BASE, H_MOD = 6, 3   # height = 6 + doc_id % 3
PIX_A, PIX_Y, PIX_X, PIX_MOD = 31, 7, 3, 256


def synth_image_bytes(doc_id: int) -> bytes:
    """One document's PNG payload: pixel (y, x) = (doc_id*31 + y*7 +
    x*3) mod 256, uint8 grayscale."""
    from ..ingest.png import png_encode

    w = W_BASE + doc_id % W_MOD
    h = H_BASE + doc_id % H_MOD
    yi, xi = np.indices((h, w))
    arr = ((doc_id * PIX_A + yi * PIX_Y + xi * PIX_X) % PIX_MOD).astype("uint8")
    return png_encode(arr)


def attach_images(docs: DataFrame) -> DataFrame:
    """documents + a binary ``image`` column (Arrow-batched generation)."""
    from .text import spread

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "image": [synth_image_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return spread(docs).select("doc_id").mapInPandas(gen, "doc_id long, image binary")


def image_features(df: DataFrame) -> DataFrame:
    """Decode the binary image column and emit per-image features:
    (doc_id, img_h, img_w, n_px, px_mean). Real PNG decode on executors;
    the mean is rounded to 6 decimals for cross-engine hash stability."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..ingest.png import png_decode

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["image"]):
                arr = png_decode(bytes(blob))
                rows.append(
                    (
                        int(doc_id),
                        int(arr.shape[0]),
                        int(arr.shape[1]),
                        int(arr.size),
                        round(float(arr.sum()) / arr.size, 6),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "img_h", "img_w", "n_px", "px_mean"]
            )

    return df.mapInPandas(
        feats, "doc_id long, img_h long, img_w long, n_px long, px_mean double"
    )


def document_image_features(docs: DataFrame) -> DataFrame:
    """The full multimodal binding: attach image payloads, decode to
    features, join back to document text statistics — one row per
    document with both modalities' signals."""
    imgs = image_features(attach_images(docs))
    text_stats = docs.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    return (
        text_stats.join(imgs, "doc_id")
        .select("doc_id", "n_chars", "img_h", "img_w", "n_px", "px_mean")
    )
