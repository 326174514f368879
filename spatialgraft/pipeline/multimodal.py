"""Multimodal column plumbing: media spans as opaque binary + typed
metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (hash-derived pixel statistics) behind
`real_decode=False`; everything around it — schema, batching, partition
shape, UDF signature — is the real Spark plumbing a codec drop-in would
use.  The fake features are pure integer arithmetic of doc_key, so the
op still oracles exactly in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_OUT_SCHEMA = ("doc_key bigint, media_ref string, width int, height int, "
               "mean_px double, n_frames int")


def _fake_decode(doc_key: np.ndarray):
    """Deterministic stand-in for a codec: features from doc_key."""
    width = (16 + doc_key % 16).astype(np.int32)
    height = (16 + (doc_key * 7) % 16).astype(np.int32)
    mean_px = ((doc_key * 2654435761) % 256).astype(np.float64)
    n_frames = (1 + doc_key % 4).astype(np.int32)
    return width, height, mean_px, n_frames


def decode_features(docs_with_media: DataFrame,
                    real_decode: bool = False) -> DataFrame:
    """(doc_key, media_ref, width, height, mean_px, n_frames).

    Input needs doc_key + a media_ref column (extracted from the media
    span).  Batched per Arrow chunk; a real implementation would fetch
    `media_ref` bytes and decode inside the same iterator."""

    def fn(batches):
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "no image/audio codecs in this environment; "
                    "plug a decoder here (bytes <- media_ref)")
            k = pdf["doc_key"].to_numpy(np.int64)
            w, h, m, f = _fake_decode(k)
            yield pd.DataFrame({
                "doc_key": k, "media_ref": pdf["media_ref"],
                "width": w, "height": h, "mean_px": m, "n_frames": f})

    return (docs_with_media.select("doc_key", "media_ref")
            .mapInPandas(fn, _OUT_SCHEMA))


def media_refs(points: DataFrame) -> DataFrame:
    """Pull the media span's ref out of the spans column (Arrow path in
    extract.py keeps spans opaque; here a JVM expression suffices)."""
    return points.selectExpr(
        "doc_key",
        "filter(spans, s -> s.kind = 'media')[0].media_ref AS media_ref")
