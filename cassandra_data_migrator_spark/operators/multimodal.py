"""Multimodal (binary payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, partitioning —
is real and tested; the actual media decode is STUBBED (the container
has no image/audio libraries) behind ``decode_stub``: a clearly-marked
deterministic fake that derives "decoded" properties from the payload
bytes, so the pipeline shape and determinism can be validated now and
the stub swapped for a real decoder (PIL/ffmpeg) without touching any
Spark code.

Runs via ``mapInPandas`` — one Arrow batch in, one out — the pattern
for any bytes→features stage (thumbnailing, frame sampling, feature
extraction) at scale: Python cost amortized per-batch, partition-level
parallelism, no driver involvement.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "byte_len long, sha256 string, format string, width int, height int"
)


def decode_stub(payload: bytes) -> dict:
    """DETERMINISTIC FAKE of a media decode.

    Real implementation would be e.g. ``PIL.Image.open(BytesIO(payload))``;
    not available in this container. The fake derives stable pseudo
    dimensions from the byte length so downstream logic (resize
    bucketing, aspect filtering) is exercisable and oracle-checkable.
    """
    n = len(payload)
    return {
        "format": ["jpeg", "png", "webp"][n % 3],
        "width": 64 + (n % 640),
        "height": 64 + (n % 480),
    }


def extract_media_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, byte_len, sha256, format, width, height)`` via mapInPandas."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = [decode_stub(p) if p is not None else
                     {"format": None, "width": None, "height": None}
                     for p in payloads]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "byte_len": payloads.map(
                    lambda p: len(p) if p is not None else 0),
                "sha256": payloads.map(
                    lambda p: hashlib.sha256(p).hexdigest()
                    if p is not None else None),
                "format": [m["format"] for m in metas],
                "width": pd.array([m["width"] for m in metas], dtype="Int32"),
                "height": pd.array([m["height"] for m in metas], dtype="Int32"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        op, schema=f"{id_col} long, {MEDIA_META_SCHEMA}")
