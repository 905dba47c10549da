"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so one executor
core streams batches without materializing a partition.  The actual codec
step is STUBBED (``decode_stub``) because no image/audio libraries exist in
this container — the Spark-side contract (schemas, batch iteration,
partitioning, deterministic fake features) is real and tested; swapping the
stub for PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_stub(refs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic fake decoder: (width, height, 8-dim feature) derived
    from a stable hash of the media_ref.  Replace with a real codec
    (PIL / ffmpeg / torchaudio) outside this sandbox.

    Raises ``NotImplementedError`` if asked for real pixel decode.
    """
    # stable FNV-1a (python's builtin hash() is per-process salted — never
    # use it executor-side)
    from .dedup import _token_hash

    h = (_token_hash(refs).astype(np.int64) & ((1 << 31) - 1)).astype(np.int64)
    width = (64 + h % 1024).astype(np.int32)
    height = (64 + (h // 1024) % 1024).astype(np.int32)
    feats = ((h[:, None] >> np.arange(8)[None, :]) % 251).astype(np.float32) / 251.0
    return width, height, feats


def extract_media_features(docs_with_spans: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> one feature row per media span.

    Span explosion is native SQL; only the decode crosses into Arrow.
    Output partitioning follows the input (no shuffle).
    """
    media = docs_with_spans.select(
        "doc_id",
        F.explode(F.expr("filter(spans, s -> s.kind = 'media')")).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            refs = b["media_ref"].to_numpy(dtype=object)
            width, height, feats = decode_stub(refs)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_ref": b["media_ref"],
                    "media_kind": "image",
                    "width": width,
                    "height": height,
                    "n_bytes": (width.astype(np.int64) * height * 3),
                    "feature": list(feats.reshape(len(b), -1)),
                }
            )

    return media.mapInPandas(_iter, MEDIA_FEATURE_SCHEMA)
