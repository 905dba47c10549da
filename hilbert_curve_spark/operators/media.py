"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque references / ``binary`` columns with typed
metadata; decode / feature-extraction runs as Arrow-batched ``mapInPandas``
so one executor core streams batches without materializing a partition.
The actual codec step is STUBBED (``decode_stub``) because no image/audio
libraries exist in this container — the Spark-side contract (schemas, batch
iteration, partitioning, vectorized numpy feature math) is real and tested;
swapping the stub for PIL/torchaudio is a one-function change.

The stub is *deterministic pure int64 arithmetic* keyed on the numeric
payload embedded in ``media_ref`` (``m://doc<sid>/<n>``), so the DuckDB
correctness oracle can recompute the exact same widths/heights/features in
SQL — the whole media pipeline is driver-checkable end to end, not just
"runs without crashing".
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

# LCG mixing constants (same family as sources/derive.py streams).  The
# key is reduced mod _MIX_MOD BEFORE the multiply, so the largest
# intermediate is (_MIX_MOD-1) * _MIX_MULT < 2^52 for ANY sid < 2^59 —
# numpy int64 never wraps and the identical BIGINT expression in the
# DuckDB oracles never overflows (an unreduced (sid*8+idx)*_MIX_MULT
# would pass 2^63 at sid ~ 4.3e8, i.e. a flat corpus of only ~53k docs).
_MIX_MULT = 2654435761
_MIX_ADD = 1013904223
_MIX_MOD = 1_000_003
FEATURE_DIM = 8


def decode_stub(keys: np.ndarray, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic fake decoder: (width, height, 8-dim feature) from the
    numeric payload of the media ref.  Replace with a real codec
    (PIL / ffmpeg / torchaudio) outside this sandbox.

    Raises ``NotImplementedError`` if asked for real pixel decode.
    """
    h = (((keys * FEATURE_DIM + idx) % _MIX_MOD) * _MIX_MULT + _MIX_ADD) % _MIX_MOD
    width = (64 + h % 1024).astype(np.int32)
    height = (64 + (h // 1024) % 1024).astype(np.int32)
    feats = ((h[:, None] >> np.arange(FEATURE_DIM)[None, :]) % 251).astype(np.float32) / 251.0
    return width, height, feats


def decode_real(payload: bytes) -> np.ndarray:
    """Real pixel decode: PNG/JPEG bytes -> float32 HxWx3 array in [0,1].

    Import-gated on PIL (absent in this sandbox, so the gate raises the
    honest ``NotImplementedError`` here); when PIL is installed the full
    path — binary column -> Arrow batch -> decode -> feature row — runs
    and is covered by tests/test_media_real.py (skip-marked on the
    import).  ffmpeg/torchaudio analogues slot in the same way."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - PIL absent in sandbox
        raise NotImplementedError(
            "media codec libraries (PIL) are not available in this sandbox"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_media_features_real(media_payloads: DataFrame) -> DataFrame:
    """(doc_id, media_ref, payload:binary) -> one REAL feature row per
    media object: decoded dimensions + per-channel means and a 2x2-grid
    luminance profile (FEATURE_DIM-sized, same shape as the stub path so
    downstream dedup/ANN operators are codec-agnostic).

    The Spark plumbing is the production shape: Arrow-batched
    ``mapInPandas`` over the binary column (decode is per-object by
    nature; the batch loop stays inside one Python invocation per Arrow
    batch, never per-row UDF calls).  Raises ``NotImplementedError`` via
    :func:`decode_real` where no codec library is installed."""

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            widths, heights, nbytes, feats = [], [], [], []
            for payload in b["payload"]:
                arr = decode_real(bytes(payload))
                h, w = arr.shape[0], arr.shape[1]
                widths.append(w)
                heights.append(h)
                nbytes.append(len(payload))
                lum = arr.mean(axis=2)
                h2, w2 = max(h // 2, 1), max(w // 2, 1)
                quad = [
                    float(lum[:h2, :w2].mean()),
                    float(lum[:h2, w2:].mean()) if w > 1 else 0.0,
                    float(lum[h2:, :w2].mean()) if h > 1 else 0.0,
                    float(lum[h2:, w2:].mean()) if h > 1 and w > 1 else 0.0,
                ]
                chan = [float(arr[:, :, c].mean()) for c in range(3)]
                feats.append(
                    np.asarray(chan + quad + [float(lum.std())], dtype=np.float32)
                )
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_ref": b["media_ref"],
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "n_bytes": pd.array(nbytes, dtype="int64"),
                    "feature": feats,
                }
            )

    return media_payloads.select("doc_id", "media_ref", "payload").mapInPandas(
        _iter, REAL_FEATURE_SCHEMA
    )


def extract_media_features(docs_with_spans: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> one feature row per media span.

    Span explosion and ref parsing are native SQL; only the decode crosses
    into Arrow (vectorized numpy per batch — no per-row Python).  Output
    partitioning follows the input (no shuffle).
    """
    media = (
        docs_with_spans.select(
            "doc_id",
            F.explode(F.expr("filter(spans, s -> s.kind = 'media')")).alias("s"),
        )
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
        # m://doc<10-digit sid>/<n> — positions fixed by the corpus contract
        .withColumn("media_key", F.expr("CAST(substring(media_ref, 8, 10) AS BIGINT)"))
        .withColumn("media_idx", F.expr("CAST(substring(media_ref, 19) AS BIGINT)"))
    )

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            keys = b["media_key"].to_numpy(np.int64)
            idx = b["media_idx"].to_numpy(np.int64)
            width, height, feats = decode_stub(keys, idx)
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


def media_features_checked(docs_with_spans: DataFrame) -> DataFrame:
    """Driver-checkable projection of :func:`extract_media_features`: the
    ``feature`` array explodes to ``(dim, feat_u8)`` integer rows (the exact
    251-denominator numerators), so every cell is hashable and the DuckDB
    oracle can recompute it with pure int64 arithmetic.  The float array
    stays the programmatic API; this view exists for the correctness gate.
    """
    feats = extract_media_features(docs_with_spans)
    return feats.select(
        "doc_id",
        "media_ref",
        "media_kind",
        "width",
        "height",
        "n_bytes",
        F.posexplode("feature").alias("dim", "val"),
    ).select(
        "doc_id",
        "media_ref",
        "media_kind",
        "width",
        "height",
        "n_bytes",
        "dim",
        F.expr("CAST(round(val * 251) AS INT)").alias("feat_u8"),
    )


def resize_media(feats: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize *plan* over decoded media: output dims +
    byte size for a longest-side = ``max_side`` downscale.  A codegen
    projection on :func:`extract_media_features` output — the pixel
    resample itself belongs in the (stubbed) codec; a real deployment runs
    it in the same Arrow batch as the decode.  All dims < 2^21 so the
    double division inside FLOOR is exact; FLOOR-then-CAST because DuckDB
    CAST(double AS INT) rounds while Spark truncates."""
    out_w = f"greatest(1, CAST(FLOOR(width * {max_side} / greatest(width, height)) AS INT))"
    out_h = f"greatest(1, CAST(FLOOR(height * {max_side} / greatest(width, height)) AS INT))"
    return feats.select(
        "doc_id",
        "media_ref",
        "width",
        "height",
        F.expr(out_w).alias("out_w"),
        F.expr(out_h).alias("out_h"),
        F.expr(f"CAST({out_w} AS BIGINT) * {out_h} * 3").alias("out_bytes"),
    )


def sample_frames(feats: DataFrame, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video media: one row per sampled frame index,
    every ``ceil(n_frames / max_frames)``-th frame.  The synthetic frame
    count derives from the decoded dims (the stub codec's metadata
    contract); the explode is a native ``sequence`` — frame fan-out never
    touches Python, and at scale it rides the scan with no shuffle."""
    nf = "(8 + ((width - 64) + (height - 64)) % 120)"
    # true ceil(nf / max_frames) = floor((nf - 1) / max_frames) + 1 for nf >= 1:
    # guarantees <= max_frames sampled frames and matches the stated contract
    step = f"(1 + CAST(FLOOR(({nf} - 1) / {float(max_frames)}) AS INT))"
    return feats.select(
        "doc_id",
        "media_ref",
        F.expr(nf).alias("n_frames"),
        F.explode(F.expr(f"sequence(0, {nf} - 1, {step})")).alias("frame_idx"),
    )


def _media_dims_sql(table: str) -> str:
    """DuckDB CTE body: (doc_id, media_ref, h, width, height) replaying the
    stub decode arithmetic from the corpus sid stream — the single source
    of that arithmetic for ALL media oracles (features/resize/frames), so
    a stub change cannot desynchronize them."""
    from ..sources import derive

    corpus = derive.corpus_sql(table)
    doc_key = derive.doc_key_sql()
    return f"""
  SELECT doc_id, media_ref, h,
         CAST(64 + h % 1024 AS INT) AS width,
         CAST(64 + (h // 1024) % 1024 AS INT) AS height
  FROM (
    SELECT {doc_key} AS doc_id,
           ('m://' || {doc_key} || '/' || CAST(n AS STRING)) AS media_ref,
           (((sid * {FEATURE_DIM} + n) % {_MIX_MOD}) * {_MIX_MULT} + {_MIX_ADD}) % {_MIX_MOD} AS h
    FROM {corpus}, (SELECT unnest(range(0, {derive.MEDIA_MOD - 1})) AS n)
    WHERE n < sid % {derive.MEDIA_MOD}
  )"""


def resize_media_oracle(table: str = "documents", max_side: int = 256) -> str:
    out_w = f"greatest(1, CAST(FLOOR(width * {max_side} / greatest(width, height)) AS INT))"
    out_h = f"greatest(1, CAST(FLOOR(height * {max_side} / greatest(width, height)) AS INT))"
    return (
        f"WITH dims AS ({_media_dims_sql(table)}) "
        f"SELECT doc_id, media_ref, width, height, {out_w} AS out_w, {out_h} AS out_h, "
        f"CAST({out_w} AS BIGINT) * {out_h} * 3 AS out_bytes FROM dims"
    )


def sample_frames_oracle(table: str = "documents", max_frames: int = 8) -> str:
    nf = "(8 + ((width - 64) + (height - 64)) % 120)"
    # true ceil(nf / max_frames) = floor((nf - 1) / max_frames) + 1 for nf >= 1:
    # guarantees <= max_frames sampled frames and matches the stated contract
    step = f"(1 + CAST(FLOOR(({nf} - 1) / {float(max_frames)}) AS INT))"
    return (
        f"WITH dims AS ({_media_dims_sql(table)}) "
        f"SELECT doc_id, media_ref, {nf} AS n_frames, "
        f"CAST(unnest(range(0, {nf}, {step})) AS INT) AS frame_idx FROM dims"
    )


#: perceptual-fingerprint quantization: content keys collapse to 12 bits so
#: near-identical decoded content buckets together (the pHash-style knob a
#: real pipeline turns; the stub's bijective content hash has no raw-key
#: collisions over the structured sid lattice, so dedup happens at the
#: quantized granularity — exactly how perceptual dedup works in practice).
CONTENT_FP_MOD = 4096


def media_dedup(docs_with_spans: DataFrame) -> DataFrame:
    """Span-level media dedup across documents, keyed on DECODED content:
    every media span is decoded through the real Arrow ``mapInPandas`` path
    (:func:`extract_media_features`), its content fingerprint is the
    12-bit quantization of the decoded signal, and fingerprints held by
    two or more spans are reported with a deterministic canonical owner —
    ``(content_fp, n_copies, n_docs, canonical_doc, canonical_ref)``.

    This is the multimodal arm of the dedup family (`operators/dedup.py`
    handles text): interleaved corpora reuse images across documents, and
    training pipelines keep ONE copy (the canonical ``min(doc_id,
    media_ref)`` pair) plus a reference count.  The stub decoder's
    width/height are an exact affine encoding of its content hash
    (``h = (width-64) + (height-64)*1024`` — `decode_stub`), which is what
    makes the op driver-checkable end to end THROUGH the Arrow batch path.

    100 TB shape: the only Python is the vectorized decode the pipeline
    already pays for feature extraction; after it, one hash aggregation on
    the fingerprint with map-side combine (``min(struct)`` canonical — no
    window, no self-join).  Fingerprint cardinality is bounded
    (``CONTENT_FP_MOD``), so the post-agg frame is tiny; the reference
    round-trips payloads byte-identically
    (`Scheme/RSKQ/RSKQ_Biginteger.java:120-161`) and never dedups them —
    this op is the Spark-side curation step its corpus shape calls for."""
    feats = extract_media_features(docs_with_spans)
    fp = F.expr(
        f"CAST(((width - 64) + CAST(height - 64 AS BIGINT) * 1024) "
        f"% {CONTENT_FP_MOD} AS BIGINT)"
    )
    return (
        feats.select("doc_id", "media_ref", fp.alias("content_fp"))
        .groupBy("content_fp")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min(F.struct("doc_id", "media_ref")).alias("c"),
        )
        .filter(F.col("n_copies") >= 2)
        .select(
            "content_fp",
            "n_copies",
            "n_docs",
            F.col("c.doc_id").alias("canonical_doc"),
            F.col("c.media_ref").alias("canonical_ref"),
        )
    )


def media_dedup_oracle(table: str = "documents") -> str:
    """DuckDB oracle: replay the stub content hash from the shared media-dims
    CTE, quantize identically, and pick the canonical pair by the same
    (doc_id, media_ref) total order (unique per span, so deterministic)."""
    return f"""
WITH m AS ({_media_dims_sql(table)}),
fp AS (SELECT doc_id, media_ref, CAST(h % {CONTENT_FP_MOD} AS BIGINT) AS content_fp FROM m),
agg AS (SELECT content_fp, CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM fp GROUP BY content_fp),
canon AS (SELECT content_fp, doc_id, media_ref,
                 ROW_NUMBER() OVER (PARTITION BY content_fp
                                    ORDER BY doc_id, media_ref) AS rn
          FROM fp)
SELECT a.content_fp, a.n_copies, a.n_docs,
       c.doc_id AS canonical_doc, c.media_ref AS canonical_ref
FROM agg a JOIN canon c ON a.content_fp = c.content_fp AND c.rn = 1
WHERE a.n_copies >= 2
"""


def media_features_oracle(table: str = "documents") -> str:
    """DuckDB oracle for :func:`media_features_checked`: the shared
    media-dims CTE (single-sourced stub arithmetic) crossed with the
    feature dimensions."""
    return f"""
WITH m AS ({_media_dims_sql(table)}),
dims AS (SELECT unnest(range(0, {FEATURE_DIM})) AS dim)
SELECT m.doc_id, m.media_ref, 'image' AS media_kind,
       m.width, m.height,
       CAST(m.width AS BIGINT) * m.height * 3 AS n_bytes,
       CAST(d.dim AS INT) AS dim,
       CAST((h >> d.dim) % 251 AS INT) AS feat_u8
FROM m, dims d
"""
