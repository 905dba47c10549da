"""Interleaved-document corpus builder.

Turns the driver's flat ``documents`` parquet into the authoritative
interleaved shape (`BASELINE.json input_hint`)::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

per FIXTURES.md F1: one ``geo`` span (lattice coordinates serialized as
``"x=<x> y=<y>"``), four ``text`` spans (zipf-ish keywords), and
``doc_id % 3`` ``media`` spans (opaque refs).  All values are produced by the
shared exact-arithmetic snippets in :mod:`.derive`, so the DuckDB oracle can
recompute them independently.

Everything here is native Spark SQL expressions — no UDFs, whole-stage
codegen end to end.  At 10^12-doc scale this job is a single narrow
projection (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import derive


def _span_struct(kind: str, text_sql: str, media_sql: str, offset: int) -> str:
    return (
        f"named_struct('kind', '{kind}', 'text', {text_sql}, "
        f"'media_ref', {media_sql}, 'offset', {offset})"
    )


def spans_expr(id_col: str = "sid") -> str:
    """SQL expression producing the spans array for one flat-doc row."""
    geo = _span_struct(
        "geo",
        f"('x=' || CAST({derive.x_sql(id_col)} AS STRING) || ' y=' || CAST({derive.y_sql(id_col)} AS STRING))",
        "''",
        0,
    )
    texts = [
        _span_struct("text", derive.keyword_sql(j, id_col), "''", j + 1)
        for j in range(derive.KW_PER_DOC)
    ]
    base = derive.KW_PER_DOC + 1
    medias = [
        _span_struct(
            "media",
            "''",
            f"('m://' || {derive.doc_key_sql(id_col)} || '/{n}')",
            base + n,
        )
        for n in range(derive.MEDIA_MOD - 1)
    ]
    return (
        f"concat(array({geo}, {', '.join(texts)}), "
        f"slice(array({', '.join(medias)}), 1, {derive.n_media_sql(id_col)}))"
    )


def derive_documents(
    flat: DataFrame, amp: int = derive.AMP, partitions: int | None = None
) -> DataFrame:
    """Flat documents frame (batch OR streaming) -> amplified interleaved
    documents(doc_id, spans).  Pure per-row span construction after the sid
    fan-out, so the same derivation runs unchanged over a Structured
    Streaming source (`span_chunks_stream`)."""
    sids = flat.select(
        F.expr(f"explode(sequence(0, {amp - 1}))").alias("rep"), "doc_id"
    ).select(F.expr(derive.SID_SQL).alias("sid"))
    if not flat.isStreaming:
        n_part = partitions or flat.sparkSession.sparkContext.defaultParallelism * 2
        if amp * flat.rdd.getNumPartitions() >= n_part:
            sids = sids.repartition(n_part)
    return sids.select(
        F.expr(derive.doc_key_sql()).alias("doc_id"),
        F.expr(spans_expr()).alias("spans"),
    )


def build_documents(
    spark: SparkSession, sf_dir: str, amp: int = derive.AMP, partitions: int | None = None
) -> DataFrame:
    """Flat parquet -> amplified interleaved documents(doc_id, spans).

    Each flat row fans out to ``amp`` interleaved docs (sid = doc_id*8192+rep,
    see derive.corpus_sql).  The flat table is tiny (often a single parquet
    file = ONE input partition), so a generate fan-out inherits that single
    partition and serializes the whole downstream pipeline on one core —
    the amplified sid stream is therefore explicitly redistributed before
    the (comparatively expensive) span construction.  A real 100 TB input
    arrives already partitioned and skips this shuffle (the rows shuffled
    here are single int64s — the cheapest possible stage boundary)."""
    return derive_documents(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), amp, partitions
    )
