"""Encode stage: interleaved documents -> ``doc_geo``.

Parses the geo span back to lattice ``(x, y)``, extracts the keyword array
from text spans, and computes the Hilbert index with the Arrow-batched
kernel.  Output (FIXTURES.md F2, mirroring the reference's working record
`Experiment/Comparison/FixRangeCompareToConstructionOne.java:175-187`)::

    doc_geo(doc_id:string, x:long, y:long, hilbert:long, cell:long,
            keywords:array<string>)

``cell`` is a coarse spatial bucket (``hilbert >> 2*cell_shift``) used as the
co-location key for cell-bucketed joins and hot-cell salting.  Span parsing
and keyword extraction are native Column expressions (codegen); only the
Hilbert transform crosses into Arrow.  The spans column itself is never
rewritten — derived facts join back by doc_id (span-sequence invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.udfs import hilbert_encode_udf


def encode_documents(docs: DataFrame, config: EngineConfig = DEFAULT, keep_spans: bool = False) -> DataFrame:
    geo_text = F.expr("filter(spans, s -> s.kind = 'geo')[0].text")
    x = F.regexp_extract(geo_text, r"x=(\d+)", 1).cast("long").alias("x")
    y = F.regexp_extract(geo_text, r"y=(\d+)", 1).cast("long").alias("y")
    keywords = F.expr("transform(filter(spans, s -> s.kind = 'text'), s -> s.text)").alias("keywords")
    cols = [F.col("doc_id"), x, y, keywords]
    if keep_spans:
        cols.append(F.col("spans"))
    out = docs.select(*cols)
    h = hilbert_encode_udf(config.order)(F.col("x"), F.col("y"))
    out = out.withColumn("hilbert", h)
    out = out.withColumn("cell", F.shiftright("hilbert", 2 * config.cell_shift))
    return out
