"""Encode stage: interleaved documents -> ``doc_geo``.

Parses the geo span back to lattice ``(x, y)``, extracts the keyword array
from text spans, and computes the Hilbert index with the Arrow-batched
kernel.  Output (FIXTURES.md F2, mirroring the reference's working record
`Experiment/Comparison/FixRangeCompareToConstructionOne.java:175-187`)::

    doc_geo(doc_id:string, x:long, y:long, keywords:array<string>,
            hilbert:long, cell:long)

``cell`` is a coarse spatial bucket (``hilbert >> 2*cell_shift``) used as
the co-location key for cell-bucketed joins and hot-cell salting.

Physical shape: span parsing and keyword extraction are native Column
expressions (codegen) in a projection that DROPS the spans column; the
Hilbert transform then runs as ``mapInPandas`` over that narrow frame.
This matters: a scalar pandas UDF here would let Catalyst collapse the
parse into the Arrow stage's arguments, forcing the entire ``spans`` array
through the Python-runner pass-through queue — measured 4.5x slower at
2.5M rows.  With mapInPandas only (doc_id, x, y, keywords) crosses the
Arrow boundary, still fully batched (no per-row Python).

The spans column itself is never rewritten — derived facts join back by
doc_id (span-sequence invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..curve.hilbert import encode2d


def parse_spans(docs: DataFrame, keep_spans: bool = False) -> DataFrame:
    """Native-SQL span parse: (doc_id, x, y, keywords[, spans])."""
    geo_text = F.expr("filter(spans, s -> s.kind = 'geo')[0].text")
    cols = [
        F.col("doc_id"),
        F.regexp_extract(geo_text, r"x=(\d+)", 1).cast("long").alias("x"),
        F.regexp_extract(geo_text, r"y=(\d+)", 1).cast("long").alias("y"),
        F.expr("transform(filter(spans, s -> s.kind = 'text'), s -> s.text)").alias("keywords"),
    ]
    if keep_spans:
        cols.append(F.col("spans"))
    return docs.select(*cols)


def encode_documents(
    docs: DataFrame, config: EngineConfig = DEFAULT, keep_spans: bool = False
) -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    parsed = parse_spans(docs, keep_spans=keep_spans)
    order = config.order
    shift = 2 * config.cell_shift
    # StructType.add mutates in place — build a fresh schema instead of
    # appending to parsed's cached one
    out_schema = StructType(
        list(parsed.schema.fields)
        + [StructField("hilbert", LongType()), StructField("cell", LongType())]
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            h = encode2d(b["x"].to_numpy(np.int64), b["y"].to_numpy(np.int64), order)
            b["hilbert"] = h
            b["cell"] = h >> shift
            yield b

    return parsed.mapInPandas(_encode, out_schema)
