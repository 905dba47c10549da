"""Hierarchical cell-pyramid rollup — multi-resolution tile statistics.

The reference renders per-cell tile matrices one window at a time
(`Experiment/TestByUserInput/BRQComparisonInput.generateHilbertMatrix:13-23`);
a map service over a 100 TB corpus instead precomputes counts at EVERY zoom
level.  Key property of the Hilbert index that makes this one cheap scan:
an aligned ``2^s x 2^s`` spatial block is exactly the index interval
``[cell << 2s, (cell + 1) << 2s)``, so the parent of a quad-cell at any
level is ``cell >> 2`` — integer arithmetic, no re-encoding.

Physical plan: the corpus is scanned ONCE for the base histogram
(two-phase salted aggregation — the gaussian hot cells would otherwise pin
single reducers); the multi-level rollup is then a native
``transform(sequence(...))`` explode of the (tiny) histogram — each base
cell emits its ``(level, cell >> 2*level)`` ancestors — followed by one
hash aggregation.  Structurally one corpus pass: a union-of-per-level-
aggregations formulation would re-execute the base lineage once per level
unless runtime exchange reuse happens to kick in; the explode form cannot.
Algebraic (sum-of-counts) rollup is exactly what makes the partial
aggregation legal at every step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from .skew import salted_cell_counts


def cell_pyramid(
    doc_geo: DataFrame, levels: int = 5, config: EngineConfig = DEFAULT
) -> DataFrame:
    """(level, cell, n_docs) for levels 0..levels-1; level 0 = the engine's
    base cell grid (``hilbert >> 2*cell_shift``), each level up merges quads
    (``cell >> 2``)."""
    base = salted_cell_counts(doc_geo, config)
    ancestors = (
        f"transform(sequence(0, {levels - 1}), "
        f"l -> named_struct('level', CAST(l AS INT), 'cell', shiftright(cell, 2 * l)))"
    )
    return (
        base.select(F.explode(F.expr(ancestors)).alias("e"), "n_docs")
        .select(F.col("e.level").alias("level"), F.col("e.cell").alias("cell"), "n_docs")
        .groupBy("level", "cell")
        .agg(F.sum("n_docs").alias("n_docs"))
    )


def cell_pyramid_oracle_select(levels: int, config: EngineConfig = DEFAULT) -> str:
    """SELECT body over a pre-defined ``doc_geo``+``hv`` CTE chain (the
    caller supplies the recursive-CTE hilbert computation, as in the
    cell_stats oracle).  Every level is computed independently from the
    base-cell histogram; SUM casts back from HUGEINT."""
    shift = 2 * config.cell_shift
    base = (
        f"SELECT hv.hilbert >> {shift} AS cell, COUNT(*) AS n_docs "
        "FROM doc_geo d JOIN hv ON d.x = hv.cx AND d.y = hv.cy GROUP BY 1"
    )
    parts = [f"SELECT CAST(0 AS INT) AS level, cell, n_docs FROM base"]
    for lvl in range(1, levels):
        parts.append(
            f"SELECT CAST({lvl} AS INT) AS level, cell >> {2 * lvl} AS cell, "
            f"CAST(SUM(n_docs) AS BIGINT) AS n_docs FROM base GROUP BY 1, 2"
        )
    union = " UNION ALL ".join(parts)
    return f", base AS ({base}) {union}"
