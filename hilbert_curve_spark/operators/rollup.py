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
single reducers); every coarser level re-aggregates the *previous level's*
histogram, whose size shrinks 4x per step, so levels 1..L cost a geometric
tail of tiny hash aggregations rather than L corpus scans.  Algebraic
(sum-of-counts) rollup is exactly what makes partial aggregation legal.
"""

from __future__ import annotations

from functools import reduce

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
    frames = [base.select(F.lit(0).alias("level"), "cell", "n_docs")]
    prev = base
    for lvl in range(1, levels):
        prev = prev.groupBy(F.shiftright("cell", 2).alias("cell")).agg(
            F.sum("n_docs").alias("n_docs")
        )
        frames.append(prev.select(F.lit(lvl).alias("level"), "cell", "n_docs"))
    return reduce(DataFrame.unionByName, frames)


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
