"""Z-order (Morton) range query — the same GRQ contract as the Hilbert
range mode (`range_query.grq_range_mode`), executed over the alternative
space-filling curve so the two covers are comparable on identical boxes.

The reference engine is Hilbert-only; this operator exists to MEASURE the
choice, not to replace it: the Z cover of the same box fragments into more
index ranges (recorded in BENCH/BASELINE.md; pinned by
``tests/test_zorder.py``), which at 100 TB means more row-group intervals
to read from a curve-sorted layout.  The result set is identical — both
queries answer the plain box predicate exactly, and the driver checks both
against the SAME DuckDB box oracle.

Plan note: the Morton code is computed on the fly from (x, y) with pure
codegen bit arithmetic (`curve/morton.morton_expr_sql` — no Python), so
the BETWEEN predicate here filters a derived column and does NOT reach the
parquet scan; a stored Z-ordered layout would materialize the column and
sort by it, exactly like `sources/layout.write_sorted` does for Hilbert.
This operator demonstrates cover correctness + fragmentation, the stored
comparison lives on the Hilbert side where the engine actually sorts."""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..curve.morton import morton_expr_sql, zcover_box


def with_morton(doc_geo: DataFrame, config: EngineConfig = DEFAULT) -> DataFrame:
    """Materialize the Morton code as a stored column (the write-side step
    of a Z-ordered layout — what Delta's OPTIMIZE ZORDER effectively does)."""
    return doc_geo.withColumn("z", F.expr(morton_expr_sql("x", "y", config.order)))


def zorder_stored_mode(
    stored: DataFrame,
    x_lo: int, x_hi: int, y_lo: int, y_hi: int,
    config: EngineConfig = DEFAULT,
) -> DataFrame:
    """The stored-layout twin of :func:`zorder_range_mode`: the table
    carries a materialized, sorted ``z`` column, so the cover's
    OR-of-BETWEEN pushes to the parquet scan and prunes row groups by
    min/max — the same mechanics as ``grq_stored`` on the Hilbert side,
    letting the two curves' pruned-scan costs be compared end to end."""
    ranges, exact = zcover_box(
        x_lo, x_hi, y_lo, y_hi, config.order, config.max_ranges
    )
    pred = functools.reduce(
        operator.or_, [F.col("z").between(lo, hi) for lo, hi in ranges]
    )
    out = stored.filter(pred)
    if not exact:
        out = out.filter(
            F.col("x").between(x_lo, x_hi) & F.col("y").between(y_lo, y_hi)
        )
    return out


def zorder_range_mode(
    doc_geo: DataFrame,
    x_lo: int, x_hi: int, y_lo: int, y_hi: int,
    config: EngineConfig = DEFAULT,
) -> DataFrame:
    """Docs inside the rectangle via Z-order cover + exact residual."""
    ranges, exact = zcover_box(
        x_lo, x_hi, y_lo, y_hi, config.order, config.max_ranges
    )
    z = F.expr(morton_expr_sql("x", "y", config.order))
    pred = functools.reduce(
        operator.or_, [z.between(lo, hi) for lo, hi in ranges]
    )
    out = doc_geo.filter(pred)
    if not exact:
        out = out.filter(
            F.col("x").between(x_lo, x_hi) & F.col("y").between(y_lo, y_hi)
        )
    return out
