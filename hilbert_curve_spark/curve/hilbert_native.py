"""Pure-JVM Hilbert encode: the xy2d iteration as chained native projections.

The classic xy2d loop (the same formulation as the DuckDB oracle CTE,
``operators/tiles.py:hilbert_sql_cte``, proven equal to the reference
Skilling kernel `hilbert/HilbertComponent/HilbertCurve.java:187-216` by the
goldens + exhaustive order-3 check in ``tests/test_hilbert.py``) is unrolled
into ``order`` chained ``withColumns`` projections over three working
columns ``(hx, hy, d)``.

Why this exists next to the numpy kernel (``curve/hilbert.py``): the Arrow
path must ship every batch across the JVM<->Python boundary, and in the
encode stage the (untouched) ``keywords`` array dominated that transfer.
Here every iteration is a handful of integer CASE/bit ops on named columns,
so whole-stage codegen compiles the unroll into straight-line local-variable
Java — the encode rides the scan, no Python workers, no Arrow, and the
stage scales with cores like any other codegen projection.

CollapseProject note: Spark only merges adjacent projections when the
produced expressions are cheap or referenced at most once.  Each iteration
references ``hx``/``hy`` several times, so the steps stay separate logical
projections (all fused into one WholeStageCodegen physically) instead of
being inlined into one O(4^order)-node expression.

PUSHDOWN CAVEAT — this is a bulk-materialization kernel, not a composable
query operator.  ``PushPredicateThroughNonJoin`` has no such referenced-
more-than-once guard: a deterministic filter placed directly above the
unroll that references the output column gets the alias chain substituted
into the predicate layer by layer, growing ~4x per layer (O(4^order)
nodes — the optimizer spins for hours at order 12; observed live).
Aggregate/write/sort consumers are fine; filters must go below the unroll
or above a materialization barrier (cache, parquet, ``mapInPandas``).
``operators/encode.py`` keeps the Arrow kernel as the composable default
for exactly this reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_hilbert_native", "with_decode_native"]


def _bit(col: Column, s: int) -> Column:
    return col.bitwiseAND(F.lit(s)) != 0


def with_hilbert_native(
    df: DataFrame,
    order: int,
    x: str = "x",
    y: str = "y",
    out: str = "hilbert",
) -> DataFrame:
    """Append ``out`` = Hilbert index of integer lattice columns (x, y).

    Matches ``curve.hilbert.encode2d`` bit-for-bit for 2-D, any order <= 31
    (property-tested in ``tests/test_hilbert_native.py``).
    """
    hx, hy, d = "__hn_hx", "__hn_hy", "__hn_d"
    df = df.withColumns(
        {
            hx: F.col(x).cast("long"),
            hy: F.col(y).cast("long"),
            d: F.lit(0).cast("long"),
        }
    )
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = _bit(F.col(hx), s)
        ry = _bit(F.col(hy), s)
        quadrant = (
            F.when(rx, F.lit(3)).otherwise(F.lit(0)).bitwiseXOR(
                F.when(ry, F.lit(1)).otherwise(F.lit(0))
            )
        ).cast("long")
        # ry=0: conditional flip by rx, then swap axes; ry=1: unchanged
        new_hx = F.when(
            ry, F.col(hx)
        ).otherwise(F.when(rx, F.lit(s - 1) - F.col(hy)).otherwise(F.col(hy)))
        new_hy = F.when(
            ry, F.col(hy)
        ).otherwise(F.when(rx, F.lit(s - 1) - F.col(hx)).otherwise(F.col(hx)))
        df = df.withColumns(
            {
                hx: new_hx,
                hy: new_hy,
                d: F.col(d) + F.lit(s).cast("long") * F.lit(s) * quadrant,
            }
        )
    return df.withColumn(out, F.col(d)).drop(hx, hy, d)


def with_decode_native(
    df: DataFrame,
    order: int,
    h: str = "hilbert",
    out_x: str = "x",
    out_y: str = "y",
) -> DataFrame:
    """Append ``(out_x, out_y)`` = lattice point of Hilbert index column.

    Inverse iteration (d2xy), s from 1 up to 2**(order-1): extract the
    quadrant from the index, un-rotate, accumulate.  Bit-for-bit equal to
    ``curve.hilbert.decode2d`` (same tests).
    """
    hx, hy, t = "__hn_ix", "__hn_iy", "__hn_t"
    df = df.withColumns(
        {
            hx: F.lit(0).cast("long"),
            hy: F.lit(0).cast("long"),
            t: F.col(h).cast("long"),
        }
    )
    for i in range(order):
        s = 1 << i
        rx = F.shiftright(F.col(t), 1).bitwiseAND(F.lit(1)) != 0
        ry = (
            F.col(t)
            .bitwiseXOR(F.when(rx, F.lit(1)).otherwise(F.lit(0)))
            .bitwiseAND(F.lit(1))
            != 0
        )
        # un-rotate the accumulated (hx, hy), then add the quadrant offset
        ux = F.when(
            ry, F.col(hx)
        ).otherwise(F.when(rx, F.lit(s - 1) - F.col(hy)).otherwise(F.col(hy)))
        uy = F.when(
            ry, F.col(hy)
        ).otherwise(F.when(rx, F.lit(s - 1) - F.col(hx)).otherwise(F.col(hx)))
        df = df.withColumns(
            {
                hx: ux + F.when(rx, F.lit(s)).otherwise(F.lit(0)).cast("long"),
                hy: uy + F.when(ry, F.lit(s)).otherwise(F.lit(0)).cast("long"),
                t: F.shiftright(F.col(t), 2),
            }
        )
    return (
        df.withColumn(out_x, F.col(hx))
        .withColumn(out_y, F.col(hy))
        .drop(hx, hy, t)
    )
