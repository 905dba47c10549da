"""Tile <-> vector assignment (reference S14).

* ``tile_cells`` rasterizes tile windows into per-cell Hilbert indices —
  the reference's ``generateHilbertMatrix``
  (`Experiment/TestByUserInput/BRQComparisonInput.java:13-23`), distributed:
  one row per (tile, cell), generated with native ``sequence``/``explode``
  and encoded by the Arrow-batched kernel.
* ``tile_assignment`` maps documents to the tiles whose window contains
  them.  Physical plan: each tile compiles (driver-side) to a budgeted
  Hilbert range cover; the ``(tile_id, lo, hi, box)`` table is tiny and
  broadcast, so the doc side is probed with a broadcast range join plus the
  exact box residual — no shuffle of the (huge) doc side, and on
  Hilbert-sorted storage the union of all tile covers prunes the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..curve.cover import cover_box
from ..functions.udfs import hilbert_encode_udf

TileSpec = dict  # {tile_id, x_start, y_start, width, height}


def tile_cells(spark: SparkSession, tiles: list[TileSpec], config: EngineConfig = DEFAULT) -> DataFrame:
    """(tile_id, cx, cy, hilbert) for every cell of every tile window."""
    tdf = spark.createDataFrame(
        [(t["tile_id"], t["x_start"], t["y_start"], t["width"], t["height"]) for t in tiles],
        "tile_id string, x_start long, y_start long, width int, height int",
    )
    cells = (
        tdf.select(
            "tile_id",
            F.explode(F.expr("sequence(x_start, x_start + width - 1)")).alias("cx"),
            "y_start",
            "height",
        )
        .select(
            "tile_id",
            "cx",
            F.explode(F.expr("sequence(y_start, y_start + height - 1)")).alias("cy"),
        )
    )
    h = hilbert_encode_udf(config.order)(F.col("cx"), F.col("cy"))
    return cells.withColumn("hilbert", h)


def tile_assignment(
    doc_geo: DataFrame,
    tiles: list[TileSpec],
    config: EngineConfig = DEFAULT,
) -> DataFrame:
    """(tile_id, doc_id) for every doc inside a tile window.

    Driver compiles per-tile covers; the broadcast side carries the range
    bounds AND the exact window, so the join predicate is
    ``hilbert BETWEEN lo AND hi`` (satisfiable only for a pruned sliver of
    the doc side) with the residual box check conjoined.
    """
    spark = doc_geo.sparkSession
    rows = []
    for t in tiles:
        x_lo, y_lo = t["x_start"], t["y_start"]
        x_hi, y_hi = x_lo + t["width"] - 1, y_lo + t["height"] - 1
        cov = cover_box(x_lo, x_hi, y_lo, y_hi, config.order, config.max_ranges)
        for lo, hi in cov.ranges:
            rows.append((t["tile_id"], lo, hi, x_lo, x_hi, y_lo, y_hi))
    ranges = spark.createDataFrame(
        rows,
        "tile_id string, lo long, hi long, bx_lo long, bx_hi long, by_lo long, by_hi long",
    )
    # literal union-of-covers prefilter (pushed to the scan) ahead of the
    # column-vs-column nested-loop condition — see pip.pip_join
    from ..curve.cover import coalesce_ranges, merge_overlapping
    from .range_query import range_predicate

    union_cover = coalesce_ranges(
        merge_overlapping([(r[1], r[2]) for r in rows]), 64
    )
    joined = doc_geo.filter(range_predicate(union_cover)).join(
        F.broadcast(ranges),
        F.col("hilbert").between(F.col("lo"), F.col("hi"))
        & F.col("x").between(F.col("bx_lo"), F.col("bx_hi"))
        & F.col("y").between(F.col("by_lo"), F.col("by_hi")),
    )
    return joined.select("tile_id", "doc_id").distinct()


def hilbert_sql_cte(order: int, cells_sql: str, pre_ctes: str = "") -> str:
    """DuckDB recursive-CTE computing Hilbert indices for a cell set — an
    *independent* formulation (the classic xy2d iteration) that provably
    equals the Skilling transform in 2-D (tests/test_hilbert.py golden +
    exhaustive order-3 check).  ``cells_sql`` must yield columns (cx, cy)
    and may carry extra grouping columns (forwarded via cx/cy join)."""
    s0 = 1 << (order - 1)
    return f"""
WITH RECURSIVE {pre_ctes}cells AS ({cells_sql}), it AS (
  SELECT cx, cy, cx AS hx, cy AS hy, CAST({s0} AS BIGINT) AS s, CAST(0 AS BIGINT) AS d
  FROM (SELECT DISTINCT cx, cy FROM cells)
  UNION ALL
  SELECT cx, cy,
    CASE WHEN (hy & s) = 0 THEN (CASE WHEN (hx & s) > 0 THEN s - 1 - hy ELSE hy END) ELSE hx END,
    CASE WHEN (hy & s) = 0 THEN (CASE WHEN (hx & s) > 0 THEN s - 1 - hx ELSE hx END) ELSE hy END,
    s // 2,
    d + s * s * xor(3 * (CASE WHEN (hx & s) > 0 THEN 1 ELSE 0 END),
                    (CASE WHEN (hy & s) > 0 THEN 1 ELSE 0 END))
  FROM it WHERE s > 0
), hv AS (SELECT cx, cy, d AS hilbert FROM it WHERE s = 0)
"""
