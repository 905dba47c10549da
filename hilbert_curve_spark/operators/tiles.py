"""Tile <-> vector assignment (reference S14).

* ``tile_cells`` rasterizes tile windows into per-cell Hilbert indices —
  the reference's ``generateHilbertMatrix``
  (`Experiment/TestByUserInput/BRQComparisonInput.java:13-23`), distributed:
  one row per (tile, cell), generated with native ``sequence``/``explode``
  and encoded by the Arrow-batched kernel.
* ``tile_assignment`` maps documents to the tiles whose window contains
  them.  Physical plan: each tile compiles (driver-side) to a budgeted
  Hilbert range cover whose ranges expand to aligned ``hilbert >> s``
  cells; the tiny ``(tile_id, ck, lo, hi, box)`` table broadcasts and the
  doc side probes it with a broadcast HASH join on the cell key (BETWEEN +
  exact window as residuals) — no shuffle of the (huge) doc side, no
  nested-loop fanout, and on Hilbert-sorted storage the union of all tile
  covers prunes the scan.
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

    Driver compiles per-tile covers; the broadcast side carries the aligned
    cell key (hash-join equi key), the range bounds, and the exact window —
    the BETWEEN and box checks are residuals on the hash-matched rows.
    """
    from .range_query import cover_cells_probe

    per_tile: list[tuple[tuple, list[tuple[int, int]]]] = []
    for t in tiles:
        x_lo, y_lo = t["x_start"], t["y_start"]
        x_hi, y_hi = x_lo + t["width"] - 1, y_lo + t["height"] - 1
        cov = cover_box(x_lo, x_hi, y_lo, y_hi, config.order, config.max_ranges)
        per_tile.append(((t["tile_id"], x_lo, x_hi, y_lo, y_hi), cov.ranges))

    # equi-key broadcast HASH join (shared plumbing, see cover_cells_probe);
    # the exact tile window is the post-join residual
    joined = cover_cells_probe(
        doc_geo,
        per_tile,
        "tile_id string, bx_lo long, bx_hi long, by_lo long, by_hi long",
    ).filter(
        F.col("x").between(F.col("bx_lo"), F.col("bx_hi"))
        & F.col("y").between(F.col("by_lo"), F.col("by_hi"))
    )
    # per-tile cover ranges are disjoint, so each (tile, doc) appears at
    # most once — the distinct only guards overlapping tile windows
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
