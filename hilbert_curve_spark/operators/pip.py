"""Point-in-polygon join (reference S15 — the reference's only polygon is
the axis-aligned box, `hilbert/HilbertComponent/Box.contains:144-152`; the
north_star extends to general polygons).

Physical plan (per north_rule: cell-bucketed broadcast join + exact test):

1. **Prefilter** — each polygon's bounding box compiles to a budgeted
   Hilbert range cover (driver-side); the ``(poly_id, lo, hi)`` table is
   broadcast and probed with ``hilbert BETWEEN`` — the giant doc side is
   never shuffled, and on Hilbert-sorted storage the cover prunes the scan.
2. **Exact test** — integer-exact even-odd ray cast evaluated in a
   vectorized Arrow-batched pandas UDF over the (small) surviving pairs.
   The crossing test is pure int64 arithmetic (no division), so the DuckDB
   oracle can evaluate the *identical* predicate and cannot diverge on
   boundary cases:   for each edge with (y1 > py) != (y2 > py), the ray
   x -> +inf crosses iff  px*dy < x1*dy + (py-y1)*(x2-x1)  (inequality
   flipped when dy < 0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..config import DEFAULT, EngineConfig
from ..curve.cover import cover_box

Polygon = dict  # {poly_id: str, vertices: list[(x, y)]}


def _crossings_mask(px: np.ndarray, py: np.ndarray, verts: list[tuple[int, int]]) -> np.ndarray:
    """Vectorized integer even-odd ray cast: True = inside."""
    inside = np.zeros(px.shape, dtype=bool)
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        straddles = (y1 > py) != (y2 > py)
        dy = y2 - y1
        lhs = px * dy
        rhs = x1 * dy + (py - y1) * (x2 - x1)
        cross = np.where(dy > 0, lhs < rhs, lhs > rhs)
        inside ^= straddles & cross
    return inside


def pip_udf(polygons: list[Polygon]):
    """(x, y, poly_idx) -> inside.  Polygon vertex lists are captured
    driver-side (closure broadcast); evaluation batches by polygon."""
    verts_by_idx = {i: p["vertices"] for i, p in enumerate(polygons)}

    @F.pandas_udf(BooleanType())
    def _pip(x: pd.Series, y: pd.Series, idx: pd.Series) -> pd.Series:
        px = x.to_numpy(np.int64)
        py = y.to_numpy(np.int64)
        pi = idx.to_numpy(np.int64)
        out = np.zeros(len(px), dtype=bool)
        for i in np.unique(pi):
            m = pi == i
            out[m] = _crossings_mask(px[m], py[m], verts_by_idx[int(i)])
        return pd.Series(out)

    return _pip


def pip_join(
    doc_geo: DataFrame,
    polygons: list[Polygon],
    config: EngineConfig = DEFAULT,
) -> DataFrame:
    """(poly_id, doc_id, x, y) for every doc strictly inside each polygon."""
    spark = doc_geo.sparkSession
    rows = []
    for i, p in enumerate(polygons):
        xs = [v[0] for v in p["vertices"]]
        ys = [v[1] for v in p["vertices"]]
        x_lo, x_hi = max(0, min(xs)), min(config.edge - 1, max(xs))
        y_lo, y_hi = max(0, min(ys)), min(config.edge - 1, max(ys))
        cov = cover_box(x_lo, x_hi, y_lo, y_hi, config.order, config.max_ranges)
        for lo, hi in cov.ranges:
            rows.append((p["poly_id"], i, lo, hi))
    ranges = spark.createDataFrame(rows, "poly_id string, poly_idx int, lo long, hi long")
    # literal union-of-covers prefilter: a BETWEEN on two *columns* (the join
    # condition below) cannot be pushed to the scan, so first cut the probe
    # side with the merged literal ranges — Catalyst pushes those to parquet
    # row-group pruning and the nested-loop join only sees survivors
    from ..curve.cover import coalesce_ranges, merge_overlapping
    from .range_query import range_predicate

    union_cover = coalesce_ranges(merge_overlapping([(r[2], r[3]) for r in rows]), 64)
    cand = doc_geo.filter(range_predicate(union_cover)).join(
        F.broadcast(ranges), F.col("hilbert").between(F.col("lo"), F.col("hi"))
    )
    inside = pip_udf(polygons)(F.col("x"), F.col("y"), F.col("poly_idx"))
    return (
        cand.filter(inside)
        .select("poly_id", "doc_id", "x", "y")
        .distinct()
    )


def pip_oracle_sql(polygons: list[Polygon], doc_geo_sql_table: str = "doc_geo") -> str:
    """DuckDB oracle: identical integer ray-cast as SQL over exploded edges.

    Builds a VALUES edge list and counts straddling-and-crossing edges per
    (poly, doc); odd count = inside."""
    edge_rows = []
    for p in polygons:
        verts = p["vertices"]
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            edge_rows.append(f"('{p['poly_id']}', {x1}, {y1}, {x2}, {y2})")
    values = ", ".join(edge_rows)
    return f"""edges(poly_id, x1, y1, x2, y2) AS (VALUES {values}),
pip AS (
  SELECT e.poly_id, d.doc_key, d.x, d.y,
         SUM(CASE WHEN ((e.y1 > d.y) <> (e.y2 > d.y)) AND
                  (CASE WHEN e.y2 - e.y1 > 0
                        THEN d.x * (e.y2 - e.y1) < e.x1 * (e.y2 - e.y1) + (d.y - e.y1) * (e.x2 - e.x1)
                        ELSE d.x * (e.y2 - e.y1) > e.x1 * (e.y2 - e.y1) + (d.y - e.y1) * (e.x2 - e.x1)
                   END)
             THEN 1 ELSE 0 END) AS crossings
  FROM {doc_geo_sql_table} d, edges e
  GROUP BY e.poly_id, d.doc_key, d.x, d.y
)
"""
