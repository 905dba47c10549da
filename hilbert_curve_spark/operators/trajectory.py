"""Trajectory operators over the ``events`` table: stay-point detection and
origin-destination flow matrices.

The reference has no trajectory surface (its objects are static points —
`Scheme/RSKQ/RSKQ_Biginteger.java:1008` indexes one coordinate per object);
these are the movement-analytics companions the events stream makes
possible once every event carries the engine's derived lattice coordinates
(same derivation as the geofence family, ``sources/derive.x_sql``).  Both
are exact-oracle operators: integer lattice arithmetic only, whole-second
epochs, deterministic ``(epoch, event_id)`` tie-breaks.

Scale notes (100 TB): both operators shuffle ONCE on ``user_id`` (the
window / first-level groupBy key); with the events table bucketed by
``user_id`` they are shuffle-free.  The OD second stage is a plain hash
aggregation with map-side combine on ``(window, o_cell, d_cell)`` — at most
``|users| x |windows|`` rows enter it, already far smaller than the input.
Neither operator joins, explodes, or collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_coords_epoch(events: DataFrame) -> DataFrame:
    from ..sources import derive

    ep = F.col("ts").cast("timestamp").cast("long")
    return (
        events.withColumn("ex", F.expr(derive.x_sql("event_id")))
        .withColumn("ey", F.expr(derive.y_sql("event_id")))
        .withColumn("ep", ep)
    )


def stay_points(
    events: DataFrame,
    radius: int = 1200,
    gap_minutes: int = 720,
    min_minutes: int = 60,
    min_points: int = 3,
) -> DataFrame:
    """Stay-point detection (Li et al., GIS 2008, via consecutive-pair
    segmentation): per user, a *stay segment* is a maximal run of
    time-ordered events where each point is within ``radius`` (Euclidean,
    compared squared — no floats) of its predecessor AND arrives within
    ``gap_minutes``; a segment qualifies as a stay point when it spans
    ``>= min_minutes`` and ``>= min_points`` events.  Output
    ``(user_id, stay_id, n_points, start_s, end_s, cx, cy)`` with the
    centroid as the integer mean (``SUM DIV COUNT`` — exact in both
    engines on the non-negative lattice).

    Same gap-and-island shape as :func:`events.sessionize` (lag + boundary
    flag + running sum: ONE user_id shuffle) with the spatial predicate
    fused into the boundary test; the gap test compares whole-second
    epochs exactly as sessionize does (see its TIMESTAMP_NTZ note)."""
    r2 = int(radius) * int(radius)
    gap = int(gap_minutes) * 60
    pts = _with_coords_epoch(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dx = F.col("ex") - F.lag("ex").over(w)
    dy = F.col("ey") - F.lag("ey").over(w)
    moved = (dx * dx + dy * dy > F.lit(r2)) | (
        F.col("ep") - F.lag("ep").over(w) > F.lit(gap)
    )
    # first row per user: lag is NULL -> condition NULL -> otherwise(0),
    # identical to the oracle's CASE ... ELSE 0 (NULL comparisons fall out)
    seg = pts.withColumn(
        "b", F.when(moved, F.lit(1)).otherwise(F.lit(0))
    ).withColumn("stay_id", F.sum("b").over(w))
    agg = seg.groupBy("user_id", "stay_id").agg(
        F.count("*").alias("n_points"),
        F.min("ep").alias("start_s"),
        F.max("ep").alias("end_s"),
        F.expr("CAST(SUM(ex) DIV COUNT(*) AS BIGINT)").alias("cx"),
        F.expr("CAST(SUM(ey) DIV COUNT(*) AS BIGINT)").alias("cy"),
    )
    return agg.filter(
        (F.col("end_s") - F.col("start_s") >= F.lit(int(min_minutes) * 60))
        & (F.col("n_points") >= F.lit(int(min_points)))
    ).select("user_id", "stay_id", "n_points", "start_s", "end_s", "cx", "cy")


def stay_points_oracle(
    radius: int = 1200,
    gap_minutes: int = 720,
    min_minutes: int = 60,
    min_points: int = 3,
    table: str = "events",
) -> str:
    """Identical segmentation in DuckDB: same coordinate derivation, same
    floored-epoch gap test, same ``(ts, event_id)`` window order.  Outer
    CASTs keep HUGEINT window/aggregate sums BIGINT (the events-oracle
    dtype lesson, `operators/events.py:50-56`)."""
    from ..sources import derive

    r2 = int(radius) * int(radius)
    gap = int(gap_minutes) * 60
    min_dur = int(min_minutes) * 60
    return f"""WITH pts AS (
  SELECT user_id, event_id, ts,
         {derive.x_sql('event_id')} AS ex, {derive.y_sql('event_id')} AS ey,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep
  FROM {table}
), flagged AS (
  SELECT user_id, event_id, ts, ex, ey, ep,
         CASE WHEN (ex - LAG(ex) OVER w) * (ex - LAG(ex) OVER w)
                 + (ey - LAG(ey) OVER w) * (ey - LAG(ey) OVER w) > {r2}
                OR ep - LAG(ep) OVER w > {gap}
              THEN 1 ELSE 0 END AS b
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), seg AS (
  SELECT user_id, ex, ey, ep,
         CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS stay_id
  FROM flagged
)
SELECT user_id, stay_id,
       COUNT(*) AS n_points,
       MIN(ep) AS start_s, MAX(ep) AS end_s,
       CAST(SUM(ex) // COUNT(*) AS BIGINT) AS cx,
       CAST(SUM(ey) // COUNT(*) AS BIGINT) AS cy
FROM seg
GROUP BY user_id, stay_id
HAVING MAX(ep) - MIN(ep) >= {min_dur} AND COUNT(*) >= {min_points}"""


def od_flows(
    events: DataFrame, window_minutes: int = 60, cell_shift: int = 8
) -> DataFrame:
    """Origin-destination flow matrix: per ``(user, epoch-aligned window)``
    take the cell of the user's first and last event (order
    ``(epoch, event_id)`` — deterministic), then count user-window flows
    per ``(window_start_s, o_cell, d_cell)``.  The cell key is the
    ``cell_shift``-coarsened lattice cell ``(ex DIV 2^s) * edge + (ey DIV
    2^s)`` — engine-neutral integer arithmetic.

    Plan shape: first/last via ONE ``min(struct)/max(struct)`` hash
    aggregation on ``(user_id, window)`` (map-side combinable — no window
    function, no sort), then a second hash agg on the OD key.  Both stages
    partial-aggregate, so the shuffle volume is bounded by distinct keys,
    not events."""
    from ..sources.derive import EDGE

    secs = int(window_minutes) * 60
    step = 1 << int(cell_shift)
    pts = _with_coords_epoch(events)
    cell = F.expr(f"CAST((ex DIV {step}) * {EDGE} + (ey DIV {step}) AS BIGINT)")
    keyed = pts.withColumn("cell", cell).withColumn(
        "window_start_s", (F.col("ep") - F.col("ep") % F.lit(secs))
    )
    od = keyed.groupBy("user_id", "window_start_s").agg(
        F.min(F.struct("ep", "event_id", "cell")).getField("cell").alias("o_cell"),
        F.max(F.struct("ep", "event_id", "cell")).getField("cell").alias("d_cell"),
    )
    return od.groupBy("window_start_s", "o_cell", "d_cell").agg(
        F.count("*").alias("n_flows")
    )


def od_flows_oracle(
    window_minutes: int = 60, cell_shift: int = 8, table: str = "events"
) -> str:
    """Same derivation; first/last replayed as ROW_NUMBER over the
    identical ``(ep, event_id)`` order (Spark's lexicographic struct
    min/max equals rank-1 under that order — ``(ep, event_id)`` is unique
    because event_id is)."""
    from ..sources import derive
    from ..sources.derive import EDGE

    secs = int(window_minutes) * 60
    step = 1 << int(cell_shift)
    return f"""WITH pts AS (
  SELECT user_id, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep,
         CAST(({derive.x_sql('event_id')} // {step}) * {EDGE}
              + ({derive.y_sql('event_id')} // {step}) AS BIGINT) AS cell
  FROM {table}
), keyed AS (
  SELECT user_id, ep - ep % {secs} AS window_start_s, ep, event_id, cell
  FROM pts
), ranked AS (
  SELECT user_id, window_start_s, cell,
         ROW_NUMBER() OVER (PARTITION BY user_id, window_start_s
                            ORDER BY ep, event_id) AS rf,
         ROW_NUMBER() OVER (PARTITION BY user_id, window_start_s
                            ORDER BY ep DESC, event_id DESC) AS rl
  FROM keyed
), od AS (
  SELECT user_id, window_start_s,
         MAX(CASE WHEN rf = 1 THEN cell END) AS o_cell,
         MAX(CASE WHEN rl = 1 THEN cell END) AS d_cell
  FROM ranked
  GROUP BY user_id, window_start_s
)
SELECT window_start_s, o_cell, d_cell, COUNT(*) AS n_flows
FROM od
GROUP BY window_start_s, o_cell, d_cell"""
