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


def trips(
    events: DataFrame,
    radius: int = 1200,
    gap_minutes: int = 720,
    min_minutes: int = 60,
    min_points: int = 3,
) -> DataFrame:
    """Trip extraction: the moves BETWEEN a user's consecutive stay points
    (see :func:`stay_points`).  Output ``(user_id, from_stay, to_stay,
    depart_s, arrive_s, travel_s, dist2)`` — one row per consecutive stay
    pair, ordered by ``(start_s, stay_id)`` (stay intervals of one user
    never overlap — segments are time-ordered — so this order is the
    itinerary order; stay_id breaks the zero-length-interval tie).

    One additional window pass over the already-tiny stays table; no new
    shuffle beyond stay_points' own when the table stays partitioned by
    user_id."""
    stays = stay_points(
        events, radius=radius, gap_minutes=gap_minutes,
        min_minutes=min_minutes, min_points=min_points,
    )
    w = Window.partitionBy("user_id").orderBy("start_s", "stay_id")
    prev_stay = F.lag("stay_id").over(w)
    prev_end = F.lag("end_s").over(w)
    prev_cx = F.lag("cx").over(w)
    prev_cy = F.lag("cy").over(w)
    dist2 = (F.col("cx") - prev_cx) ** 2 + (F.col("cy") - prev_cy) ** 2
    return (
        stays.select(
            "user_id",
            prev_stay.alias("from_stay"),
            F.col("stay_id").alias("to_stay"),
            prev_end.alias("depart_s"),
            F.col("start_s").alias("arrive_s"),
            (F.col("start_s") - prev_end).alias("travel_s"),
            dist2.cast("long").alias("dist2"),
        )
        .filter(F.col("from_stay").isNotNull())
    )


def trips_oracle(
    radius: int = 1200,
    gap_minutes: int = 720,
    min_minutes: int = 60,
    min_points: int = 3,
    table: str = "events",
) -> str:
    """Same LAG replay over the stays oracle subquery."""
    stays_sql = stay_points_oracle(
        radius=radius, gap_minutes=gap_minutes, min_minutes=min_minutes,
        min_points=min_points, table=table,
    )
    return f"""WITH stays AS (
  SELECT * FROM ({stays_sql}) st
), hops AS (
  SELECT user_id,
         LAG(stay_id) OVER w AS from_stay,
         stay_id AS to_stay,
         LAG(end_s) OVER w AS depart_s,
         start_s AS arrive_s,
         start_s - LAG(end_s) OVER w AS travel_s,
         (cx - LAG(cx) OVER w) * (cx - LAG(cx) OVER w)
           + (cy - LAG(cy) OVER w) * (cy - LAG(cy) OVER w) AS dist2
  FROM stays
  WINDOW w AS (PARTITION BY user_id ORDER BY start_s, stay_id)
)
SELECT user_id, from_stay, to_stay, depart_s, arrive_s, travel_s,
       CAST(dist2 AS BIGINT) AS dist2
FROM hops WHERE from_stay IS NOT NULL"""


def colocation_pairs(
    events: DataFrame,
    max_dist: int = 256,
    min_overlap_minutes: int = 0,
    radius: int = 1200,
    gap_minutes: int = 720,
    min_minutes: int = 60,
    min_points: int = 3,
) -> DataFrame:
    """Co-location (contact) join: pairs of DIFFERENT users whose stay
    points (see :func:`stay_points`) are within ``max_dist`` (centroid L2,
    compared squared) AND overlap in time for at least
    ``min_overlap_minutes``.  Output ``(user_a, stay_a, user_b, stay_b,
    dist2, overlap_s)`` with ``user_a < user_b`` — every qualifying stay
    pair exactly once.

    Plan shape: the stay table (already aggregated — orders of magnitude
    smaller than events) is blocked on ``max_dist``-sized centroid cells;
    the probe side replicates to the 9-cell neighborhood (lossless for
    cell >= max_dist) and hash-joins the home cell, with the distance AND
    interval-overlap predicates as join residuals — so the only shuffle
    beyond stay_points' own is one equi-join on the composite cell key,
    never an all-pairs product.  The ``user_a < user_b`` residual keeps
    exactly one orientation of each pair (the 9 offsets hit 9 distinct
    target cells, so no orientation is emitted twice)."""
    from .spatial_join import _cell_shift

    d2 = int(max_dist) * int(max_dist)
    min_ov = int(min_overlap_minutes) * 60
    s = _cell_shift(int(max_dist))
    # centroid grid is the lattice itself: edge cells suffice for the key
    from ..sources.derive import EDGE

    stays = stay_points(
        events, radius=radius, gap_minutes=gap_minutes,
        min_minutes=min_minutes, min_points=min_points,
    )

    def keyed(tag: str) -> DataFrame:
        return stays.select(
            F.col("user_id").alias(f"user_{tag}"),
            F.col("stay_id").alias(f"stay_{tag}"),
            F.col("start_s").alias(f"start_{tag}"),
            F.col("end_s").alias(f"end_{tag}"),
            F.col("cx").alias(f"cx_{tag}"),
            F.col("cy").alias(f"cy_{tag}"),
            F.shiftright("cx", s).alias(f"gx_{tag}"),
            F.shiftright("cy", s).alias(f"gy_{tag}"),
        )

    offs = ", ".join(
        f"named_struct('dx', {dx}L, 'dy', {dy}L)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    probe = (
        keyed("a")
        .withColumn("o", F.explode(F.expr(f"array({offs})")))
        .withColumn(
            "ck", (F.col("gx_a") + F.col("o.dx")) * EDGE + F.col("gy_a") + F.col("o.dy")
        )
    )
    home = keyed("b").withColumn("ck", F.col("gx_b") * EDGE + F.col("gy_b"))
    dist2 = (F.col("cx_a") - F.col("cx_b")) ** 2 + (
        F.col("cy_a") - F.col("cy_b")
    ) ** 2
    overlap = F.least("end_a", "end_b") - F.greatest("start_a", "start_b")
    return (
        probe.join(home, "ck")
        .filter(F.col("user_a") < F.col("user_b"))
        .withColumn("dist2", dist2.cast("long"))
        .filter(F.col("dist2") <= F.lit(d2))
        .withColumn("overlap_s", overlap)
        .filter(F.col("overlap_s") >= F.lit(min_ov))
        .select(
            "user_a", "stay_a", "user_b", "stay_b", "dist2", "overlap_s"
        )
    )


def colocation_pairs_oracle(
    max_dist: int = 256,
    min_overlap_minutes: int = 0,
    radius: int = 1200,
    gap_minutes: int = 720,
    min_minutes: int = 60,
    min_points: int = 3,
    table: str = "events",
) -> str:
    """Same stays derivation (the stay_points oracle as a subquery), same
    9-offset lossless blocking, identical integer residuals."""
    from .spatial_join import _cell_shift

    d2 = int(max_dist) * int(max_dist)
    min_ov = int(min_overlap_minutes) * 60
    s = _cell_shift(int(max_dist))
    stays_sql = stay_points_oracle(
        radius=radius, gap_minutes=gap_minutes, min_minutes=min_minutes,
        min_points=min_points, table=table,
    )
    nine = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""WITH stays AS (
  SELECT * FROM ({stays_sql}) st
), prb AS (
  SELECT user_id, stay_id, start_s, end_s, cx, cy,
         (cx >> {s}) + dx AS gx, (cy >> {s}) + dy AS gy
  FROM stays, (VALUES {nine}) o(dx, dy)
), hom AS (
  SELECT user_id, stay_id, start_s, end_s, cx, cy,
         cx >> {s} AS gx, cy >> {s} AS gy
  FROM stays
)
SELECT p.user_id AS user_a, p.stay_id AS stay_a,
       h.user_id AS user_b, h.stay_id AS stay_b,
       (p.cx - h.cx) * (p.cx - h.cx) + (p.cy - h.cy) * (p.cy - h.cy) AS dist2,
       LEAST(p.end_s, h.end_s) - GREATEST(p.start_s, h.start_s) AS overlap_s
FROM prb p JOIN hom h ON p.gx = h.gx AND p.gy = h.gy
WHERE p.user_id < h.user_id
  AND (p.cx - h.cx) * (p.cx - h.cx) + (p.cy - h.cy) * (p.cy - h.cy) <= {d2}
  AND LEAST(p.end_s, h.end_s) - GREATEST(p.start_s, h.start_s) >= {min_ov}"""


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


def hausdorff_pairs(
    events: DataFrame,
    max_h: int = 512,
    radius: int = 1200,
    gap_minutes: int = 720,
    min_minutes: int = 60,
    min_points: int = 3,
) -> DataFrame:
    """Trajectory-similarity join: pairs of users whose stay-point
    trajectories are within symmetric Hausdorff distance ``max_h``
    (compared squared — exact integers) — ``(user_a, user_b, haus2)``
    with ``user_a < user_b``.

    ``H(A,B) = max(h(A,B), h(B,A))``, ``h(A,B) = max_a min_b d2(a,b)``
    over the users' stay CENTROIDS (the aggregated trajectory — orders of
    magnitude smaller than raw pings, which is what makes the exact
    max-min affordable).

    Physical plan, never all-pairs:

    1. candidate pairs — the 9-cell blocked stay join (cell >= max_h):
       ``H <= max_h`` forces EVERY a-stay within ``max_h`` of B, so in
       particular some stay pair is within ``max_h`` and the blocking is
       recall-COMPLETE; distinct to user pairs.
    2. the (candidate x stays_a x stays_b) frame — two hash joins on
       user id; its size is candidates x |A| x |B|, bounded because stays
       per user are bounded (they are stays, not pings).
    3. both directed distances as two (groupBy min -> groupBy max)
       aggregation chains on the pair key; symmetric H = greatest of the
       two, filtered to ``max_h``.

    All shuffles are hash aggregations/joins on pair or user keys — no
    window sort, no product beyond the blocked candidates."""
    from .spatial_join import _cell_shift
    from ..sources.derive import EDGE

    h2 = int(max_h) * int(max_h)
    s = _cell_shift(int(max_h))
    stays = stay_points(
        events, radius=radius, gap_minutes=gap_minutes,
        min_minutes=min_minutes, min_points=min_points,
    )

    offs = ", ".join(
        f"named_struct('dx', {dx}L, 'dy', {dy}L)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    probe = (
        stays.select(
            F.col("user_id").alias("user_a"),
            F.col("cx").alias("pcx"),
            F.col("cy").alias("pcy"),
        )
        .withColumn("o", F.explode(F.expr(f"array({offs})")))
        .withColumn(
            "ck",
            (F.shiftright("pcx", s) + F.col("o.dx")) * EDGE
            + F.shiftright("pcy", s)
            + F.col("o.dy"),
        )
    )
    home = stays.select(
        F.col("user_id").alias("user_b"),
        F.col("cx").alias("hcx"),
        F.col("cy").alias("hcy"),
    ).withColumn("ck", F.shiftright("hcx", s) * EDGE + F.shiftright("hcy", s))
    cd2 = (
        (F.col("pcx") - F.col("hcx")) ** 2 + (F.col("pcy") - F.col("hcy")) ** 2
    ).cast("long")
    cand = (
        probe.join(home, "ck")
        .filter(F.col("user_a") < F.col("user_b"))
        .filter(cd2 <= F.lit(h2))
        .select("user_a", "user_b")
        .distinct()
    )
    sa = stays.select(
        F.col("user_id").alias("user_a"),
        F.col("stay_id").alias("stay_a"),
        F.col("cx").alias("ax"),
        F.col("cy").alias("ay"),
    )
    sb = stays.select(
        F.col("user_id").alias("user_b"),
        F.col("stay_id").alias("stay_b"),
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
    )
    d2 = (
        (F.col("ax") - F.col("bx")) ** 2 + (F.col("ay") - F.col("by")) ** 2
    ).cast("long")
    tri = cand.join(sa, "user_a").join(sb, "user_b").withColumn("d2", d2)
    h_ab = (
        tri.groupBy("user_a", "user_b", "stay_a")
        .agg(F.min("d2").alias("mn"))
        .groupBy("user_a", "user_b")
        .agg(F.max("mn").alias("h_ab"))
    )
    h_ba = (
        tri.groupBy("user_a", "user_b", "stay_b")
        .agg(F.min("d2").alias("mn"))
        .groupBy("user_a", "user_b")
        .agg(F.max("mn").alias("h_ba"))
    )
    return (
        h_ab.join(h_ba, ["user_a", "user_b"])
        .select(
            "user_a",
            "user_b",
            F.greatest("h_ab", "h_ba").alias("haus2"),
        )
        .filter(F.col("haus2") <= F.lit(h2))
    )


def hausdorff_pairs_oracle(
    max_h: int = 512,
    radius: int = 1200,
    gap_minutes: int = 720,
    min_minutes: int = 60,
    min_points: int = 3,
    table: str = "events",
) -> str:
    """Identical stays derivation, blocking, and max-min fold in DuckDB."""
    from .spatial_join import _cell_shift
    from ..sources.derive import EDGE

    h2 = int(max_h) * int(max_h)
    s = _cell_shift(int(max_h))
    stays_sql = stay_points_oracle(
        radius=radius, gap_minutes=gap_minutes, min_minutes=min_minutes,
        min_points=min_points, table=table,
    )
    nine = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""WITH stays AS (
  SELECT * FROM ({stays_sql}) st
), prb AS (
  SELECT user_id, cx, cy, ((cx >> {s}) + dx) * {EDGE} + (cy >> {s}) + dy AS ck
  FROM stays, (VALUES {nine}) o(dx, dy)
), hom AS (
  SELECT user_id, cx, cy, (cx >> {s}) * {EDGE} + (cy >> {s}) AS ck FROM stays
), cand AS (
  SELECT DISTINCT p.user_id AS user_a, h.user_id AS user_b
  FROM prb p JOIN hom h ON p.ck = h.ck
  WHERE p.user_id < h.user_id
    AND (p.cx - h.cx) * (p.cx - h.cx) + (p.cy - h.cy) * (p.cy - h.cy) <= {h2}
), tri AS (
  SELECT c.user_a, c.user_b, a.stay_id AS stay_a, b.stay_id AS stay_b,
         (a.cx - b.cx) * (a.cx - b.cx) + (a.cy - b.cy) * (a.cy - b.cy) AS d2
  FROM cand c
  JOIN stays a ON a.user_id = c.user_a
  JOIN stays b ON b.user_id = c.user_b
), dab AS (
  SELECT user_a, user_b, MAX(mn) AS h_ab FROM (
    SELECT user_a, user_b, stay_a, MIN(d2) AS mn FROM tri GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
), dba AS (
  SELECT user_a, user_b, MAX(mn) AS h_ba FROM (
    SELECT user_a, user_b, stay_b, MIN(d2) AS mn FROM tri GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
)
SELECT x.user_a, x.user_b, GREATEST(x.h_ab, y.h_ba) AS haus2
FROM dab x JOIN dba y ON x.user_a = y.user_a AND x.user_b = y.user_b
WHERE GREATEST(x.h_ab, y.h_ba) <= {h2}"""


def emerging_hotspots(events: DataFrame, cell_shift: int = 8) -> DataFrame:
    """Two-horizon emerging-hot-spot map over the event stream: the
    observation range splits at its exact midpoint epoch ``mid = (min_ep +
    max_ep) DIV 2`` and every occupied cell is classified by comparing its
    first- and second-half event counts — ``(cell, n_first, n_second,
    delta, trend)`` with ``trend`` = ``emerging`` when ``n_second * 10 >=
    n_first * 12`` (a +20% integer cross-multiplied threshold),
    ``fading`` symmetrically, else ``stable``.

    This is the temporal arm of the raster family (`rollup.cell_change`
    compares two UPDATE-LOG horizons; this compares two halves of event
    TIME) — the where-is-activity-growing read-out a monitoring pipeline
    refreshes per window.

    Plan: one tiny min/max aggregate (2 values broadcast), then ONE scan
    into a per-cell conditional aggregation with map-side combine — a
    single shuffle bounded by occupied cells; no window, no join on the
    big side.  Integer cross-multiplication keeps the threshold exact in
    both engines."""
    pts = _with_coords_epoch(events)
    rng = pts.agg(
        F.min("ep").cast("long").alias("ep_lo"),
        F.max("ep").cast("long").alias("ep_hi"),
    )
    step = 1 << int(cell_shift)
    from ..sources.derive import EDGE

    # integer halves: ep <= mid -> first, else second
    tagged = pts.crossJoin(F.broadcast(rng)).withColumn(
        "is_first", (F.col("ep") <= F.expr("(ep_lo + ep_hi) DIV 2")).cast("long")
    )
    agg = (
        tagged.select(F.expr(f"CAST(ex DIV {step} AS BIGINT) * {EDGE} + CAST(ey DIV {step} AS BIGINT)").alias("cell"), "is_first")
        .groupBy("cell")
        .agg(
            F.sum("is_first").cast("long").alias("n_first"),
            F.sum(1 - F.col("is_first")).cast("long").alias("n_second"),
        )
    )
    trend = (
        F.when(F.col("n_second") * 10 >= F.col("n_first") * 12, "emerging")
        .when(F.col("n_first") * 10 >= F.col("n_second") * 12, "fading")
        .otherwise("stable")
    )
    # NOTE: a cell can satisfy both cross-multiplications only when both
    # counts are tiny (e.g. 0/0 is impossible — the cell is occupied); the
    # WHEN order makes the tie deterministic and the oracle replays it.
    return agg.select(
        "cell",
        "n_first",
        "n_second",
        (F.col("n_second") - F.col("n_first")).cast("long").alias("delta"),
        trend.alias("trend"),
    )


def emerging_hotspots_oracle(cell_shift: int = 8, table: str = "events") -> str:
    """Identical midpoint split, cell derivation, and CASE order."""
    from ..sources import derive
    from ..sources.derive import EDGE

    step = 1 << int(cell_shift)
    return f"""WITH pts AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep,
         CAST(({derive.x_sql('event_id')} // {step}) * {EDGE}
              + ({derive.y_sql('event_id')} // {step}) AS BIGINT) AS cell
  FROM {table}
), rng AS (
  SELECT CAST(MIN(ep) AS BIGINT) AS ep_lo, CAST(MAX(ep) AS BIGINT) AS ep_hi FROM pts
), agg AS (
  SELECT cell,
         CAST(SUM(CASE WHEN ep <= (ep_lo + ep_hi) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
         CAST(SUM(CASE WHEN ep <= (ep_lo + ep_hi) // 2 THEN 0 ELSE 1 END) AS BIGINT) AS n_second
  FROM pts, rng GROUP BY cell
)
SELECT cell, n_first, n_second,
       CAST(n_second - n_first AS BIGINT) AS delta,
       CASE WHEN n_second * 10 >= n_first * 12 THEN 'emerging'
            WHEN n_first * 10 >= n_second * 12 THEN 'fading'
            ELSE 'stable' END AS trend
FROM agg"""


def user_home_cells(events: DataFrame, cell_shift: int = 8) -> DataFrame:
    """Per-user home-cell inference — each user's most-visited grid cell:
    ``(user_id, home_cell, n_visits, n_total, share_ppm)`` with the tie
    broken toward the smallest cell id (deterministic) and the share in
    exact FLOOR-ppm.

    The classic location-analytics primitive (home/work inference, user
    geo-bucketing for privacy-aware aggregation).  Plan: one scan into a
    (user, cell) hash agg with map-side combine, then ONE window over the
    aggregated frame — bounded by distinct (user, cell) pairs, partitioned
    by user.  With the events table bucketed by user_id the shuffle
    disappears (the trajectory-family note)."""
    pts = _with_coords_epoch(events)
    step = 1 << int(cell_shift)
    from ..sources.derive import EDGE

    counts = (
        pts.select(
            "user_id",
            F.expr(
                f"CAST(ex DIV {step} AS BIGINT) * {EDGE} "
                f"+ CAST(ey DIV {step} AS BIGINT)"
            ).alias("cell"),
        )
        .groupBy("user_id", "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_visits"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_visits"), F.asc("cell"))
    tot = Window.partitionBy("user_id")
    return (
        counts.withColumn("n_total", F.sum("n_visits").over(tot).cast("long"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("cell").alias("home_cell"),
            "n_visits",
            "n_total",
            F.expr("CAST((n_visits * 1000000) DIV n_total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


def user_home_cells_oracle(cell_shift: int = 8, table: str = "events") -> str:
    """Identical cell derivation, window order, and FLOOR-ppm."""
    from ..sources import derive
    from ..sources.derive import EDGE

    step = 1 << int(cell_shift)
    return f"""WITH pts AS (
  SELECT user_id,
         CAST(({derive.x_sql('event_id')} // {step}) * {EDGE}
              + ({derive.y_sql('event_id')} // {step}) AS BIGINT) AS cell
  FROM {table}
), counts AS (
  SELECT user_id, cell, CAST(COUNT(*) AS BIGINT) AS n_visits
  FROM pts GROUP BY user_id, cell
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY n_visits DESC, cell) AS rn,
         CAST(SUM(n_visits) OVER (PARTITION BY user_id) AS BIGINT) AS n_total
  FROM counts
)
SELECT user_id, cell AS home_cell, n_visits, n_total,
       CAST((n_visits * 1000000) // n_total AS BIGINT) AS share_ppm
FROM ranked WHERE rn = 1"""
