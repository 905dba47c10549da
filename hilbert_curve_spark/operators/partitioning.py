"""Equi-depth Hilbert range-partitioner planning.

The engine's storage layout sorts by the Hilbert index
(`sources/layout.py::write_sorted` — the Spark-side analogue of the
reference's curve-ordered prefix store, `Scheme/RSKQ/RSKQ_Biginteger.java`
PDB keying).  Writing that layout balanced at 100 TB needs RANGE BOUNDS:
``B`` hilbert split points such that each bucket holds ~``N/B`` docs.
Spark's own ``repartitionByRange`` samples non-deterministically
(reservoir per partition), so the planning step is re-expressed here as a
deterministic, oracle-checkable operator over the cell histogram:

    cells     = per-cell counts (ONE salted corpus scan — never a global
                sort of the data; the histogram is O(cells), not O(docs))
    cum(c)    = running total in cell order (cells are hilbert-prefix
                intervals, so cell order IS curve order)
    bound(k)  = first cell whose cumulative count reaches k*N/B

Bounds are exact at cell granularity — the same granularity the layout's
min/max pruning operates at — and the whole plan after the scan is
O(cells): one single-partition window over the histogram (thousands of
rows) plus a codegen explode, no joins.  The bucket-for-threshold search
is an explode+filter, NOT a broadcast range join: a B x cells nested-loop
join would be banned by the engine's no-BNLJ rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from .skew import salted_cell_counts


def partition_bounds(
    doc_geo: DataFrame, buckets: int, config: EngineConfig = DEFAULT
) -> DataFrame:
    """The ``buckets - 1`` interior split cells of an equi-depth hilbert
    range partitioning: ``(bucket, bound_cell, cum_docs)`` where
    ``bound_cell`` is the first cell (in curve order) whose running doc
    count reaches threshold ``max(1, (bucket * N) DIV buckets)`` and
    ``cum_docs`` that running count.

    Bucket ``k``'s data interval is ``(bound(k-1), bound(k)]`` in cell
    space; each holds ``N/B`` docs up to one cell's worth of slack (the
    histogram granularity).  Deterministic: integer thresholds, cumulative
    sums over the total cell order — no sampling, no RNG."""
    cells = salted_cell_counts(doc_geo, config)
    w = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = (
        cells.withColumn("cum", F.sum("n_docs").over(w))
        .withColumn("n_total", F.sum("n_docs").over(wt))
        .withColumn("prev", F.col("cum") - F.col("n_docs"))
    )
    return (
        cum.withColumn("bucket", F.explode(F.expr(f"sequence(1, {buckets - 1})")))
        .withColumn(
            "thr",
            F.expr(f"greatest((bucket * n_total) div {buckets}, 1)").cast("long"),
        )
        .filter((F.col("thr") > F.col("prev")) & (F.col("thr") <= F.col("cum")))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("cell").alias("bound_cell"),
            F.col("cum").cast("long").alias("cum_docs"),
        )
    )


def partition_bounds_oracle(buckets: int) -> str:
    """SELECT body over a CTE chain that defines ``doc_geo`` and the
    hilbert values ``hv(cx, cy, hilbert)`` (the caller composes
    ``tiles.hilbert_sql_cte`` exactly as the cell_stats oracle does):
    identical histogram, running sum, and threshold arithmetic."""
    # NB: named chist, not cells — tiles.hilbert_sql_cte already defines a
    # CTE called cells in the chain this body is appended to.
    return f"""chist AS (
  SELECT hv.hilbert >> {2 * DEFAULT.cell_shift} AS cell, COUNT(*) AS n
  FROM doc_geo d JOIN hv ON d.x = hv.cx AND d.y = hv.cy GROUP BY 1
), cum AS (
  SELECT cell,
         CAST(SUM(n) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS n_total,
         CAST(SUM(n) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS prev
  FROM chist
)
SELECT CAST(k.k AS INT) AS bucket, c.cell AS bound_cell, c.cum AS cum_docs
FROM cum c JOIN (SELECT unnest(range(1, {buckets})) AS k) k
  ON GREATEST((k.k * c.n_total) // {buckets}, 1) > c.prev
 AND GREATEST((k.k * c.n_total) // {buckets}, 1) <= c.cum"""


def skew_report(
    doc_geo: DataFrame, topk: int, config: EngineConfig = DEFAULT
) -> DataFrame:
    """Hot-cell skew diagnostics: the ``topk`` most populated cells with
    exact integer shares — ``(rank, cell, n_docs, share_ppm, cum_ppm)``.

    This is the planning read-out that DRIVES the engine's explicit skew
    handling (`operators/skew.py`): a cell whose ``share_ppm`` exceeds
    ~1/shuffle-partitions of the corpus is exactly the key a naive
    ``groupBy(cell)``/cell-join would serialize onto one reducer, so the
    salt factor and AQE skew thresholds are sized from this report.  The
    corpus's deliberate multi-gaussian hot spots
    (`SpatialDataProcessor/StaticData/DataSetAccess.java:149-162`) make the
    report non-trivial at every scale.

    Plan: ONE salted corpus scan (the shared histogram), then a
    single-partition window over the O(cells) histogram — thousands of
    rows regardless of corpus size, the same documented shape as
    ``partition_bounds``.  Shares are FLOOR-ppm (integer DIV), so the
    DuckDB oracle matches bit-for-bit; ties rank by cell id —
    deterministic total order."""
    cells = salted_cell_counts(doc_geo, config)
    w = Window.orderBy(F.desc("n_docs"), F.asc("cell"))
    ranked = (
        cells.withColumn("n_total", F.sum("n_docs").over(Window.partitionBy()))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum", F.sum("n_docs").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    return ranked.filter(F.col("rank") <= topk).select(
        F.col("rank").cast("int").alias("rank"),
        F.col("cell").cast("long").alias("cell"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.expr("CAST((n_docs * 1000000) DIV n_total AS BIGINT)").alias("share_ppm"),
        F.expr("CAST((cum * 1000000) DIV n_total AS BIGINT)").alias("cum_ppm"),
    )


def skew_report_oracle(topk: int) -> str:
    """SELECT body over the same hilbert CTE chain as
    :func:`partition_bounds_oracle` — identical histogram, ranking order,
    and FLOOR-ppm arithmetic."""
    return f"""chist AS (
  SELECT hv.hilbert >> {2 * DEFAULT.cell_shift} AS cell, COUNT(*) AS n
  FROM doc_geo d JOIN hv ON d.x = hv.cx AND d.y = hv.cy GROUP BY 1
), ranked AS (
  SELECT cell, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, cell) AS rank,
         CAST(SUM(n) OVER (ORDER BY n DESC, cell ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS n_total
  FROM chist
)
SELECT CAST(rank AS INT) AS rank, CAST(cell AS BIGINT) AS cell,
       CAST(n AS BIGINT) AS n_docs,
       CAST((n * 1000000) // n_total AS BIGINT) AS share_ppm,
       CAST((cum * 1000000) // n_total AS BIGINT) AS cum_ppm
FROM ranked WHERE rank <= {topk}"""


def _block_test_sql(bx_sql: str, by_sql: str, test_mod: int) -> str:
    """Pure-function test-block membership: an engine-neutral md5 fold of
    the block key modulo ``test_mod``.  Being a pure function of the block
    coordinates is the point — every row (and every engine) can evaluate
    any block's membership without a lookup table or a join."""
    from .dedup import _hex_to_long_sql

    key = f"('b|' || CAST({bx_sql} AS STRING) || '|' || CAST({by_sql} AS STRING))"
    return f"(({_hex_to_long_sql(f'md5({key})', 1, 10)}) % {int(test_mod)} = 0)"


def spatial_split(
    doc_geo: DataFrame, shift: int = 8, test_mod: int = 5
) -> DataFrame:
    """Leakage-buffered spatial train/test split — ``(split, n_docs,
    n_blocks)`` with ``split IN ('train','test','buffer')``: the grid is
    cut into ``2^shift``-wide blocks, a deterministic hash picks
    ~``1/test_mod`` of blocks as TEST, and every non-test block that
    touches a test block (8-neighborhood) becomes BUFFER — excluded from
    training so spatially-autocorrelated points adjacent to the test
    region can't leak label information across the split.  This is the
    standard evaluation-hygiene op for geospatial ML (block cross-
    validation); the per-doc assignment is what a training pipeline
    filters on.

    Physical plan: membership is a PURE FUNCTION of the block
    coordinates (md5-fold mod), and the block table is GRID-SIZED — so
    the 9-fold buffer check is evaluated ONCE PER BLOCK over a
    driver-enumerated ``(maxb+1)^2``-row frame (a few hundred rows at
    any corpus size), which then broadcast-hash-joins to the documents
    on the block key.  The per-document cost is two shifts and one
    broadcast probe; the md5 folds never touch a data-sized frame.  (The
    fully-inline variant — 9 folds per DOCUMENT row, no join — computes
    the same function and wins only when probe cost exceeds fold cost;
    measured here the broadcast form is ~5x faster at 640k docs.)
    Out-of-grid neighbors are bound-checked out (a border block can only
    be buffered by neighbors that exist)."""
    from ..sources import derive

    s = int(shift)
    maxb = (derive.EDGE >> s) - 1
    n = maxb + 1
    bx, by = f"(id DIV {n})", f"(id % {n})"
    self_test = _block_test_sql(bx, by, test_mod)
    neigh = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nx, ny = f"({bx} + {dx})", f"({by} + {dy})"
            inb = f"({nx} BETWEEN 0 AND {maxb} AND {ny} BETWEEN 0 AND {maxb})"
            neigh.append(f"({inb} AND {_block_test_sql(nx, ny, test_mod)})")
    near_test = " OR ".join(neigh)
    split = (
        f"CASE WHEN {self_test} THEN 'test' "
        f"WHEN {near_test} THEN 'buffer' ELSE 'train' END"
    )
    spark = doc_geo.sparkSession
    blocks = spark.range(n * n).select(
        F.col("id").cast("long").alias("blk"), F.expr(split).alias("split")
    )
    tagged = doc_geo.select(
        F.expr(f"(x DIV {1 << s}) * {n} + (y DIV {1 << s})").alias("blk")
    ).join(F.broadcast(blocks), "blk")
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("blk").cast("long").alias("n_blocks"),
    )


def spatial_split_oracle(shift: int = 8, test_mod: int = 5) -> str:
    """Identical block arithmetic, membership folds, and bound checks;
    expects a ``doc_geo`` CTE in scope."""
    from ..sources import derive

    s = int(shift)
    maxb = (derive.EDGE >> s) - 1
    bx, by = f"(x // {1 << s})", f"(y // {1 << s})"
    self_test = _block_test_sql(bx, by, test_mod)
    neigh = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nx, ny = f"({bx} + {dx})", f"({by} + {dy})"
            inb = f"({nx} BETWEEN 0 AND {maxb} AND {ny} BETWEEN 0 AND {maxb})"
            neigh.append(
                f"({inb} AND {_block_test_sql(nx, ny, test_mod)})"
            )
    near_test = " OR ".join(neigh)
    split = (
        f"CASE WHEN {self_test} THEN 'test' "
        f"WHEN {near_test} THEN 'buffer' ELSE 'train' END"
    )
    block_key = f"({bx} * {maxb + 1} + {by})"
    return (
        f"SELECT {split} AS split, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(COUNT(DISTINCT {block_key}) AS BIGINT) AS n_blocks "
        f"FROM doc_geo GROUP BY 1"
    )


def str_pack(
    doc_geo: DataFrame, leaf_cap: int = 512, config: EngineConfig = DEFAULT
) -> DataFrame:
    """Sort-Tile-Recursive (STR) R-tree bulk-load packing (Leutenegger et
    al., ICDE 1997): the corpus is cut into ``S = ceil(sqrt(n / C))``
    vertical slices of ``ceil(n / S)`` points by global ``(x, y, doc_id)``
    rank, each slice packed bottom-up into runs of ``C`` points by
    ``(y, x, doc_id)`` rank — one output row per leaf:
    ``(leaf_id, n_pts, x_min, x_max, y_min, y_max)`` with ``leaf_id =
    slice * 2^20 + run``.  This is the leaf-MBR plan of a packed R-tree —
    the storage layout dual of the engine's Hilbert-sorted order (and the
    classic comparison partner: STR leaves have near-minimal area/overlap,
    hilbert order has better locality under updates).

    Scale design — the textbook STR needs a GLOBAL sort; on Spark a bare
    ``row_number()`` without partition keys is a single-task bottleneck, so
    exact global ranks are computed WITHOUT a global sort by exploiting the
    bounded lattice domain: rank(p) = (#points in strictly smaller x) +
    (rank of p within its x column).  The first term is a running sum over
    the ≤2^order-row x-histogram (a broadcastable toy frame at ANY corpus
    size); the second is a ``partitionBy(x)`` window — fully distributed.
    The same trick gives the within-slice y-rank via the (slice, y)
    histogram.  Nothing in the plan sorts more than one x-column / one
    (slice, y)-column per task; the two tiny histograms ride broadcast
    joins.  ``n``, ``S`` and the slice width derive from one 1-row count
    broadcast (ceil(sqrt(..)) on an exact small double — engine-neutral).

    Reference parity: the reference bulk-loads its curve store by sorting
    on the Hilbert key (`Scheme/RSKQ/RSKQ_Biginteger.java` PDB keying);
    STR is the standard alternative bulk layout, included so the engine
    can materialize either."""
    c = int(leaf_cap)
    n1 = doc_geo.groupBy().agg(F.count("*").alias("n"))
    n1 = n1.select(
        "n",
        F.expr(f"CAST(CEIL(SQRT(CAST(n AS DOUBLE) / {c})) AS BIGINT)").alias("s"),
    ).select("n", "s", F.expr("CAST((n + s - 1) DIV s AS BIGINT)").alias("sw"))

    # global x-rank = cum count of smaller x (tiny histogram) + within-x rank
    xh = doc_geo.groupBy("x").agg(F.count("*").alias("xc"))
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    xh = xh.select("x", F.coalesce(F.sum("xc").over(wx), F.lit(0)).alias("xb"))
    ranked = (
        doc_geo.join(F.broadcast(xh), "x")
        .withColumn(
            "rx",
            F.col("xb")
            + F.row_number().over(
                Window.partitionBy("x").orderBy("y", "doc_id")
            )
            - 1,
        )
        .crossJoin(F.broadcast(n1))
        .withColumn("slice", F.expr("CAST(rx DIV sw AS BIGINT)"))
    )
    yh = ranked.groupBy("slice", "y").agg(F.count("*").alias("yc"))
    wy = Window.partitionBy("slice").orderBy("y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    yh = yh.select(
        "slice", "y", F.coalesce(F.sum("yc").over(wy), F.lit(0)).alias("yb")
    )
    leaves = (
        ranked.join(F.broadcast(yh), ["slice", "y"])
        .withColumn(
            "ry",
            F.col("yb")
            + F.row_number().over(
                Window.partitionBy("slice", "y").orderBy("x", "doc_id")
            )
            - 1,
        )
        .withColumn(
            "leaf_id",
            F.col("slice") * (1 << 20) + F.expr(f"CAST(ry DIV {c} AS BIGINT)"),
        )
    )
    return leaves.groupBy("leaf_id").agg(
        F.count("*").alias("n_pts"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )


def str_pack_oracle(leaf_cap: int = 512, doc_geo_table: str = "doc_geo") -> str:
    """Appends to a chain defining ``doc_geo``: the same STR arithmetic via
    plain global window ranks (exactness over parallelism — the oracle runs
    single-node)."""
    c = int(leaf_cap)
    return f"""str_n AS (
  SELECT COUNT(*) AS n,
         CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE) / {c})) AS BIGINT) AS s
  FROM {doc_geo_table}
), str_cfg AS (
  SELECT n, s, CAST((n + s - 1) // s AS BIGINT) AS sw FROM str_n
), str_rx AS (
  SELECT doc_key, x, y,
         ROW_NUMBER() OVER (ORDER BY x, y, doc_key) - 1 AS rx
  FROM {doc_geo_table}
), str_sl AS (
  SELECT r.doc_key, r.x, r.y, CAST(r.rx // f.sw AS BIGINT) AS slice
  FROM str_rx r, str_cfg f
), str_ry AS (
  SELECT slice, x, y,
         ROW_NUMBER() OVER (PARTITION BY slice ORDER BY y, x, doc_key) - 1 AS ry
  FROM str_sl
)
SELECT CAST(slice * {1 << 20} + ry // {c} AS BIGINT) AS leaf_id,
       CAST(COUNT(*) AS BIGINT) AS n_pts,
       MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
FROM str_ry GROUP BY 1"""
